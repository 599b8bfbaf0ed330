"""SnapshotTable — versioned parquet snapshots with an atomic pointer swap.

Replaces the reference's ``begin transaction / commit / rollback``
(sp_SimpleMerge.sql:470-479) and the ``lastUpdate`` extended property
(:129-140, :485-491) without Delta/Iceberg (neither is installed —
SURVEY.md §7.0):

    table_dir/
      v=1/part-*.parquet     immutable snapshot versions
      v=2/...
      _CURRENT               text file holding the committed version number
      _props.json            table properties (lastUpdate, ...)

Commit protocol: write ``v=N+1`` fully, then atomically replace ``_CURRENT``
(os.replace of a temp file — atomic on POSIX).  Abort = remove ``v=N+1`` and
never touch the pointer, which is exactly the reference's rollback semantics
(:478-479); readers resolving ``_CURRENT`` at open get MVCC snapshot reads
for free.

100 TB notes: on object stores the pointer swap becomes a conditional PUT
(S3 If-None-Match / GCS generation precondition) or a metastore update; the
data-writing side is unchanged.  For partitioned targets, only partitions
whose key range intersects the changeset need rewriting — untouched
partitions can be carried forward by reference in a manifest instead of
copied (SURVEY.md §7.2); this implementation rewrites the full snapshot,
which is correct at any scale and optimal only for unpartitioned targets.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from sparkmerge.errors import MergeConflictError, MergeError

_CURRENT = "_CURRENT"
_PROPS = "_props.json"


@dataclass
class SnapshotTable:
    """A versioned parquet table rooted at ``path`` (local/posix paths; see
    module docstring for the object-store adaptation)."""

    path: str

    # ---- version bookkeeping ----

    def _version_dir(self, version: int) -> str:
        return os.path.join(self.path, f"v={version}")

    def current_version(self) -> int:
        """0 = table exists but has no committed snapshot yet."""
        ptr = os.path.join(self.path, _CURRENT)
        if not os.path.exists(ptr):
            return 0
        with open(ptr, encoding="utf-8") as f:
            return int(f.read().strip())

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.path, _CURRENT))

    # ---- read / write ----

    @staticmethod
    def create(spark: SparkSession, path: str, df: DataFrame) -> "SnapshotTable":
        """Materialize ``df`` as version 1 of a new table."""
        table = SnapshotTable(path)
        if table.exists():
            raise MergeError(f"Table already exists at {path!r}")
        os.makedirs(path, exist_ok=True)
        df.write.mode("overwrite").parquet(table._version_dir(1))
        table._swap_pointer(1)
        return table

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read the committed snapshot (resolves _CURRENT at call time), or a
        specific retained ``version`` — time travel over the MVCC history
        (any version not yet vacuumed stays readable)."""
        v = self.current_version() if version is None else version
        if v == 0:
            raise MergeError(f"No committed snapshot at {self.path!r}")
        if version is not None and version > self.current_version():
            # staged-but-uncommitted data (crash orphans) must never be
            # observable through the read API
            raise MergeError(
                f"Version {version} at {self.path!r} is staged but not committed"
            )
        if not os.path.isdir(self._version_dir(v)):
            raise MergeError(f"Version {v} not found at {self.path!r} (vacuumed?)")
        return spark.read.parquet(self._version_dir(v))

    def versions(self) -> list[int]:
        """Retained COMMITTED version numbers, ascending.  Staged-but-
        uncommitted directories (crash orphans) are excluded — they were
        never visible to any reader."""
        cur = self.current_version()
        return sorted(
            v
            for d in os.listdir(self.path)
            if d.startswith("v=") and os.path.isdir(os.path.join(self.path, d))
            for v in (int(d.split("=", 1)[1]),)
            if v <= cur
        )

    def stage(self, df: DataFrame) -> int:
        """Write the next version's data WITHOUT committing it; returns the
        staged version number.  This is 'run the merge inside the
        transaction' — visible to no reader until commit."""
        v = self.current_version() + 1
        df.write.mode("overwrite").parquet(self._version_dir(v))
        return v

    def commit(self, version: int) -> None:
        """Atomically publish a staged version (the COMMIT at
        sp_SimpleMerge.sql:477).

        Optimistic concurrency: the staged version was derived from snapshot
        ``version - 1``; if the pointer has moved since (a concurrent writer
        committed), publishing would silently drop that writer's changes —
        refuse with :class:`MergeConflictError` instead.  On an object store
        the read-check-swap window closes with a conditional PUT
        (If-Match on the pointer object); locally it is a detection, not a
        lock — adequate for single-writer-per-table orchestration."""
        if not os.path.isdir(self._version_dir(version)):
            raise MergeError(f"Version {version} was never staged at {self.path!r}")
        current = self.current_version()
        if current != version - 1:
            raise MergeConflictError(expected=version - 1, found=current)
        self._swap_pointer(version)

    def abort(self, version: int) -> None:
        """Discard a staged version (the ROLLBACK at sp_SimpleMerge.sql:478-479).
        The pointer is untouched, so readers never observe the aborted data."""
        staged = self._version_dir(version)
        if os.path.isdir(staged):
            shutil.rmtree(staged)

    def _swap_pointer(self, version: int) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.path, prefix="._CURRENT.")
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            f.write(str(version))
        os.replace(tmp, os.path.join(self.path, _CURRENT))  # atomic on POSIX

    # ---- table properties (extended-property analog) ----

    def properties(self) -> dict[str, str]:
        p = os.path.join(self.path, _PROPS)
        if not os.path.exists(p):
            return {}
        with open(p, encoding="utf-8") as f:
            return json.load(f)

    def set_property(self, key: str, value: str) -> None:
        """Upsert one table property (``sp_addextendedproperty`` /
        ``sp_updateextendedproperty``, sp_SimpleMerge.sql:132-140,:485-491).
        Unlike the reference — which stamps lastUpdate even after a threshold
        rollback because raiserror severity 16 does not abort the batch
        (SURVEY.md §7.4) — callers here only stamp after a successful commit."""
        props = self.properties()
        props[key] = value
        fd, tmp = tempfile.mkstemp(dir=self.path, prefix="._props.")
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(props, f, indent=2, sort_keys=True)
        os.replace(tmp, os.path.join(self.path, _PROPS))

    # ---- schema evolution ----

    def add_columns(self, spark: SparkSession, columns: dict[str, str]) -> int:
        """Widen the table: commit a new version with NULL-filled columns of
        the given Spark DDL types (e.g. ``{"score": "double"}``).

        The reference's schema rule is source ⊆ target (sp_SimpleMerge.sql:
        200-201) — a source that grows a column fails validation until the
        target is widened; this is the explicit widening step.  Existing
        versions are untouched (MVCC), so readers pinned to an old version
        still see the old schema."""
        from pyspark.sql import functions as F

        existing = set(self.read(spark).columns)
        clash = existing.intersection(columns)
        if clash:
            raise MergeError(f"Columns already exist: {sorted(clash)!r}")
        df = self.read(spark)
        for name, ddl in columns.items():
            df = df.withColumn(name, F.lit(None).cast(ddl))
        staged = self.stage(df)
        self.commit(staged)
        return staged

    # ---- maintenance ----

    def vacuum(self, keep: int = 2) -> list[int]:
        """Drop all but the newest ``keep`` committed versions (never the
        current one).  Returns removed version numbers."""
        cur = self.current_version()
        # committed versions only: staged orphans neither count toward `keep`
        # nor get removed (one may belong to an in-flight committer)
        versions = self.versions()
        removable = [v for v in versions if v != cur][: max(0, len(versions) - keep)]
        for v in removable:
            shutil.rmtree(self._version_dir(v))
        return removable
