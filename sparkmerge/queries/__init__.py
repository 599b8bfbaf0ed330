"""Operator registry — one entry per SURVEY.md §2 op id.

Each op registers a PySpark query ``(spark, sf_dir) -> DataFrame`` and,
where SQL-expressible, an equivalent DuckDB oracle SQL string.  The driver
runs both at sf0.01 and compares row-count + schema + order-insensitive
value-hash (``/root/repo/__spark_entry__.py`` contract), so:

- every computed column is aliased identically on both sides;
- fixtures are pure derivations (no randomness, no wall-clock);
- floating-point outputs are either pass-through values, single IEEE
  operations (bit-deterministic in both engines), or exact decimal
  aggregations — never order-dependent double sums (see fixtures.py).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_MODULES = [
    "sparkmerge.queries.core",
    "sparkmerge.queries.support",
    "sparkmerge.queries.functions",
    "sparkmerge.queries.analytics",
    "sparkmerge.queries.ext_dedup",
    "sparkmerge.queries.ext_similarity",
    "sparkmerge.queries.ext_text",
    "sparkmerge.queries.ext_multimodal",
    "sparkmerge.queries.ext_streaming",
]


@dataclass(frozen=True)
class QuerySpec:
    op_id: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → rows-only check
    description: str


_REGISTRY: dict[str, QuerySpec] = {}


def register(op_id: str, *, oracle: str | None = None, description: str = ""):
    """Decorator: add one op to the registry."""

    def deco(fn):
        if op_id in _REGISTRY:
            raise ValueError(f"duplicate op id {op_id!r}")
        _REGISTRY[op_id] = QuerySpec(op_id, fn, oracle, description)
        return fn

    return deco


def registry() -> dict[str, QuerySpec]:
    """Import all query modules (idempotent) and return the full registry."""
    for mod in _MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table == "events":
        # events.parquet carries TIMESTAMP(NANOS), which Spark's parquet
        # reader rejects (batch AND streaming).  Rewrite once per sf_dir to
        # microseconds via pyarrow (truncating, exactly like DuckDB's ns→µs
        # read of the same file) and read the cached copy.
        return spark.read.parquet(events_path(sf_dir))
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def events_path(sf_dir: str) -> str:
    """Path to the µs-timestamp rewrite of ``{sf_dir}/events.parquet``."""
    import hashlib
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.abspath(f"{sf_dir}/events.parquet")
    key = hashlib.md5(src.encode()).hexdigest()[:12]
    # a DIRECTORY (not a bare file) so streaming file sources accept it too
    dst_dir = f"/tmp/sparkmerge_events_us/{key}"
    dst = f"{dst_dir}/part-0.parquet"
    if not os.path.exists(dst):
        os.makedirs(dst_dir, exist_ok=True)
        t = pq.read_table(src)
        fields = [
            pa.field(f.name, pa.timestamp("us") if pa.types.is_timestamp(f.type) else f.type)
            for f in t.schema
        ]
        t2 = t.cast(pa.schema(fields), safe=False)
        tmp = f"{dst}.{os.getpid()}.tmp"
        pq.write_table(t2, tmp)
        os.replace(tmp, dst)  # atomic; safe under concurrent callers
    return dst_dir
