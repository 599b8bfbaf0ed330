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
    "sparkmerge.queries.lifecycle",
    "sparkmerge.queries.sources",
    "sparkmerge.queries.support",
    "sparkmerge.queries.temporal",
    "sparkmerge.queries.functions",
    "sparkmerge.queries.analytics",
    "sparkmerge.queries.ext_dedup",
    "sparkmerge.queries.ext_similarity",
    "sparkmerge.queries.ext_text",
    "sparkmerge.queries.ext_multimodal",
    "sparkmerge.queries.ext_streaming",
    "sparkmerge.queries.ext_corpus",
    "sparkmerge.queries.ext_retrieval",
    "sparkmerge.queries.ext_curation",
    "sparkmerge.queries.ext_analysis",
    "sparkmerge.queries.ext_graph",
    "sparkmerge.queries.ext_timeseries",
    "sparkmerge.queries.ext_features",
    "sparkmerge.queries.ext_sketch",
    "sparkmerge.queries.ext_warehouse",
    "sparkmerge.queries.ext_stats",
    "sparkmerge.queries.ext_spatial",
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


# Ops whose implementation changed AFTER their last driver-green
# CORRECTNESS row (the staleness ordering below only sees round numbers,
# not code edits).  They sort right after never-verified ops so the next
# capped driver window re-confirms the current code.  Remove an entry once
# a post-rewrite green row lands.
# NOTE (r7): all 12 r6 entries (graph family ×7, abtest, q21, bitext,
# asof ×2) landed green r6 rows and are cleared per the contract above.
# NOTE (r8): all 4 r7 entries (basket rewrite + 3 spatial param surfaces)
# landed green r7 rows and are cleared.
# NOTE (r9): both r8 entries (the shingle_key / rolling-distinct lever
# surfaces) landed green r8 rows and are cleared.
# NOTE (r10): all 7 r9 entries (lsh/tables/gap_unit levers ×4, multimodal
# real-codec trio) landed green r9 rows and are cleared.
# NOTE (r11): all 7 r10 entries (lsh-guard pair, multimodal trio, q1
# long-cents, cumulative-share prefix sum) landed green r10 rows and are
# cleared.
_FORCE_REVERIFY = {
    # NOTE (r13): the r12 window cleared 50 of the previous 62 entries
    # (CORRECTNESS_r12.json, all hash-green).  Kept below: the 14 r11/r12
    # entries the rotating window has not yet reached (all covered by the
    # at-HEAD 337/337 local sweeps, but one driver confirmation each is
    # still owed), plus the three r13 surfaces.
    # --- r13 OPTIMIZATION round (OPTIMIZATION_r13.md changes #1-#2):
    # basket build is now a streaming SortAggregate materialization
    # (output-identical by construction, hash-verified sf0.001 + sf0.01
    # pre-commit); q5's supplier broadcast hint is size-gated (join
    # strategy freedom only, gate open at every bench SF); q21's
    # finished-order gate moved below the windows as a left-semi join
    # (hash-verified sf0.01 + sf0.1 pre-commit).
    "orders_basket_lift",
    "tpch_q5",
    "tpch_q21_style",
    # --- r13 session-3: bitmask set aggregations over bounded domains
    # (output-identical to the sets paths, hash-verified sf0.01 + sf0.1
    # pre-commit; brand_audience's mask path is size-gated to ≥512 MiB
    # lineitem, so the small-SF plan is unchanged):
    "dedup_cross_source_matrix",
    "orders_brand_audience_jaccard",
    # --- r13 session-3: _edges pair generation is Generate-based (arrays)
    # — every co-occurrence-graph consumer re-verified (all 15 hash-green
    # at sf0.01 pre-commit, key ops also at sf0.1); the three driver-bench
    # visible ones queued:
    "graph_cooccurrence_edges",
    "graph_kcore_peel",
    "graph_degree_profile",
    # --- r13 session-3: type-co-occurrence bitmask core (size-gated;
    # hash-verified sf0.01 + sf0.1 pre-commit, determinism stable):
    "events_type_lift_matrix",
    "events_type_cooccurrence_daily",
    # --- r13 session-3: triangle kernel regenerates oriented edges from
    # the adjacency arrays (hash-verified sf0.01 + sf0.1 pre-commit):
    "graph_triangle_count",
    "graph_clustering_coefficient",
    # --- r13 session-4: per-token source-set aggregation is bitmask-based
    # (the cross-source recipe on tokens; output-identical to agg='sets',
    # hash-verified sf0.01 + sf0.1 pre-commit):
    "text_source_vocab_overlap",
    # --- r13 session-4: pagerank's adjacency checkpoint records its
    # hashpartitioning (AQE-off materialization) and r0 derives from the
    # checkpoint (hash-verified sf0.01 + sf0.1 pre-commit):
    "graph_pagerank_fixedpoint",
    # --- r13 session-5: the CC round budget covers the sf10 minhash
    # graph's 18-round chain (max_iters 8 → 32; converged corpora exit on
    # the sum fixed point unchanged — hash-verified sf0.01 + sf0.1
    # pre-commit, determinism stable):
    "dedup_cluster_survivors",
    # --- r13 session-6: the recall certifier is the inverted-index
    # intersection count over text-grain classes (truth set proven
    # identical to the nlj certifier at 3 SFs pre-commit; hash-verified
    # sf0.01 + sf0.1, determinism stable):
    "dedup_lsh_recall_eval",
    # --- r11 rewrite confirmations still owed (q1 decimal shift /
    # cumulative-share guard / q9 long-cents / funnel min-chain):
    "tpch_q1",
    "window_cumulative_share",
    "tpch_q9_style",
    "events_funnel_steps",
    # --- r12 surfaces the r12 window did not reach:
    "text_cross_lang_length_ratio",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "bitext_margin_mine",
    "ann_pq",
    "merge_multi_source",
    "multimodal_columns",
    "merge_schema_evolution",
    "stream_merge_foreachbatch",
    "events_user_type_entropy",
}



def _last_verified_round() -> dict[str, int]:
    """op_id → highest round N whose committed CORRECTNESS_r{N}.json has a
    row for the op (regardless of pass/fail — a red row still proves the
    driver reached it, and red ops are also in _FORCE_REVERIFY territory
    only if their code changed; otherwise staleness keeps them early)."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    seen: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for op in rows:
            seen[op] = max(seen.get(op, -1), rnd)
    return seen


def verify_order(op_ids: list[str]) -> list[str]:
    """Order ops for a capped driver correctness window, derived from the
    committed CORRECTNESS_r*.json artifacts (r4 verdict ask #2 — no more
    hand-rotated lists):

    1. never driver-verified (no row in any round), registration order;
    2. _FORCE_REVERIFY (code changed after last green row);
    3. everything else, stalest driver record first (ascending round).

    Ties break on registration order, so the queue is deterministic.
    """
    seen = _last_verified_round()
    idx = {op: i for i, op in enumerate(op_ids)}

    def key(op: str):
        if op not in seen:
            tier = 0
        elif op in _FORCE_REVERIFY:
            tier = 1
        else:
            tier = 2
        return (tier, seen.get(op, -1), idx[op])

    return sorted(op_ids, key=key)


def registry() -> dict[str, QuerySpec]:
    """Import all query modules (idempotent) and return the full registry,
    ordered so driver-unverified ops come first (see verify_order)."""
    for mod in _MODULES:
        importlib.import_module(mod)
    return {op: _REGISTRY[op] for op in verify_order(list(_REGISTRY))}


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Batch-read a corpus table (via its read-optimized rewrite).

    r12: the returned DataFrame HANDLE is cached per (session, resolved
    path) — ``spark.read.parquet`` costs ~90 ms of py4j round-trips +
    footer schema read, and fixture-assembling ops call load() 3-5× per
    construction (measured: ~half of the merge family's per-query driver
    floor).  This is logical-plan reuse, the same thing a catalog table
    reference gives a long-running Spark app — NOT result caching: every
    action on the handle re-executes from the parquet files.  The cache
    key is the rewrite path, which is content-addressed (fingerprint of
    the source file), so a regenerated corpus resolves to a NEW path and
    can never serve a stale handle; the pid lease written by table_path
    keeps the generation alive for the session's lifetime."""
    path = table_path(sf_dir, table)
    cache = getattr(spark, "_sparkmerge_df_cache", None)
    if cache is None:
        cache = {}
        spark._sparkmerge_df_cache = cache
    df = cache.get(path)
    if df is None:
        df = cache[path] = spark.read.parquet(path)
    return df


def table_path(sf_dir: str, table: str) -> str:
    """Path to a read-optimized rewrite of ``{sf_dir}/{table}.parquet``.

    The driver corpus ships each table as ONE parquet row group.  A row group
    is the parquet unit of split — Spark cannot parallelize a scan inside
    one — so every query would read its input on a single task, which is
    neither how any production table is laid out nor a meaningful basis for
    measuring the engine.  Rewrite once per (sf_dir, table) into /tmp with
    the SAME rows/types but production-shaped row groups (~target 32 splits,
    min 8k rows), and — for events — timestamps truncated ns→µs, because
    Spark's parquet reader rejects TIMESTAMP(NANOS) outright (DuckDB performs
    the identical ns→µs truncation when reading the original file, so the
    oracle still sees equal values).  The rewrite is a directory, so
    streaming file sources accept it too.
    """
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.abspath(f"{sf_dir}/{table}.parquet")
    key = fingerprint(src)
    dst_dir = f"/tmp/sparkmerge_cache/{key}"
    dst = f"{dst_dir}/part-0.parquet"
    if not os.path.exists(dst):
        prune_stale_siblings("/tmp/sparkmerge_cache", key)
        os.makedirs(dst_dir, exist_ok=True)
        t = pq.read_table(src)
        fields = [
            pa.field(f.name, pa.timestamp("us") if pa.types.is_timestamp(f.type) else f.type)
            for f in t.schema
        ]
        t2 = t.cast(pa.schema(fields), safe=False)
        rows_per_group = max(8192, t2.num_rows // 32)
        tmp = f"{dst}.{os.getpid()}.tmp"
        pq.write_table(t2, tmp, row_group_size=rows_per_group)
        os.replace(tmp, dst)  # atomic; safe under concurrent callers
        # the writer is also this generation's first reader — lease it
        # (same contract as the open branch below)
        _write_lease(dst_dir)
    else:
        # Reader lease (ADVICE r8, hardened r10): on relatime/noatime
        # mounts a read-only Spark scan refreshes NEITHER atime nor mtime,
        # so an old-but-active generation could age past the prune grace
        # window mid-scan.  Bump the dir mtime on every open AND drop a
        # pid-named lease sentinel: the prune keeps any generation holding
        # a lease whose pid is still alive, so even a scan LONGER than the
        # grace window (sf10 set-similarity ops run minutes) can't have
        # its files deleted from under it (r9 verdict: mtime alone only
        # narrowed the race to scans shorter than the window).
        try:
            os.utime(dst_dir)
        except OSError:
            pass  # another session may prune/replace concurrently — harmless
        _write_lease(dst_dir)
    return dst_dir


_MY_LEASES: set[str] = set()


def _write_lease(dst_dir: str) -> None:
    """Drop this process's pid-named lease sentinel in ``dst_dir`` and
    remember it for atexit removal.

    Two accumulation modes are handled (ADVICE r10 + r11): atexit removal
    reclaims leases on a CLEAN exit (without it, dead-pid files piled up
    until a sweep), and — because the prune's liveness rule is
    ``/proc/<pid>``, which would otherwise pin every generation a live
    process ever leased until it exits — leasing a NEW content generation
    of a source path releases this process's lease on any SUPERSEDED
    generation of the same path (same path-hash prefix of the cache key,
    different content hash), so a long-lived session stops pinning
    regenerated-away fixtures while still running."""
    import atexit
    import os

    base, key = os.path.split(dst_dir)
    phash = key.split("-", 1)[0]
    for held in list(_MY_LEASES):
        hdir = os.path.dirname(held)
        hkey = os.path.basename(hdir)
        if (
            os.path.dirname(hdir) == base
            and hkey != key
            and hkey.split("-", 1)[0] == phash
        ):
            try:
                os.unlink(held)
            except OSError:
                pass
            _MY_LEASES.discard(held)
    path = os.path.join(dst_dir, f".lease.{os.getpid()}")
    try:
        with open(path, "w"):
            pass
    except OSError:
        return  # concurrent prune/replace — harmless
    if not _MY_LEASES:
        atexit.register(_drop_my_leases)
    _MY_LEASES.add(path)


def _drop_my_leases() -> None:
    """atexit: release every lease this process wrote — a clean exit must
    not leave pid files that only the dead-pid sweep can reclaim."""
    import os

    for path in list(_MY_LEASES):
        try:
            os.unlink(path)
        except OSError:
            pass
        _MY_LEASES.discard(path)


def events_path(sf_dir: str) -> str:
    """Back-compat alias: the µs-timestamp events rewrite (see table_path)."""
    return table_path(sf_dir, "events")


def fingerprint(*paths: str) -> str:
    """Cache key for a /tmp-derived fixture: ``<path-hash>-<content-hash>``.

    The path half is md5 over the abspaths alone; the content half adds each
    file's (size, mtime_ns).  Keying on the path alone left stale caches live
    after a testdata regeneration at the same location — the derived blobs
    would silently diverge from the oracle, which reads the live tables
    (ADVICE r5).  The two-part layout lets :func:`prune_stale_siblings` drop
    superseded content generations of the SAME source path, so repeated
    regenerations no longer grow /tmp without bound (ADVICE r6).  A
    directory path fingerprints every ``*.parquet`` in it."""
    import glob
    import hashlib
    import os

    hp = hashlib.md5()
    hc = hashlib.md5()
    for p in paths:
        p = os.path.abspath(p)
        files = (
            sorted(glob.glob(os.path.join(p, "*.parquet")))
            if os.path.isdir(p)
            else [p]
        )
        hp.update(p.encode())
        for f in files:
            st = os.stat(f)
            hc.update(f"|{os.path.basename(f)}:{st.st_size}:{st.st_mtime_ns}".encode())
    return f"{hp.hexdigest()[:12]}-{hc.hexdigest()[:12]}"


#: Skip pruning a superseded cache generation this recently touched
#: (atime/mtime), in seconds.  A concurrently running OLDER session may
#: still be scanning it — deleting parquet files under an active Spark scan
#: crashes that session's query rather than serving it stale data (ADVICE
#: r7).  After the grace window no live scan can plausibly hold it open.
_PRUNE_GRACE_S = 600.0


def prune_stale_siblings(base_dir: str, key: str) -> None:
    """Remove cache directories under ``base_dir`` for the same source path
    (same path-hash prefix) but a superseded content fingerprint.  Called
    when a NEW fingerprint materializes.  Two safety rails (ADVICE r7):

    - dirs whose atime/mtime is within :data:`_PRUNE_GRACE_S` are kept —
      a racing older session could still be mid-scan in them;
    - legacy dash-less dirs (the pre-r6 single-hash key format, orphaned
      forever by the ``<path>-<content>`` rename since the prefix glob
      never matches them) are swept on the same aged-out terms.
    """
    import glob
    import os
    import shutil
    import time

    cutoff = time.time() - _PRUNE_GRACE_S

    def leased_by_live_pid(d: str) -> bool:
        # pid-named sentinels written by table_path on every open; a lease
        # whose pid is still running marks the generation as in-use no
        # matter how old the dir's timestamps are (a >grace-window Spark
        # scan).  Dead pids are DELETED as they are seen (ADVICE r10: they
        # are pure garbage and otherwise accumulate inside cache dirs
        # forever) and fall through to the age rule — pid reuse at worst
        # keeps a dir one extra generation, never deletes a live one.
        live = False
        for lease in glob.glob(os.path.join(d, ".lease.*")):
            try:
                pid = int(os.path.basename(lease).rsplit(".", 1)[1])
            except ValueError:
                continue
            if os.path.exists(f"/proc/{pid}"):
                live = True
            else:
                try:
                    os.unlink(lease)
                except OSError:
                    pass
        return live

    def aged_out(d: str) -> bool:
        try:
            st = os.stat(d)
        except OSError:
            return False
        return max(st.st_mtime, st.st_atime) < cutoff and not leased_by_live_pid(d)

    prefix = key.split("-", 1)[0]
    for d in glob.glob(os.path.join(base_dir, f"{prefix}-*")):
        if os.path.basename(d) == key:
            # the live generation is never age-pruned, but its dead-pid
            # leases are still garbage — sweep them so a kept dir does not
            # accumulate one sentinel per crashed/finished process forever
            leased_by_live_pid(d)
        elif aged_out(d):
            shutil.rmtree(d, ignore_errors=True)
    # one-time-per-call sweep of pre-r6 legacy names: 12-hex, no dash
    for d in glob.glob(os.path.join(base_dir, "*")):
        name = os.path.basename(d)
        if "-" not in name and len(name) == 12 and aged_out(d):
            shutil.rmtree(d, ignore_errors=True)
