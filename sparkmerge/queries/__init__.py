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


# Ops the round-1 driver never reached (CORRECTNESS_r01.json covered exactly
# the first 50 registration-order entries).  They are emitted FIRST so a
# capped correctness run verifies the still-unverified surface before
# re-verifying ops that already have a green row; round-1-green ops follow.
# Drop/trim this list as driver coverage accumulates.
_VERIFY_FIRST = [
    # Round-4 rotation.  After r1∪r2∪r3 the driver has verified 145/170 ops
    # (144 green, 1 harness error).  The 50-op window below is:
    #   (a) the 25 ops with NO driver record after three rounds (r3 verdict
    #       "What's missing" #1 — positions 51-75 of the r3 queue);
    #   (b) embedding_quantize — the one red row (array<int> output crashed
    #       the driver's pandas canonicalizer; output now serialized as a
    #       comma-joined string, needs a green re-run);
    #   (c) text_repetition — green in r2 but rewritten after (commit
    #       353e912, hash-based identity); ADVICE.md asks for a driver
    #       re-confirmation of the current implementation;
    #   (e) the round-4 curation batch (ext_curation.py) — 8 new ops with
    #       no driver record yet (local check_oracle green at sf0.001/0.01);
    #   (d) fill to 50 with the oldest green records (round-1 window, core
    #       merge ops) so stale-record risk rotates out oldest-first.
    # --- (a) never driver-verified (25) ---
    "pivot_unpivot", "agg_distinct", "agg_percentiles", "agg_approx",
    "subquery_scalar", "text_bm25_topk", "bpe_pair_counts",
    "events_transition_counts", "text_line_dedup", "text_lm_score",
    "pipeline_source_cap", "pipeline_train_split", "merge_schema_evolution",
    "fn_url_ops", "bitext_margin_mine", "ann_pq", "merge_multi_source",
    "join_fuzzy_name", "table_profile", "validate_constraints",
    "join_bloom_prefilter", "agg_hll_native", "agg_cms_sketch",
    "table_zorder_layout", "scan_stats_pruned",
    # --- (b) red row, now fixed (1) ---
    "embedding_quantize",
    # --- (c) stale record after rewrite (1) ---
    "text_repetition",
    # --- (e) round-4 curation/analysis batches — new ops, no driver record
    #     yet (15: ext_curation.py 8 + ext_analysis.py 7) ---
    "pipeline_chunk_split", "pipeline_repeat_upsample",
    "pipeline_curriculum_order", "agg_reservoir_sample", "text_markup_strip",
    "ann_range_search", "agg_corr_pairs", "text_keyword_tfidf",
    "events_anomaly_mad", "text_boilerplate_frac", "retrieval_rrf_fusion",
    "agg_token_gini", "pipeline_dataset_diff", "events_top_paths",
    "text_cooccurrence_window",
    # --- (f) round-4 batch 2 — graph/timeseries/features/sources (13 new
    #     ops, no driver record; local check_oracle green).  The first 8
    #     fit the 50-op window; the last 5 spill to the round-5 rotation
    #     (they replaced the oldest-green refresh slots — never-verified
    #     ops outrank stale-record refresh) ---
    "graph_cooccurrence_edges", "graph_degree_profile",
    "graph_triangle_count", "graph_pagerank_fixedpoint",
    "timeseries_resample_ffill", "events_gap_islands",
    "events_ewma_lagchain", "feature_hash_bucket",
    "tokenizer_vocab_coverage", "embedding_normalize_project",
    "text_syllable_profile", "pipeline_interleave_sources",
    "scan_text_lines",
    # --- (g) round-4 batch 3 — sketch/iterative-ML/scale patterns (6 new
    #     ops; local check_oracle green at sf0.001+sf0.01; outside this
    #     round's 50-op window, first in line for the round-5 rotation) ---
    "agg_kmv_distinct", "embedding_kmeans_fixedpoint", "join_hybrid_skew",
    "window_ntile_buckets", "scan_jsonl_gz",
    # --- (h) round-4 batch 4 — attribution/interpolation/soft-dedup/
    #     streaming-SCD2 (4 new ops; local check_oracle green at
    #     sf0.001+sf0.01; round-5 rotation territory) ---
    "events_attribution_lasttouch", "timeseries_interpolate_linear",
    "dedup_soft_weights", "stream_scd2_foreachbatch",
    # --- (i) round-4 batch 5 — warehouse patterns (3 new ops; local
    #     check_oracle green at sf0.001+sf0.01; round-5 rotation) ---
    "agg_bitmap_distinct", "join_point_in_time", "scan_schema_merge",
    "stream_hll_rollup", "table_time_travel",
    # --- (j) round-4 session-2 additions (local check_oracle green at
    #     sf0.01; round-5 rotation territory) ---
    "merge_broadcast_delta",
    # --- (k) rewritten after their last driver-green record (variant-based
    #     JSON extraction) — driver re-confirmation wanted, same policy as
    #     text_repetition in (c) ---
    "json_extract_props",
    # --- (l) round-4 session-2: iterative BPE trainer, MVCC version diff,
    #     CSV quarantine (local check_oracle green; round-5 rotation) ---
    "bpe_train_rounds", "merge_version_diff", "scan_csv_quarantine",
]


def registry() -> dict[str, QuerySpec]:
    """Import all query modules (idempotent) and return the full registry,
    ordered so driver-unverified ops come first (see _VERIFY_FIRST)."""
    for mod in _MODULES:
        importlib.import_module(mod)
    first = [op for op in _VERIFY_FIRST if op in _REGISTRY]
    rest = [op for op in _REGISTRY if op not in set(first)]
    return {op: _REGISTRY[op] for op in [*first, *rest]}


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, table))


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
    import hashlib
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.abspath(f"{sf_dir}/{table}.parquet")
    key = hashlib.md5(src.encode()).hexdigest()[:12]
    dst_dir = f"/tmp/sparkmerge_cache/{key}"
    dst = f"{dst_dir}/part-0.parquet"
    if not os.path.exists(dst):
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
    return dst_dir


def events_path(sf_dir: str) -> str:
    """Back-compat alias: the µs-timestamp events rewrite (see table_path)."""
    return table_path(sf_dir, "events")
