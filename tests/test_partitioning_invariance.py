"""Partitioning-invariance: the registry's determinism claim is that
results are BYTE-identical under any physical partitioning.  These tests
run the most partitioning-sensitive round-4 ops (iterative fixed-point
algorithms, windowed carry-forwards, mergeable sketch folds, float blends)
under two very different shuffle-partition settings and require exact
tuple equality — no tolerance."""

import pytest

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"

# ops whose sf0.001 output is legitimately empty (sparse-subgraph cut) —
# invariance is checked at sf0.01 instead so the non-empty assertion bites
SF_OVERRIDE = {
    "graph_connected_components": "/root/testdata/sf0.01",
    # no multi-supplier 'F' orders survive the NATION_1 cut at sf0.001
    "tpch_q21_style": "/root/testdata/sf0.01",
}

OPS = [
    "graph_pagerank_fixedpoint",      # iterative integer fixed point
    "embedding_kmeans_fixedpoint",    # iterative centroid updates
    "stream_hll_rollup",              # sharded sketch merge
    "events_ewma_lagchain",           # float lag chain
    "timeseries_interpolate_linear",  # float blend over dual carry windows
    "agg_kmv_distinct",               # order-statistic sketch
    "agg_bitmap_distinct",            # bit_or fold
    "graph_triangle_count",           # multi-join orientation
    "bpe_train_rounds",               # iterative argmax winner + merge chain
    "merge_broadcast_delta",          # broadcast changeset decomposition
    # r5 partitioning-sensitive surfaces
    "agg_weighted_median",            # cumulative-weight window tiebreaks
    "timeseries_changepoint_cusum",   # running integer statistic
    "graph_connected_components",     # iterative min-label propagation
    "graph_jaccard_neighbors",        # mutual top-K rank windows
    "graph_cooccurrence_capped",      # per-bucket rank cap
    "agg_listagg_ordered",            # ordered concat (collect_list trap)
    "join_asof_nearest",              # dual-direction carry windows
    "agg_linear_fit",                 # fixed-association moment combine
    # r6 partitioning-sensitive surfaces
    "events_funnel_steps",            # chained per-step min anchors (r11)
    "window_running_distinct",        # global-order cumsum window
    "agg_variance_exact",             # moment sums + IEEE combine
    "merge_sparse_patch",             # per-column COALESCE changeset
    "window_cumulative_share",        # global-order running share + classes
    "window_rolling_distinct",        # contribution-explode distinct counts
    "tpch_q21_style",                 # multi-frame window chain (r6 rewrite)
    "graph_triangle_count",           # adjacency-intersection (r6 rewrite)
    # r6 batch 4-6 partitioning-sensitive surfaces
    "graph_clustering_coefficient",   # triangle participation + degree join
    "events_inter_arrival",           # lag window + nearest-rank index
    "events_funnel_latency",          # per-stage rank windows over the fold
    "dedup_sorted_neighborhood",      # intra-block lead() neighbor pairs
    "fn_agg_argminmax",               # struct-key extrema under agg combine
    "join_asof_forward",              # reversed-order carry window
    "dedup_lsh_recall_eval",          # full-outer pair reconciliation
]


def _run(spark, op):
    sf = SF_OVERRIDE.get(op, SF_DIR)
    return sorted(map(tuple, registry()[op].fn(spark, sf).collect()))


@pytest.mark.parametrize("op", OPS)
def test_result_is_invariant_to_shuffle_partitioning(spark, op):
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _run(spark, op)
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _run(spark, op)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b, f"{op} changed under repartitioning"
    assert a, f"{op} returned no rows"
