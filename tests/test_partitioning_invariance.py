"""Partitioning-invariance: the registry's determinism claim is that
results are BYTE-identical under any physical partitioning.  These tests
run the most partitioning-sensitive round-4 ops (iterative fixed-point
algorithms, windowed carry-forwards, mergeable sketch folds, float blends)
under two very different shuffle-partition settings and require exact
tuple equality — no tolerance."""

import pytest

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"

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
]


def _run(spark, op):
    return sorted(map(tuple, registry()[op].fn(spark, SF_DIR).collect()))


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
