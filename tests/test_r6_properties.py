"""Invariant/property tests for the late-r6 surfaces — structural claims
that hold at ANY scale, complementing the brute-force value tests."""

from pyspark.sql import Row, functions as F

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_01 = "/root/testdata/sf0.01"


def test_asof_forward_backward_duality(spark):
    """forward as-of == backward as-of on negated time (the defining
    identity of the direction parameter), on a synthetic frame with
    duplicate timestamps exercising the right_dups='max' tiebreak."""
    from sparkmerge.ext.temporal import asof_join

    left = spark.createDataFrame(
        [Row(k=1, t=10), Row(k=1, t=25), Row(k=2, t=5), Row(k=2, t=50)]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, rt=10, p=100),
            Row(k=1, rt=10, p=101),  # duplicate ts — max payload must win
            Row(k=1, rt=30, p=102),
            Row(k=2, rt=60, p=200),
        ]
    )
    fwd = asof_join(
        left,
        right,
        key=("k", "k"),
        time=("t", "rt"),
        right_payload=["p"],
        right_dups="max",
        direction="forward",
    ).collect()
    neg_l = left.select("k", (-F.col("t")).alias("t"))
    neg_r = right.select("k", (-F.col("rt")).alias("rt"), "p")
    bwd_on_neg = asof_join(
        neg_l,
        neg_r,
        key=("k", "k"),
        time=("t", "rt"),
        right_payload=["p"],
        right_dups="max",
    ).collect()
    f = {(r["k"], r["t"]): r["p"] for r in fwd}
    b = {(r["k"], -r["t"]): r["p"] for r in bwd_on_neg}
    assert f == b
    # and the duplicate-timestamp winner is the max payload
    assert f[(1, 10)] == 101


def test_sorted_neighborhood_candidate_bound(spark):
    """SNM's structural guarantee: at most W pairs per record — the whole
    point of the algorithm vs quadratic blocking."""
    from sparkmerge.queries.ext_dedup import _SN_WINDOW

    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    n_pairs = registry()["dedup_sorted_neighborhood"].fn(spark, SF_DIR).count()
    assert n_pairs <= _SN_WINDOW * n_docs


def test_modularity_within_theoretical_bounds(spark):
    row = registry()["graph_modularity_score"].fn(spark, SF_DIR_01).collect()[0]
    assert row["n_edges"] > 0, "sf0.01 sparse subgraph must be non-empty"
    assert -0.5 <= row["modularity"] <= 1.0
    assert row["modularity"] == row["q_num"] / row["q_den"]
    assert row["q_den"] == 4 * row["n_edges"] * row["n_edges"]


def test_assortativity_is_a_correlation(spark):
    row = registry()["graph_assortativity"].fn(spark, SF_DIR).collect()[0]
    assert -1.0 - 1e-9 <= row["assortativity"] <= 1.0 + 1e-9
    assert row["m2"] % 2 == 0  # symmetrized edge list is even-sized


def test_argminmax_agrees_with_plain_extrema(spark):
    rows = registry()["fn_agg_argminmax"].fn(spark, SF_DIR).collect()
    plain = {
        r["event_type"]: r
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("event_type")
        .agg(F.max("value").alias("mx"), F.min("value").alias("mn"))
        .collect()
    }
    for r in rows:
        assert r["max_value"] == plain[r["event_type"]]["mx"]
        assert r["min_value"] == plain[r["event_type"]]["mn"]


def test_lsh_recall_eval_bounds(spark):
    row = registry()["dedup_lsh_recall_eval"].fn(spark, SF_DIR).collect()[0]
    if row["recall"] is not None:
        assert 0.0 <= row["recall"] <= 1.0
    if row["precision"] is not None:
        assert 0.0 <= row["precision"] <= 1.0
    assert row["tp"] <= min(row["n_true"], row["n_cand"])


def test_abc_classes_partition_and_order(spark):
    rows = registry()["orders_abc_xyz_class"].fn(spark, SF_DIR).collect()
    by_class = {"A": [], "B": [], "C": []}
    for r in rows:
        by_class[r["abc_class"]].append(r["revenue_cents"])
    # A-class revenue floor must be >= C-class ceiling (concentration order)
    if by_class["A"] and by_class["C"]:
        assert min(by_class["A"]) >= max(by_class["C"])
    total = sum(r["revenue_cents"] for r in rows)
    a_share = sum(by_class["A"]) / total
    assert a_share <= 0.80 + 0.05  # the boundary part lands in A by <= rule
