"""Behavior + plan-shape tests for the round-4 ext_analysis operators
(MAD anomalies, boilerplate fraction, RRF fusion, token Gini, dataset diff,
top paths, co-occurrence)."""

from pyspark.sql import functions as F

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_anomaly_mad_median_is_robust(spark):
    df = registry()["events_anomaly_mad"].fn(spark, SF_DIR)
    rows = df.collect()
    assert rows
    # per type: med/mad constant, flags consistent with the rule
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        meds = {r["med"] for r in rs}
        mads = {r["mad"] for r in rs}
        assert len(meds) == 1 and len(mads) == 1, t
        med, mad = meds.pop(), mads.pop()
        vals = sorted(r["value"] for r in rs)
        n = len(vals)
        lo, hi = vals[(n + 1) // 2 - 1], vals[(n + 2) // 2 - 1]
        assert med == (lo + hi) / 2 or med in (lo, hi)
        for r in rs:
            assert r["is_anomaly"] == (abs(r["value"] - med) > 3.0 * mad)
    # the per-type stats reach the fact stream as broadcasts
    assert "BroadcastHashJoin" in plan_of(df)


def test_boilerplate_frac_flags_duplicated_grams(spark):
    import os
    import tempfile

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon eta"),  # shares the first 5-gram
        (3, "one two three four five six"),
        (4, "tiny doc"),  # < 5 tokens -> 0 grams, frac 0
    ]
    with tempfile.TemporaryDirectory() as td:
        (
            spark.createDataFrame(rows, "doc_id INT, text STRING")
            .withColumn("lang", F.lit("en"))
            .withColumn("source", F.lit("s"))
            .withColumn("n_chars", F.length("text"))
            .write.parquet(os.path.join(td, "documents.parquet"))
        )
        out = {
            r["doc_id"]: r
            for r in registry()["text_boilerplate_frac"].fn(spark, td).collect()
        }
    assert out[1]["n_grams"] == 2 and out[1]["n_boiler"] == 1
    assert out[1]["boiler_frac"] == 0.5
    assert out[2]["n_boiler"] == 1
    assert out[3]["n_boiler"] == 0 and out[3]["boiler_frac"] == 0.0
    assert out[4]["n_grams"] == 0 and out[4]["boiler_frac"] == 0.0


def test_rrf_fusion_combines_both_rankings(spark):
    df = registry()["retrieval_rrf_fusion"].fn(spark, SF_DIR)
    rows = df.collect()
    assert 0 < len(rows) <= 10
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
        range(1, len(rows) + 1)
    )
    for r in rows:
        assert 0.0 < r["rrf"] <= 2.0 / 61.0 + 1e-12
    # a doc in both pools outranks a doc in only one at the same position
    scores = sorted((r["rrf"] for r in rows), reverse=True)
    assert scores == [r["rrf"] for r in sorted(rows, key=lambda r: r["rank"])]


def test_token_gini_bounds_and_exactness(spark):
    df = registry()["agg_token_gini"].fn(spark, SF_DIR)
    r = df.collect()[0]
    assert r["vocab_size"] > 0 and r["total_tokens"] > 0
    assert 0.0 <= r["gini"] < 1.0
    # uniform counts => gini ~ 0; recompute from the public formula
    vocab = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.explode(F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")).alias("w"))
        .groupBy("w")
        .count()
        .collect()
    )
    cnts = sorted((row["count"], row["w"]) for row in vocab)
    v = len(cnts)
    total = sum(c for c, _ in cnts)
    num = sum((2 * (i + 1) - v - 1) * c for i, (c, _) in enumerate(cnts))
    assert r["vocab_size"] == v and r["total_tokens"] == total
    assert r["gini"] == num / (v * total)


def test_dataset_diff_statuses(spark):
    df = registry()["pipeline_dataset_diff"].fn(spark, SF_DIR)
    rows = df.collect()
    by_status = {}
    for r in rows:
        by_status.setdefault(r["status"], []).append(r)
    assert set(by_status) == {"added", "removed", "changed"}
    for r in by_status["added"]:
        assert r["doc_id"] >= 1000000 and r["fp_v1"] is None
    for r in by_status["removed"]:
        assert r["doc_id"] % 17 == 0 and r["fp_v2"] is None
    for r in by_status["changed"]:
        assert r["doc_id"] % 13 == 0 and r["fp_v1"] != r["fp_v2"]
    # unchanged docs are excluded from the delta
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(rows) < n_docs


def test_top_paths_deterministic_and_bounded(spark):
    df = registry()["events_top_paths"].fn(spark, SF_DIR)
    rows = df.collect()
    assert 0 < len(rows) <= 10
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert 1 <= len(r["path"].split(">")) <= 3
    again = registry()["events_top_paths"].fn(spark, SF_DIR).collect()
    assert {(r["path"], r["n_users"]) for r in rows} == {
        (r["path"], r["n_users"]) for r in again
    }


def test_cooccurrence_is_mapside_pairgen(spark):
    df = registry()["text_cooccurrence_window"].fn(spark, SF_DIR)
    rows = df.collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        a, b = r["pair"].split(" ")
        assert a and b and r["cnt"] >= 1
    # pair generation must NOT be a positional self-join: a single Generate
    # (explode) node, no join operators at all (inspect a fresh plan — the
    # post-collect AQE final-plan string elides executed inner stages)
    plan = plan_of(registry()["text_cooccurrence_window"].fn(spark, SF_DIR))
    assert "Join" not in plan, plan
    assert plan.count("Generate") == 1, plan
