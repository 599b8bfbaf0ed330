"""Semantic tests for the round-6 operator batch (brute-force Python ground
truth at sf0.001, independent of the DuckDB oracle)."""

from collections import defaultdict

from pyspark.sql import functions as F

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def test_funnel_fold_matches_bruteforce(spark):
    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        if r["event_type"] in ("view", "click", "purchase"):
            by_user[r["user_id"]].append((r["ts"], r["event_type"]))
    n1 = n2 = n3 = 0
    for evs in by_user.values():
        evs.sort()
        v = min((t for t, ty in evs if ty == "view"), default=None)
        if v is None:
            continue
        n1 += 1
        c = min((t for t, ty in evs if ty == "click" and t > v), default=None)
        if c is None:
            continue
        n2 += 1
        if any(ty == "purchase" and t > c for t, ty in evs):
            n3 += 1
    got = {
        r["step"]: r["n_users"]
        for r in registry()["events_funnel_steps"].fn(spark, SF_DIR).collect()
    }
    assert got == {"step1_view": n1, "step2_click": n2, "step3_purchase": n3}
    assert n1 >= n2 >= n3  # funnel monotonicity


def test_running_distinct_final_equals_total_distinct(spark):
    df = registry()["window_running_distinct"].fn(spark, SF_DIR)
    rows = sorted(df.collect(), key=lambda r: r["d"])
    total = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows[-1]["cum_distinct_users"] == total
    assert sum(r["new_users"] for r in rows) == total
    cums = [r["cum_distinct_users"] for r in rows]
    assert cums == sorted(cums)  # monotone non-decreasing


def test_variance_exact_matches_numpy_cents(spark):
    import numpy as np

    pdf = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", "value")
        .toPandas()
    )
    got = {
        r["event_type"]: r
        for r in registry()["agg_variance_exact"].fn(spark, SF_DIR).collect()
    }
    for et, grp in pdf.groupby("event_type"):
        cents = np.floor(grp["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        r = got[et]
        assert r["n"] == len(cents)
        assert r["s1"] == int(cents.sum())
        assert r["s2"] == int((cents.astype(object) ** 2).sum())
        n, s1, s2 = float(r["n"]), float(r["s1"]), float(r["s2"])
        assert r["var_cents2"] == (n * s2 - s1 * s1) / (n * n)


def test_lid_confusion_shares_partition_each_label(spark):
    rows = registry()["text_lid_confusion"].fn(spark, SF_DIR).collect()
    by_label = defaultdict(list)
    for r in rows:
        by_label[r["label"]].append(r)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    label_totals = {
        r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for label, cells in by_label.items():
        assert sum(c["n_docs"] for c in cells) == label_totals[label]
        assert abs(sum(c["frac_of_label"] for c in cells) - 1.0) < 1e-12


def test_funnel_is_single_event_shuffle(spark):
    """The fold formulation reads events once — exactly one Exchange over
    raw events (user key); the final stack runs on a 1-row aggregate."""
    df = registry()["events_funnel_steps"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange <= 1, plan
