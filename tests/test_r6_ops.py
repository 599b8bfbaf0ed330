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


def test_funnel_chain_shape(spark):
    """r11 chain formulation: every Exchange is keyed on user_id, each
    step's MIN partial-aggregates BEFORE its exchange (per-user rows cross
    the wire, not raw events), and the old fold's per-user array
    materialization (collect_list / sort_array) is gone — the plan holds
    no unbounded per-user state."""
    df = registry()["events_funnel_steps"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan and "sort_array" not in plan, plan
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^,]+)", plan):
        assert m.group(1).startswith("user_id"), plan
    assert "partial_min" in plan or "HashAggregate" in plan, plan


def test_cumulative_share_monotone_and_classes(spark):
    rows = sorted(
        registry()["window_cumulative_share"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["cum_share"],
    )
    shares = [r["cum_share"] for r in rows]
    assert shares == sorted(shares) and abs(shares[-1] - 1.0) < 1e-12
    # classes partition the share axis in order A < B < C
    seen = [r["abc_class"] for r in rows]
    assert seen == sorted(seen)  # 'A' <= 'B' <= 'C' lexicographic == rank order
    assert seen[0] == "A" and seen[-1] == "C"
    # revenue is non-increasing along the cumulative order
    revs = [r["rev_cents"] for r in rows]
    assert all(a >= b for a, b in zip(revs, revs[1:]))


def test_rolling_distinct_brackets_running_distinct(spark):
    """7-day active count is ≥ any single day's new users and ≤ the total
    distinct population; and for the first observed day it equals that
    day's distinct actives."""
    rolling = {
        r["d"]: r["n_active_7d"]
        for r in registry()["window_rolling_distinct"].fn(spark, SF_DIR).collect()
    }
    pres = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr("user_id", "to_date(ts) AS d")
        .distinct()
    )
    per_day = {r["d"]: r["n"] for r in pres.groupBy("d").agg(F.count("*").alias("n")).collect()}
    total = pres.select("user_id").distinct().count()
    first_day = min(per_day)
    assert rolling[str(first_day)] == per_day[first_day]
    for d, n in rolling.items():
        assert n <= total
    # brute-force a middle day
    import datetime

    some_day = sorted(per_day)[len(per_day) // 2]
    lo = some_day - datetime.timedelta(days=6)
    brute = (
        pres.filter((F.col("d") >= F.lit(lo)) & (F.col("d") <= F.lit(some_day)))
        .select("user_id")
        .distinct()
        .count()
    )
    assert rolling[str(some_day)] == brute
