"""Scale-pattern plan assertions: the point of these operators is their
PHYSICAL shape, not just their results (results are oracle-checked by the
driver) — so assert the plan properties directly.
"""

import re

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark):
    reg = registry()
    df = reg["join_bucketed_colocated"].fn(spark, SF_DIR)
    plan = plan_of(df)
    # bucket co-location: the join itself needs no Exchange; the only
    # allowed exchange is the one AQE/agg adds AFTER the join for groupBy
    # — with both sides bucketed on the join key the partial agg runs on
    # the join's bucket partitioning, so there is no shuffle at all.
    joins = re.findall(r"SortMergeJoin|ShuffledHashJoin", plan)
    assert joins, f"expected a sort-merge join in:\n{plan}"
    assert "Exchange" not in plan.replace("BroadcastExchange", ""), (
        f"bucketed join must not shuffle:\n{plan}"
    )


def test_salted_join_splits_keys(spark):
    reg = registry()
    df = reg["join_salted_skew"].fn(spark, SF_DIR)
    plan = plan_of(df)
    # the join key must include the salt, so any single hot key hashes to
    # SALTS distinct shuffle partitions
    assert "_salt" in plan
    # and the salted result equals the unsalted join
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    plain = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "o_orderstatus"
    )
    assert df.exceptAll(plain).count() == 0 and plain.exceptAll(df).count() == 0


def test_approx_aggs_within_error_bounds(spark):
    from pyspark.sql import functions as F

    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    row = o.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
        F.countDistinct("o_custkey").alias("exact"),
        F.expr("approx_percentile(o_totalprice, 0.5, 1000)").alias("ap50"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.05
    # approx_percentile returns a genuine data value near the true median
    assert abs(row.ap50 - row.p50) / row.p50 < 0.05


def test_mapside_text_ops_have_no_shuffle(spark):
    # these ops are advertised (SURVEY §2.D) as pure map-side — one scan,
    # no Exchange of any kind; a regression that reintroduces an explode +
    # groupBy would show up here before it shows up in a benchmark
    reg = registry()
    for op in ["text_repetition", "text_pii_scrub", "pipeline_quality_filter"]:
        plan = plan_of(reg[op].fn(spark, SF_DIR))
        assert "Exchange" not in plan, f"{op} must be shuffle-free:\n{plan}"
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decontaminate_broadcasts_benchmark_side(spark):
    reg = registry()
    df = reg["text_decontaminate"].fn(spark, SF_DIR)
    plan = plan_of(df)
    # the benchmark n-gram set must reach the corpus as a broadcast — a
    # shuffled join here would re-shuffle the full exploded corpus n-gram
    # stream at 100 TB
    assert "BroadcastHashJoin" in plan, plan
    # one aggregation shuffle (doc_id groupBy) is the only exchange allowed
    exchanges = plan.replace("BroadcastExchange", "").count("Exchange")
    assert exchanges <= 2, f"too many shuffles:\n{plan}"  # partial+final pair


def test_embedding_quantize_is_map_side_only(spark):
    reg = registry()
    df = reg["embedding_quantize"].fn(spark, SF_DIR)
    plan = plan_of(df)
    assert "Exchange" not in plan, f"quantization must not shuffle:\n{plan}"
    # amax must be projected BELOW the quantization lambda, not inlined into
    # it (inlining re-scans the array per element: O(d^2) per row)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    floor_lines = [ln for ln in opt.splitlines() if "FLOOR" in ln]
    assert floor_lines and all("array_max" not in ln for ln in floor_lines), opt


def test_scd2_is_one_shuffle_pair_plus_union(spark):
    reg = registry()
    df = reg["merge_scd2"].fn(spark, SF_DIR)
    plan = plan_of(df)
    # both output branches must reuse ONE full-outer join; a second join
    # would double the shuffle volume
    assert plan.count("SortMergeJoin FullOuter") + plan.count(
        "ShuffledHashJoin FullOuter"
    ) <= 2, plan
    assert "Union" in plan, plan


def test_asof_join_is_single_shuffle(spark):
    """r4 verdict ask #4: the as-of (key,time) right-side dedup must ride
    the carry-forward window's sort (right_dups='max'), not spend its own
    groupBy Exchange — at 100 TB that second shuffle re-moves the whole
    right table."""
    reg = registry()
    df = reg["join_asof"].fn(spark, SF_DIR)
    plan = plan_of(df)
    assert plan.replace("BroadcastExchange", "").count("Exchange hashpartitioning") == 1, plan


def test_asof_right_dups_max_matches_preaggregate(spark):
    """right_dups='max' must return exactly the pre-aggregated unique
    formulation's rows (max payload per (key,time), then as-of)."""
    from pyspark.sql import functions as F

    from sparkmerge.ext.temporal import asof_join
    from sparkmerge.queries import load
    from tests.conftest import changeset_flat

    events = load(spark, SF_DIR, "events").select("event_id", "user_id", "ts")
    raw = load(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderdate", F.col("o_orderkey").alias("last_orderkey")
    )
    unique = (
        load(spark, SF_DIR, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("last_orderkey"))
    )
    kw = dict(key=("user_id", "o_custkey"), time=("ts", "o_orderdate"),
              right_payload=["last_orderkey"])
    a = asof_join(events, raw, right_dups="max", **kw)
    b = asof_join(events, unique, **kw)
    assert changeset_flat(a) == changeset_flat(b)


def test_window_session_reuses_user_shuffle(spark):
    """The lag+cumsum sessionization and the final (user, session) groupBy
    must share ONE user_id Exchange (HashPartitioning(user_id) satisfies the
    groupBy's clustered distribution) — pinned here so a refactor cannot
    silently reintroduce a second shuffle."""
    reg = registry()
    df = reg["window_session"].fn(spark, SF_DIR)
    plan = plan_of(df)
    assert plan.replace("BroadcastExchange", "").count("Exchange hashpartitioning") == 1, plan
