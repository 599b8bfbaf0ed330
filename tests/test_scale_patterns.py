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
