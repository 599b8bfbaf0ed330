"""Behavior tests for the round-4 batch-5 warehouse operators."""

from pyspark.sql import functions as F

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def test_bitmap_distinct_equals_count_distinct(spark):
    got = {
        r["event_type"]: r["n_distinct_users"]
        for r in registry()["agg_bitmap_distinct"].fn(spark, SF_DIR).collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


def test_point_in_time_each_order_sees_one_version(spark):
    rows = registry()["join_point_in_time"].fn(spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    assert len(rows) == len(orders)  # every order exactly one version
    assert len({r["o_orderkey"] for r in rows}) == len(rows)
    bal = {
        r["c_custkey"]: r["c_acctbal"]
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    from datetime import datetime

    cut = datetime(1998, 1, 1)
    for r in rows:
        base = bal[r["o_custkey"]]
        if r["o_custkey"] % 7 == 3 and r["o_orderdate"] >= cut:
            assert r["acctbal_at_order"] == base + 10.0
        else:
            assert r["acctbal_at_order"] == base


def test_schema_merge_nulls_for_old_epoch(spark):
    rows = registry()["scan_schema_merge"].fn(spark, SF_DIR).collect()
    n = spark.read.parquet(f"{SF_DIR}/supplier.parquet").count()
    assert len(rows) == n
    for r in rows:
        if r["s_suppkey"] % 2 == 0:
            assert r["s_tier"] is None  # epoch-1 files lack the column
        else:
            assert r["s_tier"] in ("prime", "watch")


def test_hll_rollup_register_sanity_and_determinism(spark):
    fn = registry()["stream_hll_rollup"].fn
    rows = fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        occupied = 256 - r["zero_regs"]
        # each distinct user occupies at most one register
        assert 0 < occupied <= r["exact_distinct"]
        assert r["raw_est"] > 0
    again = fn(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_time_travel_versions_match_fixture_shapes(spark):
    rows = {r["version"]: r for r in registry()["table_time_travel"].fn(spark, SF_DIR).collect()}
    assert set(rows) == {1, 2, 3}
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n = o.count()
    assert rows[1]["n_rows"] == n
    assert rows[1]["n_mutated"] == 0  # original statuses are untouched
    # v2 = mutated source: drops %7==0, adds one row per %11==0 key
    from pyspark.sql import functions as F

    dropped = o.filter(F.col("o_orderkey") % 7 == 0).count()
    added = o.filter(F.col("o_orderkey") % 11 == 0).count()
    assert rows[2]["n_rows"] == n - dropped + added
    # v3 = second source: drops %13==0 keys of the ORIGINAL table
    dropped13 = o.filter(F.col("o_orderkey") % 13 == 0).count()
    assert rows[3]["n_rows"] == n - dropped13
    assert rows[3]["n_mutated"] == o.filter(
        (F.col("o_orderkey") % 13 != 0) & (F.col("o_orderkey") % 3 == 0)
    ).count()
