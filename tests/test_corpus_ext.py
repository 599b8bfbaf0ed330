"""Behavior + plan-shape tests for the ext_corpus operators (round-2 batch 3:
line dedup, source budgets, LM scoring, URL parsing)."""

import re

from pyspark.sql import functions as F

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_line_dedup_removes_boilerplate_everywhere(spark):
    # hand corpus: segment "a b c d" appears in 3 docs -> removed from all;
    # unique segments survive in original order
    rows = [
        (1, "a b c d x1 y1 z1 w1"),
        (2, "a b c d x2 y2 z2 w2"),
        (3, "p q r s a b c d"),
        (4, "only unique words here"),
    ]
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        sf = os.path.join(td)
        (
            spark.createDataFrame(rows, "doc_id INT, text STRING")
            .withColumn("lang", F.lit("en"))
            .withColumn("source", F.lit("s"))
            .withColumn("n_chars", F.length("text"))
            .write.parquet(os.path.join(sf, "documents.parquet"))
        )
        out = {
            r["doc_id"]: r
            for r in registry()["text_line_dedup"].fn(spark, sf).collect()
        }
    assert out[1]["n_segments"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["cleaned_text"] == "x1 y1 z1 w1"
    assert out[3]["cleaned_text"] == "p q r s"
    assert out[4]["n_kept"] == 1 and out[4]["cleaned_text"] == "only unique words here"


def test_line_dedup_broadcasts_dup_set(spark):
    df = registry()["text_line_dedup"].fn(spark, SF_DIR)
    plan = plan_of(df)
    # the duplicate-segment set must reach the anti-join as a broadcast:
    # corpus-sized segment stream never shuffles for the removal join
    assert "BroadcastExchange" in plan
    assert re.search(r"BroadcastHashJoin.*LeftAnti", plan), plan


def test_source_cap_budget_invariant(spark):
    df = registry()["pipeline_source_cap"].fn(spark, SF_DIR)
    rows = df.collect()
    assert rows, "cap should keep at least the largest doc per source"
    assert all(r["cum_tokens"] <= 2000 for r in rows)
    # per-source the kept set is a prefix of the (n_tokens desc, doc_id) order:
    # every kept doc has cum_tokens = sum of kept docs ranked at or above it
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (-r["n_tokens"], r["doc_id"]))
        run = 0
        for r in rs:
            run += r["n_tokens"]
            assert r["cum_tokens"] == run, (src, r)


def test_lm_score_mean_is_single_division(spark):
    df = registry()["text_lm_score"].fn(spark, SF_DIR)
    r = df.orderBy("doc_id").first()
    assert r["avg_tok_freq"] == r["sum_tok_freq"] / r["n_tokens"]
    assert r["min_tok_freq"] >= 1


def test_url_ops_native_parse_url(spark):
    df = registry()["fn_url_ops"].fn(spark, SF_DIR)
    r = df.orderBy("doc_id").first()
    assert r["proto"] == "https"
    assert r["host"].endswith(".example.com")
    assert r["path"].startswith("/docs/")
    assert r["query"].startswith("lang=")
    assert r["fragment"] == "s1"
    # map-side only: no Exchange in the plan at all
    assert "Exchange" not in plan_of(df)


def test_zorder_value_bit_interleave(spark):
    from sparkmerge.ext.layout import zorder_value

    df = spark.createDataFrame([(3, 1), (0, 0), (65535, 65535)], "x INT, y INT")
    rows = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_value(F.col("x"), F.col("y")).alias("z")).collect()
    }
    # x=0b11 -> bits 0,2 ; y=0b01 -> bit 1  => 0b111 = 7
    assert rows[(3, 1)] == 7
    assert rows[(0, 0)] == 0
    assert rows[(65535, 65535)] == (1 << 32) - 1


def test_stats_pruned_scan_skips_files_losslessly(spark, tmp_path):
    import datetime

    from sparkmerge.ext.layout import pruned_parquet_scan, zorder_layout

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    path = str(tmp_path / "orders_z")
    zorder_layout(
        o,
        (F.col("o_custkey") % 65536).cast("long"),
        F.datediff("o_orderdate", F.lit("1995-01-01")).cast("long"),
        path,
        n_files=8,
    )
    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1996, 6, 30)
    df, n_read, n_total = pruned_parquet_scan(spark, path, "o_orderdate", lo, hi)
    assert n_total == 8
    assert n_read < n_total, "z-ordered layout must let footer stats skip files"
    expect = o.filter(F.col("o_orderdate").between(lo, hi))
    assert df.count() == expect.count()
    assert df.select("o_orderkey").exceptAll(expect.select("o_orderkey")).count() == 0


def test_merge_schema_evolution_commits_widened_snapshot(spark, tmp_path):
    from sparkmerge import SnapshotTable, simple_merge

    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), c.select("c_custkey", "c_name").limit(100)
    )
    src = c.select("c_custkey", "c_name", "c_acctbal").filter(F.col("c_custkey") <= 50)
    r = simple_merge(spark, t, src, "c_custkey", delete="NO", schema_evolution=True)
    assert r.committed
    cur = t.read(spark)
    assert set(cur.columns) == {"c_custkey", "c_name", "c_acctbal"}
    # kept-unmatched rows read back NULL for the evolved column
    assert cur.filter(F.col("c_custkey") > 50).filter(F.col("c_acctbal").isNotNull()).count() == 0
    # matched rows took the source value
    assert cur.filter((F.col("c_custkey") <= 50) & F.col("c_acctbal").isNull()).count() == 0


def test_merge_without_evolution_still_rejects_extra_source_cols(spark, tmp_path):
    import pytest

    from sparkmerge import SnapshotTable, simple_merge
    from sparkmerge.errors import MergeValidationError

    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), c.select("c_custkey", "c_name").limit(10)
    )
    with pytest.raises(MergeValidationError):
        simple_merge(spark, t, c.select("c_custkey", "c_name", "c_acctbal"), "c_custkey")
