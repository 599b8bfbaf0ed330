"""Metamorphic/property tests (SURVEY.md §5.3): what MERGE semantics
guarantee, checked on the driver corpus fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkmerge import SnapshotTable, build_changeset, simple_merge
from sparkmerge.queries import load
from sparkmerge.queries.fixtures import orders_source
from tests.conftest import SF_DIR


def test_convergence_and_idempotence(spark, tmp_table_dir):
    """After merge with delete='YES' and no filter, target ≡ source; merging
    the same source again changes nothing."""
    orders = load(spark, SF_DIR, "orders")
    src = orders_source(spark, SF_DIR)
    tbl = SnapshotTable.create(spark, tmp_table_dir, orders)

    res1 = simple_merge(spark, tbl, src, "o_orderkey")
    final = tbl.read(spark)
    assert final.exceptAll(src).count() == 0
    assert src.exceptAll(final).count() == 0

    res2 = simple_merge(spark, tbl, src, "o_orderkey")
    assert res2.changed_rows == 0
    assert res1.changed_rows > 0


def test_conservation(spark):
    """INSERT+UPDATE+DELETE counts equal the changed-rows total (@@ROWCOUNT
    semantics, sp_SimpleMerge.sql:472) and row-count arithmetic holds."""
    orders = load(spark, SF_DIR, "orders")
    src = orders_source(spark, SF_DIR)
    cs = build_changeset(orders, src, "o_orderkey")
    c = cs.action_counts()
    assert orders.count() == c.get("UPDATE", 0) + c.get("KEEP", 0) + c.get("DELETE", 0)
    assert src.count() == c.get("UPDATE", 0) + c.get("KEEP", 0) + c.get("INSERT", 0)
    assert cs.apply_changes().count() == src.count()


def test_scope_invariance(spark, tmp_table_dir):
    """Rows failing target_filter are byte-identical before/after."""
    orders = load(spark, SF_DIR, "orders")
    pred = "o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'"
    out_before = orders.filter(f"NOT coalesce({pred}, false)")
    tbl = SnapshotTable.create(spark, tmp_table_dir, orders)
    simple_merge(spark, tbl, orders_source(spark, SF_DIR), "o_orderkey", target_filter=pred)
    out_after = tbl.read(spark).filter(f"NOT coalesce({pred}, false)")
    assert out_before.exceptAll(out_after).count() == 0
    assert out_after.exceptAll(out_before).count() == 0


def test_badkey_full_table_converges(spark, tmp_table_dir):
    """Merging lineitem on its non-unique l_orderkey with badKey converges to
    the source multiset."""
    li = load(spark, SF_DIR, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    src = li.filter(F.col("l_orderkey") % 100 != 0).withColumn(
        "l_quantity", F.col("l_quantity") + 1.0
    )
    tbl = SnapshotTable.create(spark, tmp_table_dir, li)
    simple_merge(spark, tbl, src, "l_orderkey", bad_key=True)
    final = tbl.read(spark)
    assert final.exceptAll(src).count() == 0
    assert src.exceptAll(final).count() == 0


def test_snapshot_versioning_and_vacuum(spark, tmp_table_dir):
    orders = load(spark, SF_DIR, "orders").limit(100)
    tbl = SnapshotTable.create(spark, tmp_table_dir, orders)
    for _ in range(3):
        simple_merge(spark, tbl, orders, "o_orderkey")
    assert tbl.current_version() == 4
    removed = tbl.vacuum(keep=2)
    assert removed == [1, 2]
    assert tbl.read(spark).count() == 100
    assert "lastUpdate" in tbl.properties()
