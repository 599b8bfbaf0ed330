"""PartitionedSnapshotTable + merge_partitioned (SURVEY.md §7.2 100 TB design).

The load-bearing claims under test:
1. write pruning is invisible: merge_partitioned ≡ simple_merge on the same
   inputs (row-for-row);
2. untouched partitions are carried forward BY REFERENCE (same manifest
   paths, files physically untouched), not rewritten;
3. an idempotent merge is a metadata-only commit (zero data written);
4. scan pruning with the partition column in the key ≡ partition-scoped
   merge semantics;
5. threshold abort never publishes the staged version.
"""

import os

import pytest
from pyspark.sql import functions as F

from sparkmerge.errors import MergeError, MergeThresholdExceeded, MergeValidationError
from sparkmerge.merge import merge_partitioned, merge_preview
from sparkmerge.ptable import HIVE_NULL, PartitionedSnapshotTable

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def mutated(orders):
    """Deterministic source: updates (%3), deletes (%10), inserts (%50)."""
    upd = F.col("o_orderkey") % 3 == 0
    base = orders.where(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.when(upd, F.col("o_orderkey").cast("double")).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderdate", "o_orderpriority",
    )
    ins = orders.where(F.col("o_orderkey") % 50 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        "o_custkey", "o_orderstatus",
        F.col("o_orderkey").cast("double").alias("o_totalprice"),
        "o_orderdate", "o_orderpriority",
    )
    return base.unionAll(ins)


def same_rows(a, b):
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_create_read_roundtrip(spark, orders, tmp_path):
    t = PartitionedSnapshotTable.create(spark, str(tmp_path / "t"), orders, "o_orderstatus")
    assert same_rows(t.read(spark), orders)
    assert sorted(t.partitions()) == ["F", "O", "P"]
    # pruned read only lists the requested partition's directory
    o_only = t.read_partitions(spark, ["O"])
    assert o_only.count() == orders.filter("o_orderstatus = 'O'").count()


def test_partitioned_merge_matches_full_merge(spark, orders, tmp_path):
    t = PartitionedSnapshotTable.create(spark, str(tmp_path / "t"), orders, "o_orderstatus")
    src = mutated(orders)
    res = merge_partitioned(spark, t, src, "o_orderkey")
    expected = merge_preview(orders, src, "o_orderkey")
    assert same_rows(t.read(spark), expected)
    assert res.committed and res.version == 2
    assert res.changed_rows == res.audit_rows or res.audit_rows is None


def test_untouched_partitions_carried_by_reference(spark, orders, tmp_path):
    t = PartitionedSnapshotTable.create(spark, str(tmp_path / "t"), orders, "o_orderstatus")
    v1_parts = t.partitions()
    # source touches ONLY the 'O' partition (status is in the key → prunable)
    src = mutated(orders.filter("o_orderstatus = 'O'"))
    merge_partitioned(spark, t, src, ["o_orderkey", "o_orderstatus"], prune_scan=True)
    v2_parts = t.partitions()
    assert v2_parts["F"] == v1_parts["F"] and v2_parts["P"] == v1_parts["P"]
    assert v2_parts["O"] != v1_parts["O"] and v2_parts["O"].startswith(os.path.join("files", "v2"))
    # scan-pruned semantics: 'F'/'P' rows byte-identical, 'O' converged to src
    final = t.read(spark)
    assert same_rows(final.filter("o_orderstatus <> 'O'"),
                     orders.filter("o_orderstatus <> 'O'"))
    assert same_rows(final.filter("o_orderstatus = 'O'"), src)


def test_idempotent_merge_is_metadata_only(spark, orders, tmp_path):
    t = PartitionedSnapshotTable.create(spark, str(tmp_path / "t"), orders, "o_orderstatus")
    res = merge_partitioned(spark, t, orders, "o_orderkey")
    assert res.changed_rows == 0 and res.committed and t.current_version() == 2
    # nothing rewritten: every manifest entry still points at v1 data
    assert all(d.startswith(os.path.join("files", "v1")) for d in t.partitions().values())
    assert not os.path.exists(str(tmp_path / "t" / "files" / "v2"))


def test_emptied_partition_dropped_from_manifest(spark, orders, tmp_path):
    t = PartitionedSnapshotTable.create(spark, str(tmp_path / "t"), orders, "o_orderstatus")
    src = orders.filter("o_orderstatus <> 'P'")  # delete every 'P' row
    merge_partitioned(spark, t, src, "o_orderkey")
    assert sorted(t.partitions()) == ["F", "O"]
    assert t.read(spark).filter("o_orderstatus = 'P'").count() == 0


def test_null_partition_values(spark, orders, tmp_path):
    with_null = orders.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 4 == 0, None).otherwise(F.col("o_orderstatus")),
    )
    t = PartitionedSnapshotTable.create(spark, str(tmp_path / "t"), with_null, "o_orderstatus")
    assert HIVE_NULL in t.partitions()
    assert same_rows(t.read(spark), with_null)
    src = mutated(with_null)
    merge_partitioned(spark, t, src, "o_orderkey")
    assert same_rows(t.read(spark), merge_preview(with_null, src, "o_orderkey"))


def test_threshold_abort_leaves_table_untouched(spark, orders, tmp_path):
    t = PartitionedSnapshotTable.create(spark, str(tmp_path / "t"), orders, "o_orderstatus")
    with pytest.raises(MergeThresholdExceeded):
        merge_partitioned(spark, t, orders.limit(3), "o_orderkey", threshold="1%")
    assert t.current_version() == 1
    assert not os.path.exists(str(tmp_path / "t" / "v=2.json"))
    assert same_rows(t.read(spark), orders)
    assert "lastUpdate" not in t.properties()


def test_prune_scan_requires_partition_col_in_key(spark, orders, tmp_path):
    t = PartitionedSnapshotTable.create(spark, str(tmp_path / "t"), orders, "o_orderstatus")
    with pytest.raises(MergeValidationError):
        merge_partitioned(spark, t, orders, "o_orderkey", prune_scan=True)


def test_vacuum_keeps_referenced_dirs(spark, orders, tmp_path):
    t = PartitionedSnapshotTable.create(spark, str(tmp_path / "t"), orders, "o_orderstatus")
    src = mutated(orders.filter("o_orderstatus = 'O'"))
    merge_partitioned(spark, t, src, ["o_orderkey", "o_orderstatus"], prune_scan=True)
    merge_partitioned(spark, t, src, ["o_orderkey", "o_orderstatus"], prune_scan=True)
    removed = t.vacuum(keep=1)
    assert removed  # old manifests dropped
    # v1 dirs still referenced by the current manifest must survive
    assert same_rows(t.read(spark).filter("o_orderstatus <> 'O'"),
                     orders.filter("o_orderstatus <> 'O'"))


def test_commit_conflict_detected(spark, orders, tmp_path):
    from sparkmerge.errors import MergeConflictError
    from sparkmerge.table import SnapshotTable

    t = PartitionedSnapshotTable.create(spark, str(tmp_path / "t"), orders, "o_orderstatus")
    # writer A stages against v1...
    staged_a = t.stage_merge(orders.filter("o_orderstatus = 'O'"), {"O"})
    # ...but writer B commits first (simulated by swapping the pointer)
    t._swap_pointer(staged_a)
    t._write_manifest(staged_a + 1, "o_orderstatus", orders.schema, t.partitions())
    with pytest.raises(MergeConflictError):
        # A's staged version now trails the pointer — publishing must refuse
        t.commit(staged_a)

    # plain SnapshotTable: same contract
    s = SnapshotTable.create(spark, str(tmp_path / "s"), orders.limit(10))
    v2 = s.stage(orders.limit(5))
    s._swap_pointer(v2)  # concurrent writer took v2
    v2b = s.stage(orders.limit(3))  # stages v3 — fine
    s.commit(v2b)  # v3 over v2: no conflict
    with pytest.raises(MergeConflictError):
        s.commit(v2)  # stale staged version must refuse


def test_compact_merges_small_files(spark, orders, tmp_path):
    t = PartitionedSnapshotTable.create(
        spark, str(tmp_path / "t"), orders.repartition(6), "o_orderstatus"
    )
    before = t.read(spark)

    def files_of(val):
        d = os.path.join(str(tmp_path / "t"), t.partitions()[val])
        return [f for f in os.listdir(d) if f.endswith(".parquet")]

    assert len(files_of("O")) > 1  # fragmented by the 6-way repartition
    v = t.compact(spark)
    assert v == t.current_version() == 2
    assert len(files_of("O")) == 1
    assert same_rows(t.read(spark), before)  # data identical
    # partial compaction: only chosen partitions rewritten
    t2_parts_before = t.partitions()
    t.compact(spark, values=["F"])
    assert t.partitions()["O"] == t2_parts_before["O"]  # untouched by reference


def test_schema_evolution_widen_then_merge(spark, orders, tmp_path):
    from sparkmerge.merge import simple_merge
    from sparkmerge.table import SnapshotTable

    t = SnapshotTable.create(spark, str(tmp_path / "t"), orders.limit(100))
    src_wide = orders.limit(100).withColumn("o_score", F.lit(1.5))
    # source grew a column the target lacks → reference rule rejects it
    with pytest.raises(MergeValidationError):
        simple_merge(spark, t, src_wide, "o_orderkey")
    # explicit widening step, then the same merge succeeds
    t.add_columns(spark, {"o_score": "double"})
    assert t.read(spark).filter(F.col("o_score").isNull()).count() == 100
    res = simple_merge(spark, t, src_wide, "o_orderkey")
    assert res.committed
    assert t.read(spark).filter(F.col("o_score") == 1.5).count() == 100


def test_streaming_foreachbatch_into_partitioned_table(spark, orders, tmp_path):
    """The full 100 TB pattern end-to-end: a stream of micro-batch upserts
    applied with merge_partitioned — only the partitions each batch touches
    are rewritten."""
    t = PartitionedSnapshotTable.create(spark, str(tmp_path / "t"), orders, "o_orderstatus")
    src = mutated(orders.filter("o_orderstatus = 'O'"))
    multi = str(tmp_path / "src_batches")
    src.repartitionByRange(3, "o_orderkey").write.parquet(multi)
    v1_parts = t.partitions()

    schema = spark.read.parquet(multi).schema

    def sink(batch_df, batch_id):
        merge_partitioned(
            spark, t, batch_df, ["o_orderkey", "o_orderstatus"],
            prune_scan=True, delete="NO",
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(multi)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)

    # untouched partitions: still the v1 directories, byte-identical
    assert t.partitions()["F"] == v1_parts["F"]
    assert t.partitions()["P"] == v1_parts["P"]
    # upserts applied (delete='NO': unmatched target rows remain)
    final = t.read(spark)
    expected = merge_preview(orders, src, "o_orderkey", delete="NO")
    assert same_rows(final, expected)


def test_full_stage_rejected(spark, orders, tmp_path):
    t = PartitionedSnapshotTable.create(spark, str(tmp_path / "t"), orders, "o_orderstatus")
    with pytest.raises(MergeError):
        t.stage(orders)


def test_composite_partition_via_derived_column(spark, orders, tmp_path):
    """The documented multi-column partitioning pattern (ptable.py module
    docstring): partition by a derived composite column, include it in the
    join key, and scan/write pruning both apply per composite value."""
    base = orders.withColumn(
        "part_key",
        F.concat_ws("|", F.col("o_orderstatus"), (F.col("o_custkey") % 2).cast("string")),
    )
    t = PartitionedSnapshotTable.create(spark, str(tmp_path / "t"), base, "part_key")
    assert len(t.partitions()) == 6  # 3 statuses x 2 buckets
    v1 = t.partitions()

    src = mutated(base.filter("part_key = 'O|0'")).withColumn(
        "part_key",
        F.concat_ws("|", F.col("o_orderstatus"), (F.col("o_custkey") % 2).cast("string")),
    )
    merge_partitioned(spark, t, src, ["o_orderkey", "part_key"], prune_scan=True)
    after = t.partitions()
    untouched = [k for k in after if k != "O|0"]
    assert all(after[k] == v1[k] for k in untouched)
    assert after["O|0"] != v1["O|0"]
    assert same_rows(t.read(spark).filter("part_key = 'O|0'"), src)


def test_partitioned_merge_audit_and_threshold(spark, orders, tmp_path):
    """merge_partitioned matrix: audit sink receives the changeset, and the
    threshold guard aborts without publishing OR stamping."""
    import pytest as _pytest

    from sparkmerge.errors import MergeThresholdExceeded as _Thresh

    t = PartitionedSnapshotTable.create(spark, str(tmp_path / "t"), orders, "o_orderstatus")
    src = mutated(orders.filter("o_orderstatus = 'O'"))
    audit = str(tmp_path / "audit")
    res = merge_partitioned(
        spark, t, src, ["o_orderkey", "o_orderstatus"],
        prune_scan=True, audit_path=audit, threshold="99%",
    )
    a = spark.read.parquet(audit)
    assert a.count() == res.changed_rows == res.audit_rows
    assert set(r.action for r in a.select("action").distinct().collect()) <= {
        "INSERT", "UPDATE", "DELETE"
    }
    # threshold abort on a second, tiny-source merge
    v = t.current_version()
    with _pytest.raises(_Thresh):
        merge_partitioned(
            spark, t, src.limit(1), ["o_orderkey", "o_orderstatus"],
            prune_scan=True, threshold="0.0001%",
        )
    assert t.current_version() == v


def test_many_changed_partitions_semi_join_path(spark, orders, tmp_path):
    """>64 changed partitions exercises the broadcast-semi-join filter path
    (an IN-list over thousands of values would blow up the expression)."""
    base = orders.withColumn("bucket", (F.col("o_custkey") % 80).cast("string"))
    t = PartitionedSnapshotTable.create(spark, str(tmp_path / "t"), base, "bucket")
    assert len(t.partitions()) == 80
    src = base.withColumn(
        "o_totalprice", F.col("o_totalprice") + 1.0  # touch every partition
    )
    res = merge_partitioned(spark, t, src, "o_orderkey")
    assert res.committed
    assert same_rows(t.read(spark), src)


def test_time_travel_reads(spark, orders, tmp_path):
    """MVCC time travel: every retained version stays readable by number on
    both table types; vacuumed versions raise/vanish."""
    from sparkmerge.table import SnapshotTable

    t = PartitionedSnapshotTable.create(spark, str(tmp_path / "t"), orders, "o_orderstatus")
    src = mutated(orders.filter("o_orderstatus = 'O'"))
    merge_partitioned(spark, t, src, ["o_orderkey", "o_orderstatus"], prune_scan=True)
    assert t.versions() == [1, 2]
    assert same_rows(t.read(spark, version=1), orders)   # pre-merge state
    assert same_rows(t.read(spark), t.read(spark, version=2))

    s = SnapshotTable.create(spark, str(tmp_path / "s"), orders.limit(100))
    from sparkmerge.merge import simple_merge
    simple_merge(spark, s, orders.limit(50), "o_orderkey")
    assert s.versions() == [1, 2]
    assert s.read(spark, version=1).count() == 100
    assert s.read(spark).count() == 50
    s.vacuum(keep=1)
    with pytest.raises(MergeError):
        s.read(spark, version=1)


def test_diff_versions_reconstructs_cdc(spark, orders, tmp_path):
    """diff_versions over the MVCC history matches the merge's own counts —
    after-the-fact CDC without an audit sink."""
    from sparkmerge.merge import diff_versions, simple_merge
    from sparkmerge.table import SnapshotTable

    t = SnapshotTable.create(spark, str(tmp_path / "t"), orders)
    src = mutated(orders)
    res = simple_merge(spark, t, src, "o_orderkey")
    diff = diff_versions(spark, t, "o_orderkey", from_version=1, to_version=2)
    n_changed = diff.filter(F.col("_action") != "KEEP").count()
    assert n_changed == res.changed_rows
    by_action = {r["_action"]: r["n"] for r in
                 diff.groupBy("_action").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_action.get("INSERT", 0) > 0 and by_action.get("DELETE", 0) > 0


def test_partitioned_debug_dry_run(spark, orders, tmp_path):
    from sparkmerge.merge import MergeReport

    t = PartitionedSnapshotTable.create(spark, str(tmp_path / "t"), orders, "o_orderstatus")
    src = mutated(orders.filter("o_orderstatus = 'O'"))
    rep = merge_partitioned(
        spark, t, src, ["o_orderkey", "o_orderstatus"], prune_scan=True, debug=True
    )
    assert isinstance(rep, MergeReport)
    assert "scan-pruned" in rep.merge_sql and "MERGE INTO" in rep.merge_sql
    assert rep.target_rows == orders.filter("o_orderstatus = 'O'").count()
    assert t.current_version() == 1 and t.properties() == {}  # zero side effects


def test_prune_scan_with_broadcast_strategy(spark, orders, tmp_path):
    """The full 100 TB combination: partition-pruned target scan + the
    broadcast changeset (no target-row shuffle).  Must match the shuffle
    strategy's end state exactly, and untouched partitions must still be
    carried forward by reference."""
    t = PartitionedSnapshotTable.create(spark, str(tmp_path / "t"), orders, "o_orderstatus")
    v1_parts = t.partitions()
    src = mutated(orders.filter("o_orderstatus = 'O'"))
    merge_partitioned(spark, t, src, ["o_orderkey", "o_orderstatus"],
                      prune_scan=True, strategy="broadcast")
    t2 = PartitionedSnapshotTable.create(spark, str(tmp_path / "t2"), orders, "o_orderstatus")
    merge_partitioned(spark, t2, src, ["o_orderkey", "o_orderstatus"],
                      prune_scan=True, strategy="shuffle")
    assert same_rows(t.read(spark), t2.read(spark))
    parts = t.partitions()
    assert parts["F"] == v1_parts["F"] and parts["P"] == v1_parts["P"]
    assert parts["O"].startswith(os.path.join("files", "v2"))


def test_incremental_ingest_loop(spark, tmp_path):
    """Condensed tools/soak_incremental.py: three ingest days through a
    month-partitioned table (pruned scan + auto strategy), asserting
    copy-forward, pruned rewrites, metadata-only idempotent commits, and
    convergence to the pure-dataflow replay."""
    from sparkmerge.merge import merge_preview

    orders = spark.read.parquet(f"{SF}/orders.parquet").withColumn(
        "ds", F.date_format("o_orderdate", "yyyy-MM")
    )
    months = sorted(r["ds"] for r in orders.select("ds").distinct().collect())
    keys = ["o_orderkey", "ds"]

    def day_delta(i):
        m = orders.filter(F.col("ds") == months[i])
        mut = F.col("o_orderkey") % 2 == 0
        return m.filter(F.col("o_orderkey") % 3 == 0).select(
            "o_orderkey", "o_custkey",
            F.when(mut, F.lit("X")).otherwise(F.col("o_orderstatus")).alias("o_orderstatus"),
            F.when(mut, F.col("o_totalprice") + 1.0).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
            "o_orderdate", "o_orderpriority", "ds",
        )

    t = PartitionedSnapshotTable.create(spark, str(tmp_path / "t"), orders, "ds")
    expected = orders
    for i in range(3):
        before = t.partitions()
        delta = day_delta(i)
        merge_partitioned(spark, t, delta, keys, delete="NO",
                          prune_scan=True, strategy="auto")
        after = t.partitions()
        assert all(after[m] == before[m] for m in before if m != months[i])
        assert {m for m in after if after[m] != before.get(m)} <= {months[i]}
        expected = merge_preview(expected, delta, keys, delete="NO")
        v = t.current_version()
        merge_partitioned(spark, t, delta, keys, delete="NO",
                          prune_scan=True, strategy="auto")
        assert t.current_version() == v + 1  # committed...
        assert not os.path.exists(str(tmp_path / "t" / "files" / f"v{v + 1}"))  # ...metadata-only
    assert same_rows(t.read(spark), expected)
    assert same_rows(t.read(spark, version=1), orders)
