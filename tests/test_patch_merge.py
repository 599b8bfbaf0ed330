"""update_mode='patch' golden tests (r5 verdict ask #5): NULL source column
= keep target, change detection over non-null source columns only, dense
input degenerates to the overwrite mode exactly."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sparkmerge.changeset import build_changeset
from sparkmerge.errors import MergeValidationError
from sparkmerge.queries.fixtures import orders_source

SF_DIR = "/root/testdata/sf0.001"


def test_patch_null_keeps_target_value(spark):
    schema = "k int, v1 string, v2 double"
    t = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], schema)
    s = spark.createDataFrame([(1, None, 9.0), (2, "B", None)], schema)
    cs = build_changeset(t, s, "k", update_mode="patch")
    got = {r["k"]: (r["_action"], r["_new"]["v1"], r["_new"]["v2"]) for r in cs.df.collect()}
    assert got == {1: ("UPDATE", "a", 9.0), 2: ("UPDATE", "B", 2.0)}


def test_patch_allnull_and_value_equal_rows_are_keep(spark):
    schema = "k int, v1 string, v2 double"
    t = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0), (3, None, 3.0)], schema)
    s = spark.createDataFrame(
        [(1, None, None),  # all-null patch: no-op
         (2, "b", None),   # non-null but value-equal: no-op
         (3, None, 3.0)],  # hole over a NULL target + equal v2: no-op
        schema,
    )
    cs = build_changeset(t, s, "k", update_mode="patch")
    assert {r["_action"] for r in cs.df.collect()} == {"KEEP"}


def test_patch_insert_keeps_source_nulls(spark):
    """On INSERT there is no target value — holes stay NULL."""
    schema = "k int, v1 string, v2 double"
    t = spark.createDataFrame([(1, "a", 1.0)], schema)
    s = spark.createDataFrame([(9, None, 9.0)], schema)
    cs = build_changeset(t, s, "k", delete="NO", update_mode="patch")
    ins = {r["k"]: r for r in cs.df.collect()}[9]
    assert ins["_action"] == "INSERT"
    assert ins["_new"]["v1"] is None and ins["_new"]["v2"] == 9.0


def test_patch_cannot_set_null_by_design(spark):
    """'set column to NULL' is not expressible under patch — the hole keeps
    the target value (the documented contract; overwrite mode does nulls)."""
    schema = "k int, v1 string"
    t = spark.createDataFrame([(1, "a")], schema)
    s = spark.createDataFrame([(1, None)], schema)
    patch = build_changeset(t, s, "k", update_mode="patch").df.first()
    over = build_changeset(t, s, "k").df.first()
    assert patch["_action"] == "KEEP" and patch["_new"]["v1"] == "a"
    assert over["_action"] == "UPDATE" and over["_new"]["v1"] is None


def test_patch_dense_input_equals_overwrite(spark):
    """With a NULL-free source the two modes are the same function — the
    changeset frames must be row-for-row identical on the real corpus."""
    t = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    s = orders_source(spark, SF_DIR)
    a = build_changeset(t, s, "o_orderkey", update_mode="patch").df
    b = build_changeset(t, s, "o_orderkey", update_mode="overwrite").df
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_patch_composes_with_broadcast_strategy(spark):
    """Physical strategy must never change patch content."""
    schema = "k int, v1 string, v2 double"
    t = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], schema)
    s = spark.createDataFrame([(1, None, 9.0), (4, "d", None)], schema)
    sh = build_changeset(t, s, "k", delete="NO", update_mode="patch").df
    br = build_changeset(t, s, "k", delete="NO", update_mode="patch", strategy="broadcast").df
    assert sorted(map(tuple, sh.collect())) == sorted(map(tuple, br.collect()))


def test_patch_idempotent_fold(spark):
    """Applying the same patch to the patched state yields all-KEEP."""
    schema = "k int, v1 string, v2 double"
    t = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], schema)
    s = spark.createDataFrame([(1, "A", None), (2, None, 20.0)], schema)
    cs = build_changeset(t, s, "k", delete="NO", update_mode="patch")
    t2 = cs.apply_changes()
    cs2 = build_changeset(t2, s, "k", delete="NO", update_mode="patch")
    assert {r["_action"] for r in cs2.df.collect()} == {"KEEP"}


def test_patch_rejects_unknown_mode(spark):
    schema = "k int, v1 string"
    t = spark.createDataFrame([(1, "a")], schema)
    with pytest.raises(MergeValidationError):
        build_changeset(t, t, "k", update_mode="upsert")


# --- hypothesis properties (same style as test_hypothesis_merge) ----------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_k = st.integers(min_value=0, max_value=6)
_v = st.one_of(st.none(), st.integers(min_value=0, max_value=3))


@st.composite
def _patch_pair(draw):
    t = draw(st.lists(st.tuples(_k, _v, _v), min_size=0, max_size=8))
    s = draw(st.lists(st.tuples(_k, _v, _v), min_size=0, max_size=8))

    def dedupe(rows):
        seen, uniq = set(), []
        for r in rows:
            if r[0] not in seen:
                seen.add(r[0])
                uniq.append(r)
        return uniq

    return dedupe(t), dedupe(s)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pair=_patch_pair())
def test_patch_invariants_hold_for_random_tables(spark, pair):
    t_rows, s_rows = pair
    schema = "k int, v1 int, v2 int"
    target = spark.createDataFrame(t_rows, schema) if t_rows else spark.createDataFrame([], schema)
    source = spark.createDataFrame(s_rows, schema) if s_rows else spark.createDataFrame([], schema)

    cs = build_changeset(target, source, "k", delete="NO", update_mode="patch")
    got = {r["k"]: (r["_action"], r["_new"]["v1"], r["_new"]["v2"]) for r in cs.df.collect()}

    tmap = {k: (v1, v2) for k, v1, v2 in t_rows}
    smap = {k: (v1, v2) for k, v1, v2 in s_rows}
    for k in set(tmap) | set(smap):
        if k not in tmap:
            exp_action = "INSERT"
            exp = smap[k]
        elif k not in smap:
            exp_action = "KEEP"
            exp = tmap[k]
        else:
            coal = tuple(
                s if s is not None else t for s, t in zip(smap[k], tmap[k])
            )
            exp_action = "UPDATE" if coal != tmap[k] else "KEEP"
            exp = coal
        assert got[k] == (exp_action, *exp), (k, got[k], exp_action, exp)

    # idempotence: patch the patched state again → all KEEP
    t2 = cs.apply_changes()
    cs2 = build_changeset(t2, source, "k", delete="NO", update_mode="patch")
    assert all(r["_action"] == "KEEP" for r in cs2.df.collect())


def test_patch_through_snapshot_table(spark, tmp_path):
    """The storage path accepts the mode: patched state committed, holes
    keep target values, and a re-merge of the same patch is 0 changed."""
    from sparkmerge.merge import simple_merge
    from sparkmerge.table import SnapshotTable

    schema = "k int, v1 string, v2 double"
    t0 = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], schema)
    patch = spark.createDataFrame([(1, "A", None), (2, None, 20.0)], schema)
    table = SnapshotTable.create(spark, str(tmp_path / "t"), t0)
    r1 = simple_merge(spark, table, patch, "k", delete="NO", update_mode="patch")
    assert r1.committed and r1.changed_rows == 2
    got = {r["k"]: (r["v1"], r["v2"]) for r in table.read(spark).collect()}
    assert got == {1: ("A", 1.0), 2: ("b", 20.0), 3: ("c", 3.0)}
    r2 = simple_merge(spark, table, patch, "k", delete="NO", update_mode="patch")
    assert r2.changed_rows == 0


def test_patch_through_partitioned_table(spark, tmp_path):
    """Patch mode composes with partition write-pruning: only partitions
    holding a changed row are rewritten."""
    from sparkmerge.merge import merge_partitioned
    from sparkmerge.ptable import PartitionedSnapshotTable

    schema = "k int, ds string, v1 string, v2 double"
    t0 = spark.createDataFrame(
        [(1, "d1", "a", 1.0), (2, "d1", "b", 2.0), (3, "d2", "c", 3.0), (4, "d3", "d", 4.0)],
        schema,
    )
    patch = spark.createDataFrame([(1, "d1", None, 10.0), (3, "d2", "C", None)], schema)
    t = PartitionedSnapshotTable.create(spark, str(tmp_path / "pt"), t0, partition_by="ds")
    merge_partitioned(spark, t, patch, ["k", "ds"], delete="NO",
                      prune_scan=True, update_mode="patch")
    got = {r["k"]: (r["v1"], r["v2"]) for r in t.read(spark).collect()}
    assert got == {1: ("a", 10.0), 2: ("b", 2.0), 3: ("C", 3.0), 4: ("d", 4.0)}
