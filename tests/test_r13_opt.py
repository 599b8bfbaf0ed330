"""r13 optimization-round regression tests: the sort-based basket build
(output identity vs the r12 arrays path + SortAggregate planning +
conf-restore/partitioning semantics of _sortagg_checkpoint), tpch_q5's
size-gated supplier broadcast, and bench's cheapest-first sf1 ordering."""

from __future__ import annotations

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r["part_a"], r["part_b"], r["pair_n"], r["n_a"], r["n_b"],
         r["confidence"], r["lift"])
        for r in df.collect()
    )


def test_basket_build_paths_output_identical(spark):
    fn = registry()["orders_basket_lift"].fn
    ref = _rows(fn(spark, SF_DIR))  # default: sort-based build
    assert ref == _rows(fn(spark, SF_DIR, basket_build="arrays"))
    assert len(ref) > 0


def test_sortagg_checkpoint_plans_sort_aggregate_and_restores_confs(spark):
    """The basket build's collect_set must plan as a streaming SortAggregate
    (not ObjectHashAggregate — the r12 session-aging victim) under the flips
    _sortagg_checkpoint applies, and the flips must be construct-then-restore."""
    from pyspark.sql import functions as F

    from sparkmerge.queries import load
    from sparkmerge.queries.ext_analysis import _sortagg_checkpoint

    keys = (
        "spark.sql.adaptive.enabled",
        "spark.sql.execution.useObjectHashAggregateExec",
    )
    saved = {k: spark.conf.get(k) for k in keys}
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.execution.useObjectHashAggregateExec", "true")
        build = (
            load(spark, SF_DIR, "lineitem")
            .select("l_orderkey", "l_partkey")
            .repartition("l_orderkey")
            .sortWithinPartitions("l_orderkey", "l_partkey")
            .groupBy("l_orderkey")
            .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        )
        cp = _sortagg_checkpoint(build)
        # both flips restored after the materialization
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        assert (
            spark.conf.get("spark.sql.execution.useObjectHashAggregateExec")
            == "true"
        )
        # the checkpointed RDD records its static hash partitioning (a plain
        # localCheckpoint under AQE records UnknownPartitioning), so the
        # downstream consumers keyed on l_orderkey need no fresh exchange
        part = (
            cp._jdf.queryExecution().executedPlan().outputPartitioning().toString()
        )
        assert "hashpartitioning(l_orderkey" in part
        # and the build itself, planned under the same flips, is a streaming
        # SortAggregate — no resident per-group object hash map
        for k in keys:
            spark.conf.set(k, "false")
        build_plan = build._jdf.queryExecution().executedPlan().toString()
        assert "SortAggregate" in build_plan
        assert "ObjectHashAggregate" not in build_plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_q5_supplier_broadcast_gate(spark, monkeypatch):
    from sparkmerge.queries import analytics

    # small corpus: gate open (hint applies, bench plan unchanged)
    assert analytics._q5_supplier_broadcastable(SF_DIR)
    # simulated 100 TB supplier: gate closed — no forced broadcast
    monkeypatch.setattr(analytics, "_Q5_SUPPLIER_BCAST_MAX_BYTES", 0)
    assert not analytics._q5_supplier_broadcastable(SF_DIR)
    fn = registry()["tpch_q5"].fn
    gate_off = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    monkeypatch.undo()
    gate_on = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    # the gate changes join STRATEGY freedom only, never the result
    assert gate_on == gate_off
    assert len(gate_on) > 0


def test_q21_semi_join_below_windows(spark):
    """r13: the o_orderstatus='F' gate is a left-semi join BELOW the
    window exchange (per-order predicate over order-partitioned windows),
    and no orders join remains above the windows."""
    fn = registry()["tpch_q21_style"].fn
    plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    semi_at = plan.index("LeftSemi")
    window_at = plan.index("Window")
    # plans print top-down: the semi join appearing AFTER (deeper than)
    # the windows means it executes before them
    assert semi_at > window_at
    assert plan.count("LeftSemi") == 1


def test_sf1_leg_runs_cheapest_first():
    import bench

    assert set(bench._SF1_LAST_KNOWN_SEC) <= set(bench.HEADLINE)
    order = sorted(
        bench.HEADLINE, key=lambda op: bench._SF1_LAST_KNOWN_SEC.get(op, 0.0)
    )
    # budget exhaustion must drop the most expensive rows first — they are
    # the ones with receipts elsewhere (sf10 tail/levers, SCALING.md)
    assert order[-1] == "dedup_minhash"
    assert order[-2] == "orders_basket_lift"


def test_cross_source_mask_and_sets_output_identical(spark):
    """r13 session-3: the bitmask source-set aggregation (agg='mask',
    default) must be row-identical to the r12 collect_set path (agg='sets')
    in both shingle-key modes, and the mask plan must carry no
    ObjectHashAggregate (the resident-buffer profile the rewrite removes)."""
    fn = registry()["dedup_cross_source_matrix"].fn

    def rows(**kw):
        return sorted(tuple(r) for r in fn(spark, SF_DIR, **kw).collect())

    ref = rows()  # default: agg='mask'
    assert ref == rows(agg="sets")
    assert rows(shingle_key="hash") == rows(agg="sets", shingle_key="hash")
    assert len(ref) > 0
    plan = fn(spark, SF_DIR)._sc._jvm.PythonSQLUtils.explainString(
        fn(spark, SF_DIR)._jdf.queryExecution(), "formatted"
    )
    assert "ObjectHashAggregate" not in plan
    import pytest

    with pytest.raises(ValueError):
        fn(spark, SF_DIR, agg="nope")


def test_brand_audience_auto_gate_and_path_identity(spark, monkeypatch):
    """r13 session-3: agg='auto' resolves via the lineitem parquet-size
    gate (sets below, mask at scale); mask and sets are row-identical; the
    mask path's set build is a bit_or HashAggregate, never an
    ObjectHashAggregate."""
    import pytest

    from sparkmerge.queries import ext_analysis as ea

    fn = registry()["orders_brand_audience_jaccard"].fn

    def rows(**kw):
        return sorted(tuple(r) for r in fn(spark, SF_DIR, **kw).collect())

    ref = rows()  # auto -> sets at sf0.001
    assert ea._brand_audience_agg(SF_DIR) == "sets"
    assert ref == rows(agg="mask") == rows(agg="sets")
    assert len(ref) > 0
    with pytest.raises(ValueError):
        fn(spark, SF_DIR, agg="nope")
    # gate opens past the threshold, closes on unknown dirs (fail-safe)
    monkeypatch.setattr(ea, "_BRAND_MASK_MIN_BYTES", 0)
    assert ea._brand_audience_agg(SF_DIR) == "mask"
    assert ea._brand_audience_agg("/nonexistent") == "sets"
    monkeypatch.undo()
    # the mask build aggregates bitmasks declaratively (codegen HashAggregate)
    df = fn(spark, SF_DIR, agg="mask")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "ObjectHashAggregate" not in plan


def test_edges_pairgen_arrays_and_join_identical(spark):
    """r13 session-3: the Generate-based per-bucket pair expansion
    (pairgen='arrays', default) must produce the identical weighted edge
    multiset as the r4-r12 bucket-local self-join, at both the family cap
    and the tight cap."""
    import pytest

    from sparkmerge.queries.ext_graph import _BUCKET_CAP, _TIGHT_CAP, _edges

    for cap in (_BUCKET_CAP, _TIGHT_CAP):
        a = sorted(tuple(r) for r in _edges(spark, SF_DIR, cap=cap).collect())
        j = sorted(
            tuple(r)
            for r in _edges(spark, SF_DIR, cap=cap, pairgen="join").collect()
        )
        assert a == j
        assert len(a) > 0
    with pytest.raises(ValueError):
        _edges(spark, SF_DIR, pairgen="nope")


def test_events_type_cooccurrence_auto_gate_and_path_identity(spark, monkeypatch):
    """r13 session-3: both type-co-occurrence ops resolve agg='auto' via the
    events parquet-size gate and are row-identical across mask/sets."""
    import pytest

    from sparkmerge.queries import ext_analysis as ea

    assert ea._type_cooccurrence_agg(SF_DIR) == "sets"
    monkeypatch.setattr(ea, "_TYPE_MASK_MIN_BYTES", 0)
    assert ea._type_cooccurrence_agg(SF_DIR) == "mask"
    assert ea._type_cooccurrence_agg("/nonexistent") == "sets"
    monkeypatch.undo()
    for op in ("events_type_lift_matrix", "events_type_cooccurrence_daily"):
        fn = registry()[op].fn

        def rows(**kw):
            return sorted(tuple(r) for r in fn(spark, SF_DIR, **kw).collect())

        ref = rows()  # auto -> sets at sf0.001
        assert ref == rows(agg="mask") == rows(agg="sets")
        assert len(ref) > 0
        with pytest.raises(ValueError):
            fn(spark, SF_DIR, agg="nope")


def test_triangle_adjacency_generate_replaces_src_join(spark):
    """r13 session-3: the triangle kernel regenerates the oriented edge
    list map-side from the adjacency arrays (Generate), so the final plan
    carries exactly ONE adjacency join (the dstn re-key) — the r6-r12
    src-side shuffle join is gone — and the counts still match the naive
    per-node triangle enumeration on a small corpus."""
    import re

    from pyspark.sql import functions as F

    from sparkmerge.queries.ext_graph import (
        _TRI_MIN_W, _edges, _triangle_participation,
    )

    edges = (
        _edges(spark, SF_DIR).filter(F.col("w") >= _TRI_MIN_W).select("u", "v")
    )
    tri = _triangle_participation(edges)
    plan = tri._sc._jvm.PythonSQLUtils.explainString(
        tri._jdf.queryExecution(), "formatted"
    )
    joins = re.findall(r"\) (?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)", plan)
    assert len(joins) == 1, plan
    # ground truth: brute-force id-ordered triangle enumeration
    e = [(r["u"], r["v"]) for r in edges.collect()]
    es = set(e)
    from collections import Counter

    truth = Counter()
    nbrs = {}
    for u, v in e:
        nbrs.setdefault(u, set()).add(v)
    for u, v in e:
        for w in nbrs.get(u, set()) & nbrs.get(v, set()):
            truth[u] += 1
            truth[v] += 1
            truth[w] += 1
    got = {r["user_id"]: r["n_triangles"] for r in tri.collect()}
    assert got == dict(truth)


def test_vocab_overlap_mask_and_sets_output_identical(spark):
    """r13 session-4: text_source_vocab_overlap's bitmask source-set
    aggregation (agg='mask', default) must be row-identical to the
    collect_set path (agg='sets'), and the mask plan must carry no
    ObjectHashAggregate (the per-token resident-buffer profile the
    rewrite removes)."""
    fn = registry()["text_source_vocab_overlap"].fn

    def rows(**kw):
        return sorted(tuple(r) for r in fn(spark, SF_DIR, **kw).collect())

    ref = rows()  # default: agg='mask'
    assert ref == rows(agg="sets")
    assert len(ref) > 0
    df = fn(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "ObjectHashAggregate" not in plan
    import pytest

    with pytest.raises(ValueError):
        fn(spark, SF_DIR, agg="nope")


def test_pagerank_checkpoint_partitioning_and_single_lineage(spark):
    """r13 session-4: the degree-annotated adjacency checkpoint must record
    its hashpartitioning(src) (taken via _partitioned_checkpoint with AQE
    off — under AQE it recorded UnknownPartitioning and every iteration
    re-shuffled the full edge set), the initial ranks must derive from the
    checkpointed relation (no second run of the _edges lineage: zero
    parquet scans in the final plan), and only the per-iteration
    groupBy(dst) exchanges may remain."""
    saved = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        df = registry()["graph_pagerank_fixedpoint"].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "UnknownPartitioning" not in plan
        assert "hashpartitioning(src" in plan  # the recorded checkpoint layout
        assert "Scan parquet" not in plan  # lineage fully truncated
        import re

        n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        assert n_exchange == 3, plan  # one groupBy(dst) per iteration only
        # conf untouched by construction (the flip is inside the checkpoint)
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", saved)


def test_dedup_survivors_covers_deep_chains(spark):
    """r13 session-5: the sf10 minhash pair graph carries a near-dup chain
    of min-label eccentricity 17 (18 propagation rounds), so
    dedup_cluster_survivors' old max_iters=8 RAISED at sf10.  The consumer
    now passes 32; this pins the failure mode at library level — a 25-deep
    chain must raise under the old budget and resolve to the single min
    survivor under the new one (the loop exits on the label-sum fixed
    point, so converged corpora pay nothing for the larger bound)."""
    import pytest as _pytest

    from sparkmerge.ext.dedup import dedup_survivors

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 125)], "a_id int, b_id int"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup_survivors(chain, max_iters=8).collect()
    rows = dedup_survivors(chain, max_iters=32).collect()
    assert {r["survivor_id"] for r in rows} == {100}
    assert {r["doc_id"] for r in rows} == set(range(101, 126))


def test_recall_eval_certifiers_output_identical(spark):
    """r13: dedup_lsh_recall_eval's exact-truth certifier is now the
    inverted-index intersection COUNT over text-grain classes (60.9 -> 8.8 s
    at sf0.1); the pre-r13 broadcast nested-loop stays registered as
    certifier='nlj' and both must report the same TP/FP/FN/recall row --
    the truth sets are required to be IDENTICAL, not merely similar."""
    fn = registry()["dedup_lsh_recall_eval"].fn
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        count_rows = sorted(map(str, fn(spark, sf).collect()))
        nlj_rows = sorted(map(str, fn(spark, sf, certifier="nlj").collect()))
        assert count_rows == nlj_rows, sf
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown certifier"):
        fn(spark, "/root/testdata/sf0.001", certifier="bogus")
