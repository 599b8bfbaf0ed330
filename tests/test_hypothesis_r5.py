"""Hypothesis-randomized properties for the r5 primitives — the surfaces
whose correctness depends on tie-handling and ordering, where fixed
fixtures systematically under-test.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small domains force key/timestamp collisions — the interesting cases
_key = st.integers(min_value=0, max_value=3)
_t = st.integers(min_value=0, max_value=8)
_pay = st.integers(min_value=0, max_value=50)


@_settings
@given(
    left=st.lists(st.tuples(_key, _t), min_size=1, max_size=10),
    right=st.lists(st.tuples(_key, _t, _pay), min_size=0, max_size=12),
)
def test_asof_right_dups_max_equals_preaggregated(spark, left, right):
    """right_dups='max' must equal (groupBy max → unique as-of) on EVERY
    input, including duplicate (key, time) right rows and boundary ties."""
    from sparkmerge.ext.temporal import asof_join

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, t long"
    )
    rdf = spark.createDataFrame(right, "k long, t long, pay long") if right else (
        spark.createDataFrame([], "k long, t long, pay long")
    )
    unique = rdf.groupBy("k", "t").agg(F.max("pay").alias("pay"))
    kw = dict(key=("k", "k"), time=("t", "t"), right_payload=["pay"])
    a = asof_join(ldf, rdf, right_dups="max", **kw)
    b = asof_join(ldf, unique, **kw)
    fa = sorted(map(tuple, a.collect()))
    fb = sorted(map(tuple, b.collect()))
    assert fa == fb
    # reference semantics, independently recomputed
    expect = {}
    for i, (k, t) in enumerate(left):
        best_t = max((rt for (rk, rt, p) in right if rk == k and rt <= t), default=None)
        expect[i] = max(
            (p for (rk, rt, p) in right if rk == k and rt == best_t), default=None
        ) if best_t is not None else None
    got = {r["lid"]: r["pay"] for r in a.collect()}
    assert got == expect


@_settings
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 9), st.integers(1, 20)),
        min_size=1,
        max_size=12,
    )
)
def test_weighted_median_defining_inequalities(spark, rows):
    """For random (group, value, weight): the chosen median m must satisfy
    2·W(<m) < W_total ≤ 2·W(≤m) in every group."""
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [(g, v, w, i) for i, (g, v, w) in enumerate(rows)],
        "g long, v long, w long, rid long",
    )
    w_cum = (
        Window.partitionBy("g").orderBy("v", "rid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = df.select(
        "g", "v",
        F.sum("w").over(w_cum).alias("cumw"),
        F.sum("w").over(Window.partitionBy("g")).alias("total"),
    )
    med = {
        r["g"]: r["m"]
        for r in cum.filter(2 * F.col("cumw") >= F.col("total"))
        .groupBy("g").agg(F.min("v").alias("m")).collect()
    }
    from collections import defaultdict

    by_g = defaultdict(list)
    for g, v, w in rows:
        by_g[g].append((v, w))
    for g, vals in by_g.items():
        m = med[g]
        total = sum(w for _, w in vals)
        below = sum(w for v, w in vals if v < m)
        upto = sum(w for v, w in vals if v <= m)
        assert 2 * below < total <= 2 * upto


@_settings
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9), st.integers(1, 9)),
        min_size=0,
        max_size=20,
    ),
    k=st.integers(1, 3),
)
def test_mutual_topk_bounds_degree(spark, edges, k):
    """Mutual top-K sparsification on a random weighted graph: every node's
    degree in the surviving edge set is ≤ K, and every surviving edge was in
    BOTH endpoints' top-K lists."""
    from pyspark.sql.window import Window

    und = {}
    for a, b, w in edges:
        if a == b:
            continue
        u, v = min(a, b), max(a, b)
        und[(u, v)] = w  # last write wins — deterministic for the test
    if not und:
        return
    df = spark.createDataFrame(
        [(u, v, w) for (u, v), w in und.items()], "u long, v long, w long"
    )
    db = df.unionByName(df.select(F.col("v").alias("u"), F.col("u").alias("v"), "w"))
    rn = F.row_number().over(Window.partitionBy("u").orderBy(F.desc("w"), F.asc("v")))
    pick = db.withColumn("rn", rn).filter(F.col("rn") <= k).select("u", "v")
    surviving = (
        pick.select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .groupBy("u", "v").count().filter("count = 2").select("u", "v")
    )
    surv = [(r["u"], r["v"]) for r in surviving.collect()]
    from collections import Counter

    deg = Counter()
    for u, v in surv:
        deg[u] += 1
        deg[v] += 1
    assert all(d <= k for d in deg.values())
    # independently recompute each node's top-k and check mutuality
    import collections

    adj = collections.defaultdict(list)
    for (u, v), w in und.items():
        adj[u].append((w, v))
        adj[v].append((w, u))
    topk = {
        n: {v for _, v in sorted(lst, key=lambda t: (-t[0], t[1]))[:k]}
        for n, lst in adj.items()
    }
    expect = {
        (u, v)
        for (u, v) in und
        if v in topk[u] and u in topk[v]
    }
    assert set(surv) == expect
