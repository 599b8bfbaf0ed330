"""Behavior + plan-shape tests for the round-4 ext_graph operators
(co-occurrence edges, degree profile, degree-ordered triangle counting,
fixed-point PageRank).  Brute-force Python recomputations from the raw
events table are the ground truth at sf0.001."""

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from sparkmerge.queries import registry
from sparkmerge.queries.ext_graph import _BUCKET_CAP, _TIGHT_CAP

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _brute_edges(spark, cap=_BUCKET_CAP):
    """Ground-truth capped co-occurrence edges: per (hour, type) bucket keep
    the `cap` members smallest under the integer-mix rank (the same
    deterministic uniform sample the engine and oracle compute), then pair."""
    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select(
            F.date_trunc("hour", "ts").alias("b"), "event_type", "user_id"
        )
        .collect()
    )
    buckets = defaultdict(set)
    for r in rows:
        buckets[(r["b"], r["event_type"])].add(r["user_id"])
    w = Counter()
    for users in buckets.values():
        us = sorted(users, key=lambda u: ((u * 2654435761) % 2**32, u))[:cap]
        us = sorted(us)
        for i, a in enumerate(us):
            for c in us[i + 1 :]:
                w[(a, c)] += 1
    return w


def test_cooccurrence_edges_match_bruteforce(spark):
    got = {
        (r["u"], r["v"]): r["w"]
        for r in registry()["graph_cooccurrence_edges"].fn(spark, SF_DIR).collect()
    }
    assert got == dict(_brute_edges(spark))
    assert all(u < v for (u, v) in got)


def test_tight_cap_variant_is_nested_sample(spark):
    """cap=8 membership per bucket is a prefix of the cap=32 rank order, so
    the tight edge set's weights are pointwise ≤ the family builder's."""
    tight = {
        (r["u"], r["v"]): r["w"]
        for r in registry()["graph_cooccurrence_capped"].fn(spark, SF_DIR).collect()
    }
    assert tight == dict(_brute_edges(spark, cap=_TIGHT_CAP))
    family = dict(_brute_edges(spark))
    assert all(family.get(e, 0) >= w for e, w in tight.items())


def test_degree_profile_matches_edges(spark):
    edges = _brute_edges(spark)
    deg, wdeg = Counter(), Counter()
    for (u, v), w in edges.items():
        deg[u] += 1
        deg[v] += 1
        wdeg[u] += w
        wdeg[v] += w
    got = registry()["graph_degree_profile"].fn(spark, SF_DIR).collect()
    assert {r["user_id"]: r["degree"] for r in got} == dict(deg)
    assert {r["user_id"]: r["weighted_degree"] for r in got} == dict(wdeg)


def test_triangle_count_matches_bruteforce(spark):
    # the op prunes weight-1 noise edges before the cubic statistic
    edges = {e for e, w in _brute_edges(spark).items() if w >= 2}
    nbrs = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    tri = Counter()
    for u, v in edges:
        for c in nbrs[u] & nbrs[v]:
            # count each triangle once at its smallest vertex pair order
            if c > v:
                for node in (u, v, c):
                    tri[node] += 1
    got = {
        r["user_id"]: r["n_triangles"]
        for r in registry()["graph_triangle_count"].fn(spark, SF_DIR).collect()
    }
    assert got == dict(tri)


def test_triangle_plan_has_no_cartesian(spark):
    plan = plan_of(registry()["graph_triangle_count"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_pagerank_matches_integer_bruteforce(spark):
    edges = set(_brute_edges(spark))
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    ranks = {u: 1_000_000 for u in adj}
    for _ in range(3):
        nxt = {v: 150_000 for v in adj}
        for u, outs in adj.items():
            c = (ranks[u] * 85) // (len(outs) * 100)
            for v in outs:
                nxt[v] += c
        ranks = nxt
    got = {
        r["user_id"]: r["rank"]
        for r in registry()["graph_pagerank_fixedpoint"].fn(spark, SF_DIR).collect()
    }
    assert got == ranks


def test_pagerank_rerun_is_byte_identical(spark):
    fn = registry()["graph_pagerank_fixedpoint"].fn
    a = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    b = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    assert a == b


def test_jaccard_graph_degree_bounded_by_k(spark):
    """Mutual top-K sparsification must bound every node's degree by K at
    ANY scale — the property that replaced the fixed weight floor (which
    densified to 4.9e9 wedges at sf1 and OOMed)."""
    from pyspark.sql import functions as F

    from sparkmerge.queries import registry
    from sparkmerge.queries.ext_graph import _KNN_K

    df = registry()["graph_jaccard_neighbors"].fn(spark, "/root/testdata/sf0.01")
    rows = df.collect()
    assert rows
    # common neighbors within the sparsified graph can never exceed K, and
    # the jaccard denominator (du + dv - common) keeps it in (0, 1]
    for r in rows:
        assert 0 < r["common"] <= _KNN_K
        assert 0.0 < r["jaccard"] <= 1.0
