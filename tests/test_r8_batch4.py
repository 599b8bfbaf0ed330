"""Semantic tests for the round-8 batch-4 operators (brute-force Python
ground truth at sf0.001, independent of the DuckDB oracle), plus the
NullAwareAntiJoin plan-shape assertion."""

import math
import re
from collections import Counter, defaultdict

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_01 = "/root/testdata/sf0.01"


# --- graph_component_size_profile --------------------------------------------


def _union_find_sizes(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    comp = Counter(find(n) for n in parent)
    return Counter(comp.values())  # size -> n_components


def test_component_size_profile_matches_union_find(spark):
    # sf0.001's sparse graph is empty (no op rows — exercised below); the
    # histogram semantics are certified at sf0.01 against a Python
    # union-find over the SAME sparsified edge list, independent of the
    # min-label fixed point under test.
    from sparkmerge.queries.ext_graph import _sparse_edges

    edges = [(r["u"], r["v"]) for r in _sparse_edges(spark, SF_DIR_01).collect()]
    assert edges, "sf0.01 sparse graph must be non-empty for this test"
    hist = _union_find_sizes(edges)
    total_nodes = sum(s * c for s, c in hist.items())
    max_size = max(hist)

    out = {
        r["size"]: r
        for r in registry()["graph_component_size_profile"].fn(spark, SF_DIR_01).collect()
    }
    assert set(out) == set(hist)
    for size, r in out.items():
        assert r["n_components"] == hist[size]
        assert r["n_nodes"] == size * hist[size]
        assert r["node_share"] == (size * hist[size]) / total_nodes
        assert r["is_largest"] == (1 if size == max_size else 0)
    assert sum(r["n_nodes"] for r in out.values()) == total_nodes
    assert sum(r["is_largest"] for r in out.values()) == 1


def test_component_size_profile_empty_graph_is_empty_not_error(spark):
    assert registry()["graph_component_size_profile"].fn(spark, SF_DIR).count() == 0


# --- orders_discount_elasticity ----------------------------------------------


def test_discount_elasticity_matches_bruteforce(spark):
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_partkey", "l_discount", "l_quantity")
        .collect()
    )
    brand = {
        r["p_partkey"]: r["p_brand"]
        for r in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    }
    m = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, sx, sy, sxy, sxx
    for r in li:
        x = math.floor(r["l_discount"] * 10000 + 0.5)
        y = math.floor(r["l_quantity"] + 0.5)
        acc = m[brand[r["l_partkey"]]]
        acc[0] += 1
        acc[1] += x
        acc[2] += y
        acc[3] += x * y
        acc[4] += x * x

    out = {
        r["p_brand"]: r
        for r in registry()["orders_discount_elasticity"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(m)
    for b, (n, sx, sy, sxy, sxx) in m.items():
        r = out[b]
        assert (r["n"], r["sx"], r["sy"], r["sxy"], r["sxx"]) == (n, sx, sy, sxy, sxx)
        den = n * sxx - sx * sx
        if den == 0:
            assert r["qty_per_bps"] is None
        else:
            # same fixed association as both engines — bit-identical doubles
            assert r["qty_per_bps"] == (
                (float(n) * float(sxy) - float(sx) * float(sy))
                / (float(n) * float(sxx) - float(sx) * float(sx))
            )


# --- events_dwell_bucket_profile ---------------------------------------------


def _us(td):
    return td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds


def test_dwell_bucket_profile_matches_bruteforce(spark):
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    seqs = defaultdict(list)
    for r in ev:
        seqs[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    agg = defaultdict(lambda: [0, 0, None, None])  # n, total, mn, mx
    type_totals = Counter()
    for items in seqs.values():
        items.sort(key=lambda t: (t[0], t[1]))
        for (t0, _e0, ty), (t1, _e1, _ty1) in zip(items, items[1:]):
            dwell_s = _us(t1 - t0) // 1_000_000
            bucket = dwell_s.bit_length() if dwell_s > 0 else 1  # len(bin(n))
            a = agg[(ty, bucket)]
            a[0] += 1
            a[1] += dwell_s
            a[2] = dwell_s if a[2] is None else min(a[2], dwell_s)
            a[3] = dwell_s if a[3] is None else max(a[3], dwell_s)
            type_totals[ty] += 1

    out = {
        (r["event_type"], r["bucket"]): r
        for r in registry()["events_dwell_bucket_profile"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(agg)
    for key, (n, tot, mn, mx) in agg.items():
        r = out[key]
        assert r["n_gaps"] == n
        assert r["total_dwell_s"] == tot
        assert r["min_dwell_s"] == mn
        assert r["max_dwell_s"] == mx
        assert r["share_of_type"] == n / type_totals[key[0]]
    # every user's last event contributes no gap
    assert sum(r["n_gaps"] for r in out.values()) == len(ev) - len(seqs)


# --- join_anti_null_aware ----------------------------------------------------


def test_anti_null_aware_semantics(spark):
    nat = {
        r["n_nationkey"]: r["n_regionkey"]
        for r in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    }
    reg = {
        r["r_regionkey"]: r["r_name"]
        for r in spark.read.parquet(f"{SF_DIR}/region.parquet").collect()
    }
    excluded = {
        nk for nk, rk in nat.items() if reg[rk] in ("ASIA", "EUROPE")
    }
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    # NOT IN semantics: a NULL left key (nationkey 4) is DROPPED, unlike
    # NOT EXISTS / left_anti which would keep it.
    expect = {
        r["c_custkey"]
        for r in cust
        if r["c_nationkey"] != 4 and r["c_nationkey"] not in excluded
    }
    dropped_nulls = [r for r in cust if r["c_nationkey"] == 4]
    assert dropped_nulls, "corpus must hold nationkey-4 customers for the test to bite"
    assert 4 not in excluded  # outside ASIA/EUROPE — dropped ONLY by the NULL rule

    out = registry()["join_anti_null_aware"].fn(spark, SF_DIR)
    got = {r["c_custkey"] for r in out.collect()}
    assert got == expect
    assert got  # non-vacuous
    assert not any(r["c_custkey"] in got for r in dropped_nulls)


def test_anti_null_aware_plans_null_aware_broadcast_join(spark):
    df = registry()["join_anti_null_aware"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the isNullAwareAntiJoin flag renders as the trailing `true` on the
    # LeftAnti BroadcastHashJoin node — the dedicated NAAJ strategy, not a
    # nested-loop NOT IN expansion
    assert re.search(r"BroadcastHashJoin .*LeftAnti, BuildRight, true", plan), plan
    assert "NestedLoop" not in plan
