"""Semantic tests for the round-8 batch-1 operators (brute-force Python
ground truth at sf0.001, independent of the DuckDB oracle)."""

import math
import re
from collections import defaultdict
from datetime import date, timedelta

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def _add_months(d: date, months: int) -> date:
    m = d.month - 1 + months
    return date(d.year + m // 12, m % 12 + 1, 1)


def test_seasonal_naive_mase_matches_bruteforce(spark):
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
        .collect()
    )
    brand = {
        r["p_partkey"]: r["p_brand"]
        for r in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    }
    rev = defaultdict(int)
    for r in li:
        mo = r["l_shipdate"].date().replace(day=1)
        cents = math.floor(r["l_extendedprice"] * (1 - r["l_discount"]) * 100.0 + 0.5)
        rev[(brand[r["l_partkey"]], mo)] += cents

    def errors(lag_months):
        n, sae = defaultdict(int), defaultdict(int)
        for (b, mo), v in rev.items():
            prev = rev.get((b, _add_months(mo, -lag_months)))
            if prev is not None:
                n[b] += 1
                sae[b] += abs(v - prev)
        return n, sae

    n_s, sae_s = errors(12)
    n_n, sae_n = errors(1)
    n_months = defaultdict(int)
    for (b, _mo) in rev:
        n_months[b] += 1

    out = {
        r["brand"]: r
        for r in registry()["orders_seasonal_naive_mase"].fn(spark, SF_DIR).collect()
    }
    expect_brands = set(n_s) & set(n_n)
    assert set(out) == expect_brands
    for b, row in out.items():
        assert row["n_months"] == n_months[b]
        assert row["n_seasonal"] == n_s[b]
        assert row["n_naive"] == n_n[b]
        assert row["sae_seasonal_cents"] == sae_s[b]
        assert row["sae_naive_cents"] == sae_n[b]
        if sae_n[b] == 0:
            assert row["mase"] is None
        else:
            assert row["mase"] == (sae_s[b] * n_n[b]) / (sae_n[b] * n_s[b])


def test_seasonal_naive_mase_checkpoint_bounds_scans(spark):
    """The (brand, month) relation feeds five consumers whose downstream
    partitionings differ, so ReuseExchange cannot collapse them — the
    bounded eager checkpoint must leave ZERO fact-table scans in the final
    plan (pre-checkpoint the lineitem scan + broadcast join ran five
    times: 11.8 s → 2.1 s warm at sf1)."""
    plan = (
        registry()["orders_seasonal_naive_mase"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FileScan parquet" not in plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan


def test_link_predict_cn_matches_bruteforce(spark):
    """Rebuild the mutual top-K sparsification + common-neighbor counts in
    pure Python from the RAW capped edge list (graph_cooccurrence_edges,
    the family's shared builder), then compare non-adjacent CN pairs."""
    raw = registry()["graph_cooccurrence_edges"].fn(spark, SF_DIR).collect()
    K = 10
    out_edges = defaultdict(list)
    for r in raw:
        out_edges[r["u"]].append((r["v"], r["w"]))
        out_edges[r["v"]].append((r["u"], r["w"]))
    picked = set()
    for u, nbrs in out_edges.items():
        for v, _w in sorted(nbrs, key=lambda t: (-t[1], t[0]))[:K]:
            picked.add((u, v))
    mutual = {
        (min(u, v), max(u, v))
        for (u, v) in picked
        if (v, u) in picked
    }
    adj = defaultdict(set)
    for u, v in mutual:
        adj[u].add(v)
        adj[v].add(u)
    cn = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if v in adj[u]:
                continue  # adjacent — not a prediction target
            common = len(adj[u] & adj[v])
            if common:
                cn[(u, v)] = common

    out = registry()["graph_link_predict_cn"].fn(spark, SF_DIR).collect()
    got = {(r["u"], r["v"]): r for r in out}
    assert set(got) == set(cn)
    for (u, v), r in got.items():
        assert r["common"] == cn[(u, v)]
        assert r["deg_u"] == len(adj[u])
        assert r["deg_v"] == len(adj[v])
        # prediction targets only: never an existing edge
        assert (u, v) not in mutual


def test_temporal_validity_matches_bruteforce(spark):
    orders = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .collect()
    )
    per_cust = defaultdict(list)
    for r in orders:
        per_cust[r["o_custkey"]].append((r["o_orderkey"], r["o_orderdate"].date()))
    expect = {}
    for ck, rows in per_cust.items():
        for ak, ad in rows:
            a0, a1 = ad, ad + timedelta(days=90)
            for bk, bd in rows:
                if ak == bk:
                    continue
                b0, b1 = bd, bd + timedelta(days=30)
                if a0 < b1 and b0 < a1:
                    overlap = (min(a1, b1) - max(a0, b0)).days
                    expect[(ck, ak, bk)] = (a0.isoformat(), b0.isoformat(), overlap)

    out = registry()["join_temporal_validity"].fn(spark, SF_DIR).collect()
    got = {
        (r["o_custkey"], r["a_orderkey"], r["b_orderkey"]): (
            r["a_start"], r["b_start"], r["overlap_days"],
        )
        for r in out
    }
    assert len(out) == len(got), "binned decomposition emitted duplicates"
    assert got == expect
    assert all(v[2] >= 1 for v in expect.values())


def test_temporal_validity_no_nested_loop(spark):
    """The binned decomposition must plan as an equi-join on (custkey, bin),
    never a nested-loop/cartesian theta join."""
    plan = (
        registry()["join_temporal_validity"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_length_bucket_stats_matches_bruteforce(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    ws = re.compile(r"\s+")
    per = defaultdict(list)
    for r in docs:
        n = len([t for t in ws.split(r["text"]) if t != ""])
        per[(r["source"], n.bit_length() if n > 0 else 1)].append(n)

    out = registry()["pipeline_length_bucket_stats"].fn(spark, SF_DIR).collect()
    got = {(r["source"], r["bucket"]): r for r in out}
    assert set(got) == set(per)
    src_totals = defaultdict(int)
    for (src, _b), ns in per.items():
        src_totals[src] += len(ns)
    for (src, b), ns in per.items():
        r = got[(src, b)]
        assert r["n_docs"] == len(ns)
        assert r["total_tokens"] == sum(ns)
        assert r["min_tokens"] == min(ns)
        assert r["max_tokens"] == max(ns)
        assert r["share_of_source"] == len(ns) / src_totals[src]
        # bucket is the bit length: every count fits [2^(b-1), 2^b)
        for n in ns:
            assert (n.bit_length() if n > 0 else 1) == b
