"""Semantic tests for the round-9 batch-1 operators (brute-force Python
ground truth at sf0.001, independent of the DuckDB oracle)."""

import math
import re
from collections import Counter, defaultdict

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


# --- orders_monthly_mix_shift ---------------------------------------------------


def test_monthly_mix_shift_matches_bruteforce(spark):
    rows = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderdate", "o_orderpriority")
        .collect()
    )
    n = Counter(
        (r["o_orderdate"].strftime("%Y-%m-01"), r["o_orderpriority"]) for r in rows
    )
    month_tot = Counter()
    for (m, _), c in n.items():
        month_tot[m] += c
    share = {k: (1000 * c) // month_tot[k[0]] for k, c in n.items()}
    by_prio = defaultdict(list)
    for m, p in n:
        by_prio[p].append(m)
    delta = {}
    for p, months in by_prio.items():
        months.sort()
        for prev, cur in zip([None] + months[:-1], months):
            delta[(cur, p)] = (
                None if prev is None else share[(cur, p)] - share[(prev, p)]
            )

    out = {
        (r["month"], r["priority"]): r
        for r in registry()["orders_monthly_mix_shift"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(n)
    for k in n:
        assert out[k]["n_orders"] == n[k]
        assert out[k]["share_pm"] == share[k]
        assert out[k]["delta_pm"] == delta[k]
    # every priority's FIRST month must carry a NULL delta
    firsts = {(min(ms), p) for p, ms in by_prio.items()}
    assert all(out[k]["delta_pm"] is None for k in firsts)


# --- events_type_cooccurrence_daily ---------------------------------------------


def test_type_cooccurrence_daily_matches_bruteforce(spark):
    pres = set()
    for r in (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_type")
        .collect()
    ):
        pres.add((r["user_id"], r["ts"].date(), r["event_type"]))
    marg = Counter(t for _, _, t in pres)
    buckets = defaultdict(set)
    for u, d, t in pres:
        buckets[(u, d)].add(t)
    n_ab = Counter()
    for types in buckets.values():
        ts = sorted(types)
        for i, a in enumerate(ts):
            for b in ts[i + 1 :]:
                n_ab[(a, b)] += 1

    out = {
        (r["type_a"], r["type_b"]): r
        for r in registry()["events_type_cooccurrence_daily"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(n_ab)
    for (a, b), c in n_ab.items():
        r = out[(a, b)]
        assert r["n_ab"] == c
        assert r["n_a"] == marg[a]
        assert r["n_b"] == marg[b]
        assert r["pm_of_rarer"] == (1000 * c) // min(marg[a], marg[b])


# --- customer_nation_ltv_profile ------------------------------------------------


def test_nation_ltv_profile_matches_bruteforce(spark):
    rev = Counter()
    for r in (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_custkey", "o_totalprice")
        .collect()
    ):
        rev[r["o_custkey"]] += math.floor(r["o_totalprice"] * 100.0 + 0.5)
    nation = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    }
    per_nation = defaultdict(list)
    for r in (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .select("c_custkey", "c_nationkey")
        .collect()
    ):
        per_nation[nation[r["c_nationkey"]]].append(rev.get(r["c_custkey"], 0))

    def nearest_rank_band(cents_list, p):
        bands = sorted(c // 100000 for c in cents_list)
        n = len(bands)
        return bands[(p * n + 99) // 100 - 1]

    out = {
        r["nation"]: r
        for r in registry()["customer_nation_ltv_profile"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(per_nation)
    for nat, cents in per_nation.items():
        r = out[nat]
        assert r["n_customers"] == len(cents)
        for p in (25, 50, 75, 90):
            assert r[f"p{p}_band"] == nearest_rank_band(cents, p)
        assert r["max_band"] == max(c // 100000 for c in cents)
        assert r["mean_cents"] == sum(cents) / len(cents)
    # the base includes zero-order customers: at least one nation's p25
    # band is 0 only if such customers exist — assert the invariant that
    # total customers equals the customer table, not just the buyers
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert sum(r["n_customers"] for r in out.values()) == n_cust


# --- text_source_vocab_overlap --------------------------------------------------


def test_source_vocab_overlap_matches_bruteforce(spark):
    vocab = defaultdict(set)
    for r in (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("source", "text")
        .collect()
    ):
        for tok in re.split(r"\s+", r["text"].lower()):
            if tok:
                vocab[r["source"]].add(tok)

    sources = sorted(vocab)
    expect = {}
    for i, a in enumerate(sources):
        for b in sources[i + 1 :]:
            shared = len(vocab[a] & vocab[b])
            if shared:
                expect[(a, b)] = (shared, len(vocab[a]), len(vocab[b]))

    out = {
        (r["source_a"], r["source_b"]): r
        for r in registry()["text_source_vocab_overlap"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(expect)
    for k, (shared, na, nb) in expect.items():
        r = out[k]
        assert r["n_shared"] == shared
        assert r["n_a"] == na
        assert r["n_b"] == nb
        assert r["jaccard"] == shared / (na + nb - shared)
