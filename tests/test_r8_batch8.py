"""Semantic tests for the round-8 batch-8 operators (brute-force Python
ground truth at sf0.001, independent of the DuckDB oracle)."""

import datetime
import re
from collections import Counter, defaultdict
from decimal import Decimal

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def _us(ts):
    d = ts - datetime.datetime(1970, 1, 1)
    return d.days * 86_400_000_000 + d.seconds * 1_000_000 + d.microseconds


# --- orders_nation_trade_matrix -----------------------------------------------


def test_nation_trade_matrix_matches_bruteforce(spark):
    o_cust = {
        r["o_orderkey"]: r["o_custkey"]
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    c_nat = {
        r["c_custkey"]: r["c_nationkey"]
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    s_nat = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect()
    }
    n_name = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    }
    agg = defaultdict(lambda: [0, Decimal(0)])
    for r in (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .collect()
    ):
        sn = n_name[s_nat[r["l_suppkey"]]]
        cn = n_name[c_nat[o_cust[r["l_orderkey"]]]]
        a = agg[(sn, cn)]
        a[0] += 1
        # decimal(18,4) per-row cast of the IEEE product, like both engines
        a[1] += Decimal(
            f"{r['l_extendedprice'] * (1 - r['l_discount']):.4f}"
        )

    out = {
        (r["supp_nation"], r["cust_nation"]): r
        for r in registry()["orders_nation_trade_matrix"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(agg)
    for k, (n, rev) in agg.items():
        assert out[k]["n_lines"] == n
        assert out[k]["revenue"] == float(rev), k


# --- lineitem_discount_tax_grid -----------------------------------------------


def test_discount_tax_grid_matches_bruteforce(spark):
    import math

    agg = defaultdict(lambda: [0, Decimal(0), Decimal(0)])
    for r in (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_extendedprice", "l_discount", "l_tax")
        .collect()
    ):
        d_pm = math.floor(r["l_discount"] * 1000.0 + 0.5)
        t_pm = math.floor(r["l_tax"] * 1000.0 + 0.5)
        a = agg[(d_pm, t_pm)]
        a[0] += 1
        a[1] += Decimal(f"{r['l_extendedprice']:.2f}")
        charge = r["l_extendedprice"] * (1 - r["l_discount"]) * (1 + r["l_tax"])
        a[2] += Decimal(f"{charge:.6f}")

    out = {
        (r["discount_pm"], r["tax_pm"]): r
        for r in registry()["lineitem_discount_tax_grid"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(agg)
    for k, (n, gross, charge) in agg.items():
        assert out[k]["n_lines"] == n
        assert out[k]["gross"] == float(gross), k
        assert out[k]["charge"] == float(charge), k
    # the policy lattice must be 2-D (several discounts x several taxes)
    assert len({k[0] for k in agg}) > 1 and len({k[1] for k in agg}) > 1


# --- events_benford_digit_profile ---------------------------------------------


def test_benford_digit_profile_matches_bruteforce(spark):
    cnt = Counter()
    for r in (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", "props")
        .collect()
    ):
        for num in re.findall(r"[0-9]+", r["props"]):
            sig = num.lstrip("0")
            if sig:
                cnt[(r["event_type"], sig[0])] += 1

    totals = Counter()
    for (t, _), n in cnt.items():
        totals[t] += n

    out = {
        (r["event_type"], r["digit"]): r
        for r in registry()["events_benford_digit_profile"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(cnt)
    for k, n in cnt.items():
        assert out[k]["n"] == n
        assert out[k]["share_pm"] == (1000 * n) // totals[k[0]]
    # non-vacuous: every type contributes numerals
    assert len(totals) == 5


# --- events_burstiness_fano ---------------------------------------------------


def test_burstiness_fano_matches_bruteforce(spark):
    hourly = Counter()
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type", "ts"
    ).collect():
        hourly[(r["event_type"], _us(r["ts"]) // 3_600_000_000)] += 1

    mn = min(h for _, h in hourly)
    mx = max(h for _, h in hourly)
    span = mx - mn + 1
    by_type = defaultdict(list)
    for (t, _), c in hourly.items():
        by_type[t].append(c)

    out = {
        r["event_type"]: r
        for r in registry()["events_burstiness_fano"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(by_type)
    for t, counts in by_type.items():
        r = out[t]
        sc = sum(counts)
        sc2 = sum(c * c for c in counts)
        assert r["n_events"] == sc
        assert r["sum_sq"] == sc2
        assert r["active_hours"] == len(counts)
        assert r["span_hours"] == span
        assert r["fano"] == (span * sc2 - sc * sc) / (span * sc)
        # definition check: matches population var/mean with empty hours
        mean = sc / span
        var = (sc2 - sc * sc / span) / span
        assert abs(r["fano"] - var / mean) < 1e-9
