"""Semantic tests for the round-8 batch-10 operators (brute-force Python
ground truth at sf0.001, independent of the DuckDB oracle)."""

import datetime
import math
from collections import Counter, defaultdict

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def _us(ts):
    d = ts - datetime.datetime(1970, 1, 1)
    return d.days * 86_400_000_000 + d.seconds * 1_000_000 + d.microseconds


# --- events_peak_concentration ------------------------------------------------


def test_peak_concentration_matches_bruteforce(spark):
    hourly = Counter()
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type", "ts"
    ).collect():
        hourly[(r["event_type"], _us(r["ts"]) // 3_600_000_000)] += 1

    by_type = defaultdict(dict)
    for (t, h), c in hourly.items():
        by_type[t][h] = c

    out = {
        r["event_type"]: r
        for r in registry()["events_peak_concentration"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(by_type)
    for t, hours in by_type.items():
        r = out[t]
        n = sum(hours.values())
        peak = max(hours.values())
        peak_hour = min(h for h, c in hours.items() if c == peak)
        assert r["n_events"] == n
        assert r["active_hours"] == len(hours)
        assert r["peak_hour"] == peak_hour
        assert r["peak_count"] == peak
        assert r["peak_share_pm"] == (1000 * peak) // n
        assert r["peak_to_mean"] == (peak * len(hours)) / n


# --- orders_weekday_value_profile ----------------------------------------------


def test_weekday_value_profile_matches_bruteforce(spark):
    agg = defaultdict(lambda: [0, 0])
    for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect():
        wd = ((_us(r["o_orderdate"]) // 86_400_000_000) + 4) % 7
        a = agg[(wd, r["o_orderpriority"])]
        a[0] += 1
        a[1] += math.floor(r["o_totalprice"] * 100.0 + 0.5)
    wd_tot = Counter()
    for (wd, _), (n, _c) in agg.items():
        wd_tot[wd] += n

    out = {
        (r["weekday"], r["priority"]): r
        for r in registry()["orders_weekday_value_profile"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(agg)
    for k, (n, cents) in agg.items():
        r = out[k]
        assert r["n_orders"] == n
        assert r["cents"] == cents
        assert r["share_of_weekday_pm"] == (1000 * n) // wd_tot[k[0]]
    assert {k[0] for k in agg} == set(range(7))  # all weekdays present


# --- supplier_nation_acctbal_profile -------------------------------------------


def test_supplier_nation_acctbal_matches_bruteforce(spark):
    n_name = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    }
    agg = defaultdict(lambda: [0, 0, None, None, 0])
    for r in spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect():
        nat = n_name[r["s_nationkey"]]
        cents = math.floor(r["s_acctbal"] * 100.0 + 0.5)
        a = agg[nat]
        a[0] += 1
        a[1] += cents
        a[2] = cents if a[2] is None else min(a[2], cents)
        a[3] = cents if a[3] is None else max(a[3], cents)
        a[4] += 1 if r["s_acctbal"] < 0 else 0

    out = {
        r["nation"]: r
        for r in registry()["supplier_nation_acctbal_profile"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(agg)
    for nat, (n, tot, mn, mx, neg) in agg.items():
        r = out[nat]
        assert r["n_suppliers"] == n
        assert r["bal_cents"] == tot
        assert r["min_cents"] == mn
        assert r["max_cents"] == mx
        assert r["neg_share_pm"] == (1000 * neg) // n
        assert r["mean_cents"] == tot / n


# --- text_source_length_drift ---------------------------------------------------


def test_source_length_drift_matches_bruteforce(spark):
    by_source = defaultdict(list)
    all_lens = []
    for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "source", "n_chars"
    ).collect():
        by_source[r["source"]].append(r["n_chars"])
        all_lens.append(r["n_chars"])

    def nearest_rank(vals, p):
        vals = sorted(vals)
        idx = (p * len(vals) + 99) // 100
        return vals[idx - 1]

    corpus_p50 = nearest_rank(all_lens, 50)
    out = {
        r["source"]: r
        for r in registry()["text_source_length_drift"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(by_source)
    for src, lens in by_source.items():
        r = out[src]
        assert r["n_docs"] == len(lens)
        assert r["p25_chars"] == nearest_rank(lens, 25)
        assert r["p50_chars"] == nearest_rank(lens, 50)
        assert r["p90_chars"] == nearest_rank(lens, 90)
        assert r["corpus_p50_chars"] == corpus_p50
        assert r["drift_chars"] == r["p50_chars"] - corpus_p50
    # drift must be signed — some sources above, none identical everywhere
    drifts = {r["drift_chars"] for r in out.values()}
    assert len(drifts) > 1
