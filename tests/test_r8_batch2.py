"""Semantic tests for the round-8 batch-2 operators (brute-force Python
ground truth at sf0.001, independent of the DuckDB oracle)."""

import math
import re
from collections import Counter, defaultdict

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def test_cust_migration_matrix_matches_bruteforce(spark):
    orders = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_custkey", "o_orderdate")
        .collect()
    )
    per = Counter()
    for r in orders:
        per[(r["o_custkey"], r["o_orderdate"].year)] += 1
    tier = {
        k: ("high" if n >= 6 else "mid" if n >= 3 else "low")
        for k, n in per.items()
    }
    maxy = max(y for (_c, y) in per)
    expect = Counter()
    for (c, y), t in tier.items():
        if y >= maxy:
            continue
        expect[(y, t, tier.get((c, y + 1), "churned"))] += 1

    out = registry()["orders_cust_migration_matrix"].fn(spark, SF_DIR).collect()
    got = {(r["y"], r["from_tier"], r["to_tier"]): r["n_customers"] for r in out}
    assert got == dict(expect)
    # every source-year cohort is fully accounted for (no row lost to the
    # left join) and the final partial year is never a source
    assert all(y < maxy for (y, _f, _t) in got)
    per_year_from = Counter()
    for (y, _f, _t), n in got.items():
        per_year_from[y] += n
    for y in per_year_from:
        assert per_year_from[y] == sum(
            1 for (_c, yy) in per if yy == y
        )


def test_fulfillment_latency_matches_bruteforce(spark):
    orders = {
        r["o_orderkey"]: r
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_shipdate")
        .collect()
    )
    gaps = defaultdict(list)
    for r in li:
        o = orders[r["l_orderkey"]]
        gaps[o["o_orderpriority"]].append(
            (r["l_shipdate"].date() - o["o_orderdate"].date()).days
        )

    def nearest_rank(sorted_vals, p):
        n = len(sorted_vals)
        idx = (p * n + 99) // 100  # 1-indexed ceil(n*p/100)
        return sorted_vals[max(idx, 1) - 1]

    out = {
        r["priority"]: r
        for r in registry()["orders_fulfillment_latency"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(gaps)
    for p, vals in gaps.items():
        vals.sort()
        r = out[p]
        assert r["n"] == len(vals)
        assert r["min_days"] == vals[0]
        assert r["max_days"] == vals[-1]
        assert r["p50_days"] == nearest_rank(vals, 50)
        assert r["p90_days"] == nearest_rank(vals, 90)
        assert r["p99_days"] == nearest_rank(vals, 99)
        assert r["mean_days"] == sum(vals) / len(vals)


def test_shingle_novelty_matches_bruteforce(spark):
    docs = sorted(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect(),
        key=lambda r: r["doc_id"],
    )
    ws = re.compile(r"\s+")
    doc_shingles = {}
    first_seen = {}
    for r in docs:
        toks = [t for t in ws.split(r["text"].lower()) if t != ""]
        sh = {
            " ".join(toks[i : i + 5]) for i in range(len(toks) - 4)
        } if len(toks) >= 5 else set()
        doc_shingles[r["doc_id"]] = sh
        for h in sh:
            first_seen.setdefault(h, r["doc_id"])

    out = {
        r["doc_id"]: r
        for r in registry()["text_shingle_novelty_curve"].fn(spark, SF_DIR).collect()
    }
    expect_ids = {d for d, sh in doc_shingles.items() if sh}
    assert set(out) == expect_ids
    for d in expect_ids:
        sh = doc_shingles[d]
        novel = sum(1 for h in sh if first_seen[h] == d)
        r = out[d]
        assert r["n_shingles"] == len(sh)
        assert r["n_novel"] == novel
        assert r["novelty"] == novel / len(sh)
    # the curve property: the first doc is fully novel
    first = min(expect_ids)
    assert out[first]["novelty"] == 1.0


def test_seasonal_mad_outliers_matches_bruteforce(spark):
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "event_type", "ts", "value")
        .collect()
    )
    cells = defaultdict(lambda: [0, 0])  # (type, how) -> [n, sum_cents]
    rows = []
    for r in ev:
        us = int(r["ts"].timestamp() * 1e6) if False else None
        # replicate unix_micros on a NTZ timestamp read back as naive UTC
        import calendar

        us = calendar.timegm(r["ts"].timetuple()) * 1_000_000 + r["ts"].microsecond
        how = (us // 3_600_000_000) % 168
        cents = math.floor(r["value"] * 100.0 + 0.5)
        cells[(r["event_type"], how)][0] += 1
        cells[(r["event_type"], how)][1] += cents
        rows.append((r["event_id"], r["event_type"], how, cents))

    mhat = {
        k: (2 * s + n) // (2 * n) for k, (n, s) in cells.items()
    }

    def med_pick(vals):
        vals = sorted(vals)
        n = len(vals)
        lo, hi = (n + 1) // 2, (n + 2) // 2
        picked = vals[lo - 1 : hi]
        return sum(picked) / len(picked)

    resid = defaultdict(list)
    by_id = {}
    for eid, et, how, cents in rows:
        rres = cents - mhat[(et, how)]
        resid[et].append(rres)
        by_id[eid] = (et, how, rres)
    med = {et: med_pick(v) for et, v in resid.items()}
    mad = {
        et: med_pick([abs(x - med[et]) for x in v]) for et, v in resid.items()
    }

    out = {
        r["event_id"]: r
        for r in registry()["timeseries_seasonal_mad_outliers"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(by_id)
    n_anom = 0
    for eid, (et, how, rres) in by_id.items():
        r = out[eid]
        assert r["how"] == how
        assert r["resid"] == rres
        assert r["med"] == med[et]
        assert r["mad"] == mad[et]
        expect_flag = abs(rres - med[et]) > 3.0 * mad[et]
        assert r["is_anomaly"] == expect_flag
        n_anom += expect_flag
    # robust flags exist but are a minority (at sf0.001 the 168 cells see
    # ~6 events each, so the cell means are noisy and ~20 % gets flagged;
    # the bound only guards against all-or-nothing degeneracy)
    assert 0 < n_anom < len(by_id) * 0.5
