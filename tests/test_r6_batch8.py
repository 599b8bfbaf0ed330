"""Semantic tests for the round-6 batch-8 operators (brute-force Python
ground truth at sf0.001, independent of the DuckDB oracle)."""

import math
from collections import defaultdict

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def test_column_change_profile_matches_fixture_shape(spark):
    # the orders_delta fixture mutates status and totalprice on even keys
    # of the %97 slice and nothing else; new (%131 + 9e9) keys never match
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    matched = [o for o in orders if o["o_orderkey"] % 97 == 0]
    changed = [o for o in matched if o["o_orderkey"] % 2 == 0]
    out = {
        r["col"]: r
        for r in registry()["merge_column_change_profile"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == {
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    }
    for col in out:
        assert out[col]["n_matched"] == len(matched)
    # 'X' overwrite counts only where the status wasn't already 'X'
    assert out["o_orderstatus"]["n_changed"] == sum(
        1 for o in changed if o["o_orderstatus"] != "X"
    )
    assert out["o_totalprice"]["n_changed"] == len(changed)
    assert out["o_custkey"]["n_changed"] == 0
    assert out["o_orderdate"]["n_changed"] == 0
    assert out["o_orderpriority"]["n_changed"] == 0


def test_abc_xyz_matches_bruteforce(spark):
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_partkey", "l_shipdate", "l_quantity", "l_extendedprice")
        .collect()
    )
    monthly = defaultdict(lambda: [0, 0])
    for r in li:
        m = r["l_shipdate"].strftime("%Y-%m")
        cell = monthly[(r["l_partkey"], m)]
        cell[0] += int(math.floor(r["l_quantity"] * 100.0 + 0.5))
        cell[1] += int(math.floor(r["l_extendedprice"] * 100.0 + 0.5))
    per = defaultdict(lambda: [0, 0, 0, 0])  # n, rev, s1, s2
    for (pk, _), (q, rev) in monthly.items():
        p = per[pk]
        p[0] += 1
        p[1] += rev
        p[2] += q
        p[3] += q * q
    ranked = sorted(per.items(), key=lambda kv: (-kv[1][1], kv[0]))
    total = sum(v[1] for v in per.values())
    out = {
        r["l_partkey"]: r
        for r in registry()["orders_abc_xyz_class"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(per)
    cum = 0
    for pk, (n, rev, s1, s2) in ranked:
        cum += rev
        abc = "A" if 5 * cum <= 4 * total else ("B" if 20 * cum <= 19 * total else "C")
        d = n * s2 - s1 * s1
        if s1 == 0:
            xyz = "Z"
        elif 4 * d < s1 * s1:
            xyz = "X"
        elif d < s1 * s1:
            xyz = "Y"
        else:
            xyz = "Z"
        row = out[pk]
        assert row["abc_class"] == abc, pk
        assert row["xyz_class"] == xyz, pk
        assert row["n_months"] == n
        assert row["revenue_cents"] == rev
        if s1:
            assert row["cv"] == math.sqrt(d) / s1


def test_acf_lags_matches_bruteforce(spark):
    events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", "ts", "value")
        .collect()
    )
    daily = defaultdict(int)
    for r in events:
        daily[(r["event_type"], r["ts"].date())] += int(
            math.floor(r["value"] * 100.0 + 0.5)
        )
    series = defaultdict(list)
    for (ty, d), cents in daily.items():
        series[ty].append((d, cents // 100))
    out = {
        (r["event_type"], r["lag"]): r
        for r in registry()["timeseries_acf_lags"].fn(spark, SF_DIR).collect()
    }
    for ty, pts in series.items():
        pts.sort()
        xs = [x for _, x in pts]
        n = len(xs)
        s1, s2 = sum(xs), sum(x * x for x in xs)
        mu = s1 / n
        for k in (1, 2, 3):
            pk = sum(xs[t] * xs[t - k] for t in range(k, n))
            ak = sum(xs[t] for t in range(k, n))
            bk = sum(xs[t - k] for t in range(k, n))
            nk = max(n - k, 0)
            num = ((pk - mu * ak) - mu * bk) + nk * (mu * mu)
            den = s2 - mu * s1
            row = out[(ty, k)]
            assert row["n_days"] == n
            assert row["n_pairs"] == nk
            if den != 0.0:
                assert row["acf"] == num / den
            else:
                assert row["acf"] is None
