"""Semantic tests for the round-6 batch-4 operators (brute-force Python
ground truth at sf0.001, independent of the DuckDB oracle)."""

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def _pruned_edges(spark):
    from sparkmerge.queries.ext_graph import _TRI_MIN_W

    return {
        (r["u"], r["v"])
        for r in registry()["graph_cooccurrence_edges"].fn(spark, SF_DIR).collect()
        if r["w"] >= _TRI_MIN_W
    }


def test_clustering_coefficient_matches_bruteforce(spark):
    edges = _pruned_edges(spark)
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    out = {
        r["user_id"]: r
        for r in registry()["graph_clustering_coefficient"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert set(out) == set(adj)
    for n, nbrs in adj.items():
        tri = sum(
            1
            for a in nbrs
            for b in nbrs
            if a < b and (min(a, b), max(a, b)) in edges
        )
        d = len(nbrs)
        want = 2.0 * tri / (d * (d - 1)) if d >= 2 else 0.0
        assert out[n]["degree"] == d
        assert out[n]["n_triangles"] == tri
        assert out[n]["clustering_coeff"] == want


def _points(spark):
    from sparkmerge.queries.ext_spatial import _GRID, _P

    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("event_id") % 7 == 0)
        .select("event_id", "user_id")
        .collect()
    )
    pts = {}
    for r in rows:
        ek, uk = r["event_id"] % _P, r["user_id"] % _P
        x = ((ek * 2654435761) % 4294967296) % _GRID
        y = (((uk * 40503 + ek) % _P) * 2246822519) % 4294967296 % _GRID
        pts[r["event_id"]] = (x, y)
    return pts


def test_dbscan_labels_match_bruteforce(spark):
    from sparkmerge.queries.ext_spatial import _DB_MINPTS, _RADIUS

    pts = _points(spark)
    nbrs = {
        p: {
            q
            for q, (qx, qy) in pts.items()
            if q != p and max(abs(qx - x), abs(qy - y)) <= _RADIUS
        }
        for p, (x, y) in pts.items()
    }
    core = {p for p, ns in nbrs.items() if len(ns) >= _DB_MINPTS}
    out = {
        r["pid"]: r
        for r in registry()["spatial_dbscan_core"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(pts)
    for p, ns in nbrs.items():
        want = (
            "core"
            if p in core
            else ("border" if ns & core else "noise")
        )
        assert out[p]["n_neighbors"] == len(ns)
        assert out[p]["label"] == want


def test_inter_arrival_matches_bruteforce(spark):
    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    per = defaultdict(list)
    for r in rows:
        per[r["user_id"]].append((r["ts"], r["event_id"]))
    out = {
        r["user_id"]: r
        for r in registry()["events_inter_arrival"].fn(spark, SF_DIR).collect()
    }
    for u, evs in per.items():
        evs.sort()
        gaps = [
            (int(b[0].timestamp() * 1_000_000) - int(a[0].timestamp() * 1_000_000))
            // 1_000_000
            for a, b in zip(evs, evs[1:])
        ]
        if not gaps:
            assert u not in out
            continue
        srt = sorted(gaps)
        n = len(gaps)
        assert out[u]["n_gaps"] == n
        assert out[u]["min_gap_s"] == srt[0]
        assert out[u]["max_gap_s"] == srt[-1]
        assert out[u]["total_gap_s"] == sum(gaps)
        assert out[u]["p90_gap_s"] == srt[(9 * n + 9) // 10 - 1]


def _funnel_anchors(spark):
    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "ts", "event_type")
        .collect()
    )
    per = defaultdict(list)
    for r in rows:
        per[r["user_id"]].append((r["ts"], r["event_type"]))
    anchors = {}
    for u, evs in per.items():
        evs.sort()
        v = c = p = None
        for ts, ty in evs:
            if v is None and ty == "view":
                v = ts
            elif c is None and v is not None and ty == "click" and ts > v:
                c = ts
            elif p is None and c is not None and ty == "purchase" and ts > c:
                p = ts
        anchors[u] = (v, c, p)
    return anchors


def test_funnel_latency_matches_bruteforce(spark):
    anchors = _funnel_anchors(spark)

    def us(ts):
        return int(ts.timestamp() * 1_000_000)

    def stage(gaps):
        srt = sorted(gaps)
        n = len(srt)
        return (
            n,
            srt[(n + 1) // 2 - 1],
            srt[(9 * n + 9) // 10 - 1],
        )

    vc = sorted(
        (us(c) - us(v)) // 1_000_000 for v, c, _ in anchors.values() if c is not None
    )
    cp = sorted(
        (us(p) - us(c)) // 1_000_000 for _, c, p in anchors.values() if p is not None
    )
    out = {
        r["stage"]: r
        for r in registry()["events_funnel_latency"].fn(spark, SF_DIR).collect()
    }
    for name, gaps in (("view_to_click", vc), ("click_to_purchase", cp)):
        n, p50, p90 = stage(gaps)
        assert out[name]["n_users"] == n
        assert out[name]["p50_lat_s"] == p50
        assert out[name]["p90_lat_s"] == p90


def test_hapax_ratio_matches_bruteforce(spark):
    import re

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    out = {
        r["doc_id"]: r
        for r in registry()["text_hapax_ratio"].fn(spark, SF_DIR).collect()
    }
    for r in docs:
        toks = [t for t in re.split(r"\s+", r["text"].lower()) if t != ""]
        if not toks:
            assert r["doc_id"] not in out
            continue
        c = Counter(toks)
        hapax = sum(1 for v in c.values() if v == 1)
        row = out[r["doc_id"]]
        assert row["n_tokens"] == len(toks)
        assert row["n_types"] == len(c)
        assert row["n_hapax"] == hapax
        assert row["hapax_frac"] == hapax / len(c)
        assert row["ttr"] == len(c) / len(toks)


def test_mom_growth_matches_bruteforce(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    nation = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    }
    rev = defaultdict(int)
    for o in orders:
        nk = cust.get(o["o_custkey"])
        if nk is None:
            continue
        month = o["o_orderdate"].strftime("%Y-%m-01")
        rev[(nation[nk], month)] += int(
            math.floor(o["o_totalprice"] * 100.0 + 0.5)
        )
    series = defaultdict(list)
    for (nm, month), cents in rev.items():
        series[nm].append((month, cents))
    want = {}
    for nm, months in series.items():
        months.sort()
        prev = None
        for month, cents in months:
            g = (cents - prev) / prev if prev is not None else None
            want[(nm, month)] = (cents, prev, g)
            prev = cents
    out = registry()["timeseries_mom_growth"].fn(spark, SF_DIR).collect()
    assert len(out) == len(want)
    for r in out:
        cents, prev, g = want[(r["n_name"], r["month"])]
        assert r["revenue_cents"] == cents
        assert r["prev_cents"] == prev
        assert r["mom_growth"] == g
