"""Semantic tests for the round-6 batch-3 operators (brute-force Python
ground truth at sf0.001, independent of the DuckDB oracle)."""

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def _edges_py(spark):
    """Materialize the capped co-occurrence edges (the family builder)."""
    return {
        (r["u"], r["v"]): r["w"]
        for r in registry()["graph_cooccurrence_edges"].fn(spark, SF_DIR).collect()
    }


def test_kcore_peel_matches_bruteforce(spark):
    from sparkmerge.queries.ext_graph import _KCORE_K, _KCORE_ROUNDS, _TRI_MIN_W

    edges = {e for e, w in _edges_py(spark).items() if w >= _TRI_MIN_W}
    for _ in range(_KCORE_ROUNDS):
        deg = Counter()
        for u, v in edges:
            deg[u] += 1
            deg[v] += 1
        keep = {n for n, d in deg.items() if d >= _KCORE_K}
        edges = {(u, v) for u, v in edges if u in keep and v in keep}
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    got = {
        r["user_id"]: r["core_degree"]
        for r in registry()["graph_kcore_peel"].fn(spark, SF_DIR).collect()
    }
    assert got == dict(deg)


def test_kcore_is_subgraph_of_input(spark):
    from sparkmerge.queries.ext_graph import _TRI_MIN_W

    pruned_nodes = set()
    for (u, v), w in _edges_py(spark).items():
        if w >= _TRI_MIN_W:
            pruned_nodes.update((u, v))
    out = registry()["graph_kcore_peel"].fn(spark, SF_DIR).collect()
    assert {r["user_id"] for r in out} <= pruned_nodes


def test_basket_lift_matches_bruteforce(spark):
    rows = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets = defaultdict(set)
    for r in rows:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    item = Counter()
    pair = Counter()
    for parts in baskets.values():
        for p in parts:
            item[p] += 1
        sp = sorted(parts)
        for i, a in enumerate(sp):
            for b in sp[i + 1 :]:
                pair[(a, b)] += 1
    n_orders = len(baskets)
    out = registry()["orders_basket_lift"].fn(spark, SF_DIR).collect()
    expect = {k: c for k, c in pair.items() if c >= 2}
    assert {(r["part_a"], r["part_b"]) for r in out} == set(expect)
    for r in out:
        k = (r["part_a"], r["part_b"])
        assert r["pair_n"] == expect[k]
        assert r["n_a"] == item[r["part_a"]] and r["n_b"] == item[r["part_b"]]
        assert abs(r["confidence"] - r["pair_n"] / r["n_a"]) < 1e-12
        assert (
            abs(r["lift"] - (r["pair_n"] * n_orders) / (r["n_a"] * r["n_b"]))
            < 1e-12
        )
        assert 0.0 < r["confidence"] <= 1.0


def test_rfm_quartiles_and_totals(spark):
    out = registry()["events_rfm_segments"].fn(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert len(out) == ev.select("user_id").distinct().count()
    assert sum(r["freq"] for r in out) == ev.count()
    for r in out:
        assert 1 <= r["r_q"] <= 4 and 1 <= r["f_q"] <= 4 and 1 <= r["m_q"] <= 4
        assert r["segment"] == f"R{r['r_q']}F{r['f_q']}M{r['m_q']}"
        assert r["r_days"] >= 0
    # ntile: the most frequent user must land in f-quartile 1
    top = max(out, key=lambda r: (r["freq"], -r["user_id"]))
    assert top["f_q"] == 1


def test_seasonal_profile_shares_sum_to_one(spark):
    out = registry()["timeseries_seasonal_profile"].fn(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert sum(r["n"] for r in out) == ev.count()
    by_type = defaultdict(float)
    for r in out:
        assert 0 <= r["hour_of_week"] < 168
        by_type[r["event_type"]] += r["share"]
    for t, s in by_type.items():
        assert abs(s - 1.0) < 1e-9, (t, s)


def test_knn_grid_ranks_and_bruteforce(spark):
    from sparkmerge.queries.ext_spatial import (
        _GRID,
        _KNN_CELL,
        _KNN_K,
        _P,
        _Q_MOD,
    )

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
        y = ((((uk * 40503 + ek) % _P) * 2246822519) % 4294967296) % _GRID
        pts[r["event_id"]] = (x, y)
    expect = {}
    for q, (qx, qy) in pts.items():
        if q % _Q_MOD:
            continue
        cand = [
            (max(abs(qx - bx), abs(qy - by)), b)
            for b, (bx, by) in pts.items()
            if b != q
            and abs(qx // _KNN_CELL - bx // _KNN_CELL) <= 1
            and abs(qy // _KNN_CELL - by // _KNN_CELL) <= 1
        ]
        for rn, (d, b) in enumerate(sorted(cand)[:_KNN_K], start=1):
            expect[(q, b)] = (d, rn)
    out = registry()["spatial_knn_grid"].fn(spark, SF_DIR).collect()
    got = {(r["query_id"], r["neighbor_id"]): (r["cheb"], r["rn"]) for r in out}
    assert got == expect


def test_ndcg_curve_bounds_and_monotone_dcg(spark):
    out = sorted(
        registry()["retrieval_ndcg_curve"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in out] == list(range(1, len(out) + 1))
    prev_dcg = prev_idcg = 0
    for r in out:
        assert r["dcg_scaled"] >= prev_dcg and r["idcg_scaled"] >= prev_idcg
        prev_dcg, prev_idcg = r["dcg_scaled"], r["idcg_scaled"]
        assert r["dcg_scaled"] <= r["idcg_scaled"]  # ideal dominates
        assert 0.0 <= r["ndcg"] <= 1.0
        assert 0 <= r["rel"] <= 3


def test_bipartite_projection_matches_bruteforce(spark):
    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    )
    by_user = defaultdict(set)
    for r in rows:
        by_user[r["user_id"]].add(r["event_type"])
    expect = Counter()
    for types in by_user.values():
        st = sorted(types)
        for i, a in enumerate(st):
            for b in st[i + 1 :]:
                expect[(a, b)] += 1
    out = registry()["graph_bipartite_projection"].fn(spark, SF_DIR).collect()
    got = {(r["type_a"], r["type_b"]): r["n_shared_users"] for r in out}
    assert got == dict(expect)


def test_bfs_layers_matches_bruteforce(spark):
    from sparkmerge.queries.ext_graph import _BFS_DEPTH, _BFS_SRC_MOD

    adj = defaultdict(set)
    for (u, v) in _edges_py(spark):
        adj[u].add(v)
        adj[v].add(u)
    frontier = {n for n in adj if n % _BFS_SRC_MOD == 0}
    expect = {n: 0 for n in frontier}
    for depth in range(1, _BFS_DEPTH + 1):
        nxt = set()
        for n in frontier:
            nxt |= adj[n]
        nxt -= expect.keys()
        for n in nxt:
            expect[n] = depth
        frontier = nxt
    out = registry()["graph_bfs_layers"].fn(spark, SF_DIR).collect()
    got = {r["user_id"]: r["layer"] for r in out}
    assert got == expect
    assert len(out) == len(got)  # layers disjoint — no node emitted twice


def test_streak_longest_matches_bruteforce(spark):
    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts")
        .collect()
    )
    by_user = defaultdict(set)
    for r in rows:
        epoch_us = int(r["ts"].timestamp() * 1_000_000)
        by_user[r["user_id"]].add(epoch_us // 86_400_000_000)
    out = registry()["window_streak_longest"].fn(spark, SF_DIR).collect()
    assert {r["user_id"] for r in out} == set(by_user)
    for r in out:
        days = sorted(by_user[r["user_id"]])
        runs, cur = [], 1
        for a, b in zip(days, days[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        assert r["longest_streak_days"] == max(runs)
        assert r["n_streaks"] == len(runs)
        assert r["active_days"] == len(days)
