"""Semantic tests for the r5 batch-1 operators (ext_stats, ext_spatial,
the graph additions, deletion vectors, nearest as-of).  The driver's DuckDB
hash gate covers value equality; these pin the PROPERTIES the oracles can't
see — plan shape, metamorphic invariants, brute-force equivalence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cube_is_one_expand_one_shuffle(spark):
    df = registry()["agg_rollup_cube"].fn(spark, SF_DIR)
    plan = plan_of(df)
    assert plan.count("Expand") >= 1
    assert plan.replace("BroadcastExchange", "").count("Exchange hashpartitioning") == 1, plan
    # lattice closure: the grand total row equals the sum of the leaf rows
    rows = {(r["status"], r["priority"]): (r["n"], r["cents"]) for r in df.collect()}
    grand = rows[("ALL", "ALL")]
    leaves = [v for (s, p), v in rows.items() if s != "ALL" and p != "ALL"]
    assert grand[0] == sum(n for n, _ in leaves)
    assert grand[1] == sum(c for _, c in leaves)


def test_linear_fit_recovers_exact_line(spark):
    # y = 3x + 7 exactly → slope must be exactly 3.0 (moments are exact ints)
    from sparkmerge.queries.ext_stats import agg_linear_fit  # noqa: F401

    df = spark.createDataFrame(
        [("t", x, 3 * x + 7) for x in range(168)], "event_type string, x long, y long"
    )
    m = df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    d = lambda c: F.col(c).cast("double")
    slope = m.select(
        ((d("n") * d("sxy") - d("sx") * d("sy")) / (d("n") * d("sxx") - d("sx") * d("sx"))).alias("s")
    ).first()["s"]
    assert slope == 3.0


def test_weighted_median_half_mass_property(spark):
    reg = registry()
    med = {r["lang"]: (r["weighted_median_tokens"], r["total_weight"])
           for r in reg["agg_weighted_median"].fn(spark, SF_DIR).collect()}
    from sparkmerge.ext.text import token_count
    from sparkmerge.queries import load

    v = load(spark, SF_DIR, "documents").select(
        "lang", "n_chars", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    for lang, (m, total) in med.items():
        below = v.filter((F.col("lang") == lang) & (F.col("n_tokens") < m)) \
                 .agg(F.sum("n_chars")).first()[0] or 0
        upto = v.filter((F.col("lang") == lang) & (F.col("n_tokens") <= m)) \
                .agg(F.sum("n_chars")).first()[0] or 0
        # weighted-median defining inequalities
        assert 2 * below < total <= 2 * upto


def test_spatial_grid_equals_brute_force(spark):
    from sparkmerge.queries.ext_spatial import _GRID, _P, _RADIUS

    df = registry()["join_spatial_grid"].fn(spark, SF_DIR)
    got = {(r["a_id"], r["b_id"]) for r in df.collect()}
    # brute force over the same derived points
    from sparkmerge.queries import load

    ev = load(spark, SF_DIR, "events").filter(F.col("event_id") % 7 == 0)
    ek, uk = F.col("event_id") % _P, F.col("user_id") % _P
    x = ((ek * 2654435761) % 4294967296) % _GRID
    y = ((((uk * 40503 + ek) % _P) * 2246822519) % 4294967296) % _GRID
    pts = [(r["pid"], r["x"], r["y"]) for r in ev.select(
        F.col("event_id").alias("pid"), x.alias("x"), y.alias("y")).collect()]
    brute = {
        (a[0], b[0])
        for i, a in enumerate(pts) for b in pts[i + 1:]
        if max(abs(a[1] - b[1]), abs(a[2] - b[2])) <= _RADIUS and a[0] != b[0]
    }
    brute = {(min(p), max(p)) for p in brute}
    assert got == brute  # grid decomposition loses and invents nothing


def test_connected_components_labels_are_valid(spark):
    from sparkmerge.ext.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)], "a_id long, b_id long"
    )
    labels = {r["node"]: r["component"] for r in
              connected_components(pairs, max_iters=8).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_deletion_vectors_never_rewrite_data(spark):
    import glob
    import os

    from sparkmerge.queries.ext_warehouse import _ensure_dv_orders

    path = _ensure_dv_orders(spark, SF_DIR)
    files_before = {f: os.path.getmtime(f) for f in glob.glob(f"{path}/data/*.parquet")}
    df = registry()["merge_deletion_vectors"].fn(spark, SF_DIR)
    n = df.count()
    # the DELETE touched no data file (tombstones only)
    files_after = {f: os.path.getmtime(f) for f in glob.glob(f"{path}/data/*.parquet")}
    assert files_before == files_after and files_before
    # survivors = evens minus multiples of 26 (even ∧ %13)
    total = spark.read.parquet(f"{path}/data").count()
    deleted = spark.read.parquet(f"{path}/data").filter(F.col("o_orderkey") % 13 == 0).count()
    assert n == total - deleted


def test_asof_nearest_picks_closer_side(spark):
    rows = [r.asDict() for r in registry()["join_asof_nearest"].fn(spark, SF_DIR).collect()]
    assert rows and all(r["gap_us"] is None or r["gap_us"] >= 0 for r in rows)
    # cross-check a sample against a brute-force nearest computation
    from sparkmerge.queries import load

    orders = load(spark, SF_DIR, "orders").select(
        "o_custkey", F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("t"),
        "o_orderkey").collect()
    by_user: dict[int, list] = {}
    for o in orders:
        by_user.setdefault(o["o_custkey"], []).append((o["t"], o["o_orderkey"]))
    import random

    rnd = random.Random(7)
    for r in rnd.sample(rows, min(50, len(rows))):
        cand = by_user.get(r["user_id"], [])
        if not cand:
            assert r["nearest_orderkey"] is None
            continue
        best_gap = min(abs(t - r["t_us"]) for t, _ in cand)
        assert r["gap_us"] == best_gap
        # tie policy: backward preferred; at the chosen side, max orderkey
        back = [k for t, k in cand if r["t_us"] - t == best_gap and t <= r["t_us"]]
        fwd = [k for t, k in cand if t - r["t_us"] == best_gap and t > r["t_us"]]
        expect = max(back) if back else max(fwd)
        assert r["nearest_orderkey"] == expect


def test_spatial_grid_boundary_cases(spark):
    """Adversarial placements: pairs at EXACTLY the radius, straddling cell
    boundaries, and identical coordinates — the grid decomposition must
    agree with brute force on all of them."""
    from pyspark.sql import functions as F

    from sparkmerge.queries.ext_spatial import _RADIUS

    R = _RADIUS
    pts = [
        (1, 0, 0), (2, R, 0),            # exactly R apart, same/adjacent cell
        (3, R, R), (4, R + 1, R),        # across the cell corner
        (5, 2 * R - 1, 0), (6, 2 * R, 0),  # adjacent cells, distance 1
        (7, 100, 100), (8, 100, 100),    # identical coordinates
        (9, 100 + R + 1, 100),           # just outside the radius of 7/8
        (10, 5, 5),
    ]
    df = spark.createDataFrame(pts, "pid long, x long, y long")
    cx, cy = (F.col("x") / R).cast("long"), (F.col("y") / R).cast("long")
    build = df.select("pid", "x", "y", cx.alias("cx"), cy.alias("cy"))
    offsets = F.expr("sequence(-1, 1)")
    probe = (
        df.select("pid", "x", "y", cx.alias("cx0"), cy.alias("cy0"))
        .withColumn("dx", F.explode(offsets))
        .withColumn("dy", F.explode(offsets))
        .select(
            F.col("pid").alias("b_pid"), F.col("x").alias("bx"), F.col("y").alias("by"),
            (F.col("cx0") + F.col("dx")).alias("cx"), (F.col("cy0") + F.col("dy")).alias("cy"),
        )
    )
    cheb = F.greatest(F.abs(F.col("x") - F.col("bx")), F.abs(F.col("y") - F.col("by")))
    got = {
        (r["a"], r["b"])
        for r in build.join(probe, ["cx", "cy"])
        .filter((F.col("pid") < F.col("b_pid")) & (cheb <= R))
        .select(F.col("pid").alias("a"), F.col("b_pid").alias("b"))
        .dropDuplicates(["a", "b"]).collect()
    }
    brute = {
        (a[0], b[0])
        for i, a in enumerate(pts) for b in pts[i + 1:]
        if max(abs(a[1] - b[1]), abs(a[2] - b[2])) <= R
    }
    assert got == brute
