"""[EXT] round-4 sketch / iterative-ML / scale-pattern operators
(SURVEY.md §2.D-E, r4 batch 3).

Four capabilities a 100 TB engine needs that round 3 didn't yet register:

- ``agg_kmv_distinct`` — K-minimum-values distinct sketches with UNION and
  INTERSECTION estimates across sets.  HLL (agg_hll_native) answers "how
  many distinct"; KMV additionally answers "how much do two populations
  overlap" from the same constant-memory sketch.  All math is exact
  integers until one final division per estimate, so the DuckDB oracle
  replays it bit-exactly.
- ``embedding_kmeans_fixedpoint`` — two full Lloyd iterations of k-means
  over quantized embeddings.  Float centroid updates are order-dependent
  (the reason naive distributed k-means is irreproducible); quantizing
  coordinates to offset integers (×1024, +1024 ≥ 0) makes every distance
  and centroid mean exact integer arithmetic — bit-identical at any
  partitioning, and cross-checked in SQL.
- ``join_hybrid_skew`` — the production skew-join pattern beyond salting
  (join_salted_skew): hot keys (frequency > 1.2× mean, decided in exact
  integer arithmetic) take a broadcast join, the cold tail takes the
  normal shuffle join, results union.  This is what AQE's skew handling
  does at runtime, expressed explicitly so the plan is inspectable.
- ``window_ntile_buckets`` — decile bucketing by document length for
  curriculum/analysis.  The oracle uses native ``ntile(10)``; the engine
  derives the bucket as ``((rn-1)*10) DIV n + 1``, which is provably the
  same partitioning and — unlike a monolithic NTILE — decomposes into
  rank arithmetic that range-partitions at scale.

Not in the reference; test tables cited in each op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from sparkmerge.ext.hashing import mix32, mix32_sql_chain
from sparkmerge.queries import load, register

# --- agg_kmv_distinct ----------------------------------------------------

_K = 64
_M32 = 4294967296
_A, _B = "click", "view"
_EST_NUM = (_K - 1) * _M32  # exact; < 2^38 so double-representable


@register(
    "agg_kmv_distinct",
    oracle=f"""
WITH du AS (
  SELECT DISTINCT event_type, user_id FROM events
),
{mix32_sql_chain('hh', 'du', 'event_type, user_id', 'user_id')},
r AS (
  SELECT event_type, user_id, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h, user_id) AS rn
    FROM hh
),
per_type AS (
  SELECT event_type AS set_id,
         COUNT(*) AS n_exact,
         MAX(CASE WHEN rn <= {_K} THEN h END) AS hk
    FROM r GROUP BY 1
),
t1 AS (
  SELECT set_id, n_exact,
         CASE WHEN n_exact < {_K} THEN CAST(n_exact AS DOUBLE)
              ELSE CAST({_EST_NUM} AS DOUBLE) / CAST(hk AS DOUBLE) END AS est
    FROM per_type
),
au AS (SELECT user_id FROM hh WHERE event_type = '{_A}'),
bu AS (SELECT user_id FROM hh WHERE event_type = '{_B}'),
uu AS (
  SELECT DISTINCT user_id, h FROM hh WHERE event_type IN ('{_A}', '{_B}')
),
ur AS (
  SELECT user_id, h,
         ROW_NUMBER() OVER (ORDER BY h, user_id) AS rn
    FROM uu
),
s AS (
  SELECT ur.user_id, ur.h,
         CASE WHEN ur.user_id IN (SELECT user_id FROM au)
               AND ur.user_id IN (SELECT user_id FROM bu)
              THEN 1 ELSE 0 END AS in_both
    FROM ur WHERE rn <= {_K}
),
ustats AS (
  SELECT (SELECT COUNT(*) FROM uu) AS n_u,
         (SELECT MAX(h) FROM s) AS hk_u,
         (SELECT CAST(SUM(in_both) AS BIGINT) FROM s) AS rho,
         (SELECT COUNT(*) FROM au WHERE user_id IN (SELECT user_id FROM bu))
           AS n_inter
),
t2 AS (
  SELECT '{_A}_OR_{_B}' AS set_id, n_u AS n_exact,
         CASE WHEN n_u < {_K} THEN CAST(n_u AS DOUBLE)
              ELSE CAST({_EST_NUM} AS DOUBLE) / CAST(hk_u AS DOUBLE) END AS est
    FROM ustats
),
t3 AS (
  SELECT '{_A}_AND_{_B}' AS set_id, n_inter AS n_exact,
         CASE WHEN n_u < {_K} THEN CAST(rho AS DOUBLE)
              ELSE CAST(rho * {_EST_NUM} AS DOUBLE)
                   / CAST({_K} * hk_u AS DOUBLE) END AS est
    FROM ustats
)
SELECT * FROM t1 UNION ALL SELECT * FROM t2 UNION ALL SELECT * FROM t3
""",
    description=f"K-minimum-values distinct sketch (k={_K}, portable fmix32 "
    f"hash): per-event-type cardinality estimates PLUS union and "
    f"intersection estimates for the {_A}/{_B} populations — the overlap "
    f"question HLL can't answer; constant memory per set at any scale "
    f"(top-k smallest hashes ride a bounded rank window), estimates are "
    f"exact-integer ratios with ONE final IEEE division (bit-deterministic; "
    f"exact n_exact columns sit alongside for the quality audit); sets "
    f"smaller than k fall back to their exact count",
)
def agg_kmv_distinct(spark, sf_dir):
    du = load(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    # the sketch's whole point is ONE scan of the input: materialize the
    # (much smaller) distinct hash set once, then every per-set / union /
    # intersection branch below reads the checkpoint instead of re-scanning
    # events (the un-checkpointed plan re-scanned the fact table 7x)
    hh = du.select(
        "event_type", "user_id", mix32(F.col("user_id")).alias("h")
    ).localCheckpoint(eager=True)

    est_num = F.lit(float(_EST_NUM))

    # per-type sketches
    w_t = Window.partitionBy("event_type").orderBy("h", "user_id")
    r = hh.withColumn("rn", F.row_number().over(w_t))
    t1 = (
        r.groupBy(F.col("event_type").alias("set_id"))
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.max(F.when(F.col("rn") <= _K, F.col("h"))).alias("hk"),
        )
        .select(
            "set_id",
            "n_exact",
            F.when(F.col("n_exact") < _K, F.col("n_exact").cast("double"))
            .otherwise(est_num / F.col("hk").cast("double"))
            .alias("est"),
        )
    )

    au = hh.filter(F.col("event_type") == _A).select("user_id")
    bu = hh.filter(F.col("event_type") == _B).select("user_id")
    uu = (
        hh.filter(F.col("event_type").isin(_A, _B))
        .select("user_id", "h")
        .distinct()
    )
    ur = uu.withColumn("rn", F.row_number().over(Window.orderBy("h", "user_id")))
    s = (
        ur.filter(F.col("rn") <= _K)
        .join(au.withColumn("_a", F.lit(1)).distinct(), "user_id", "left")
        .join(bu.withColumn("_b", F.lit(1)).distinct(), "user_id", "left")
        .select(
            "h",
            F.when(F.col("_a").isNotNull() & F.col("_b").isNotNull(), 1)
            .otherwise(0)
            .alias("in_both"),
        )
    )
    ustats = (
        s.agg(
            F.max("h").alias("hk_u"),
            F.sum("in_both").cast("long").alias("rho"),
        )
        .crossJoin(uu.agg(F.count(F.lit(1)).alias("n_u")))
        .crossJoin(
            au.join(bu, "user_id", "left_semi")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    )
    t2 = ustats.select(
        F.lit(f"{_A}_OR_{_B}").alias("set_id"),
        F.col("n_u").alias("n_exact"),
        F.when(F.col("n_u") < _K, F.col("n_u").cast("double"))
        .otherwise(est_num / F.col("hk_u").cast("double"))
        .alias("est"),
    )
    t3 = ustats.select(
        F.lit(f"{_A}_AND_{_B}").alias("set_id"),
        F.col("n_inter").alias("n_exact"),
        F.when(F.col("n_u") < _K, F.col("rho").cast("double"))
        .otherwise(
            (F.col("rho") * F.lit(_EST_NUM)).cast("double")
            / (F.lit(_K) * F.col("hk_u")).cast("double")
        )
        .alias("est"),
    )
    return t1.unionByName(t2).unionByName(t3)


# --- embedding_kmeans_fixedpoint ----------------------------------------

_NC = 8  # centroids
_QS = 1024  # quantization scale
_QOFF = 1024  # offset keeps every coordinate >= 0 (embeds are in [-1, 1]),
# so integer division floors identically in Spark (DIV truncates toward
# zero) and DuckDB (// floors) — negative sums would diverge


def _kmeans_sql() -> str:
    parts = [
        f"""qv AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {_QS} + 0.5) AS BIGINT)
                + {_QOFF}) AS q
    FROM embeddings
)""",
        f"""c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, q AS c
    FROM (SELECT vec_id, q FROM qv ORDER BY vec_id LIMIT {_NC})
)""",
    ]
    for rnd in range(3):
        parts.append(f"""a{rnd} AS (
  SELECT vec_id, q, cid,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(generate_series(1, len(q)),
             i -> (q[i] - c[i]) * (q[i] - c[i]))),
           (x, y) -> x + y) AS dist
    FROM qv, c{rnd}
)""")
        parts.append(f"""b{rnd} AS (
  SELECT vec_id, q, cid, dist FROM a{rnd}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
)""")
        if rnd < 2:
            parts.append(f"""u{rnd} AS (
  SELECT cid, q, unnest(generate_series(1, len(q))) AS i FROM b{rnd}
)""")
            parts.append(f"""g{rnd} AS (
  SELECT cid, i, CAST(SUM(q[i]) // COUNT(*) AS BIGINT) AS cv
    FROM u{rnd} GROUP BY 1, 2
)""")
            parts.append(f"""c{rnd + 1} AS (
  SELECT cid, list(cv ORDER BY i) AS c FROM g{rnd} GROUP BY 1
)""")
    return (
        "WITH "
        + ",\n".join(parts)
        + "\nSELECT vec_id, CAST(cid AS INT) AS cluster, dist FROM b2"
    )


@register(
    "embedding_kmeans_fixedpoint",
    oracle=_kmeans_sql(),
    description=f"distributed k-means ({_NC} centroids, 2 full Lloyd "
    f"iterations + final assignment) in fixed-point integer arithmetic: "
    f"coordinates quantize to offset ints (×{_QS}, +{_QOFF} ≥ 0), so every "
    f"distance and centroid mean is exact — bit-reproducible under any "
    f"partitioning, which naive float k-means is not; assignments are a "
    f"broadcast cross-join against the {_NC}-row centroid table + one rank "
    f"window, centroid updates posexplode to (cluster, dim) partial sums — "
    f"all shapes that hold at 100 TB; seeds are the {_NC} smallest vec_ids "
    f"(deterministic, same convention as ann_ivf)",
)
def embedding_kmeans_fixedpoint(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * _QS + 0.5).cast("long") + _QOFF,
    )
    qv = e.select("vec_id", q.alias("q"))

    cents = (
        qv.orderBy("vec_id")
        .limit(_NC)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias("cid"),
            F.col("q").alias("c"),
        )
    )

    def assign(cents: DataFrame) -> DataFrame:
        j = qv.crossJoin(F.broadcast(cents))
        dist = F.aggregate(
            F.zip_with(F.col("q"), F.col("c"), lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        w = Window.partitionBy("vec_id").orderBy("dist", "cid")
        return (
            j.select("vec_id", "q", "cid", dist.alias("dist"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    def update(assigned: DataFrame) -> DataFrame:
        u = assigned.select("cid", F.posexplode("q").alias("i", "qi"))
        g = u.groupBy("cid", "i").agg(
            F.expr("SUM(qi) DIV COUNT(1)").alias("cv")
        )
        return g.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "cv"))),
                lambda s: s.getField("cv"),
            ).alias("c")
        )

    for _ in range(2):
        cents = update(assign(cents))
    final = assign(cents)
    return final.select(
        "vec_id", F.col("cid").cast("int").alias("cluster"), "dist"
    )


# --- join_hybrid_skew ----------------------------------------------------


@register(
    "join_hybrid_skew",
    oracle="""
WITH c AS (
  SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY 1
)
SELECT e.event_id, e.user_id, c.n_events
  FROM events e JOIN c USING (user_id)
""",
    description="hybrid hot/cold skew join (what AQE skew handling does, "
    "made explicit): keys with frequency > 1.2× the mean — decided in "
    "exact integer arithmetic (n·users·5 > events·6), no float threshold — "
    "route to a broadcast join that never shuffles their rows; the cold "
    "tail takes the normal shuffle join; results union.  The oracle is the "
    "plain join: hash match proves the routing loses/duplicates nothing",
)
def join_hybrid_skew(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("event_id", "user_id")
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    totals = c.agg(
        F.sum("n_events").alias("total_events"),
        F.count(F.lit(1)).alias("total_users"),
    )
    hot = (
        c.crossJoin(F.broadcast(totals))
        .filter(
            F.col("n_events") * F.col("total_users") * 5
            > F.col("total_events") * 6
        )
        .select("user_id", "n_events")
    )
    e_hot = ev.join(F.broadcast(hot.select("user_id")), "user_id", "left_semi")
    e_cold = ev.join(F.broadcast(hot.select("user_id")), "user_id", "left_anti")
    c_cold = c.join(F.broadcast(hot.select("user_id")), "user_id", "left_anti")
    hot_side = e_hot.join(F.broadcast(hot), "user_id").select(
        "event_id", "user_id", "n_events"
    )
    cold_side = e_cold.join(c_cold, "user_id").select(
        "event_id", "user_id", "n_events"
    )
    return hot_side.unionByName(cold_side)


# --- window_ntile_buckets ------------------------------------------------


@register(
    "window_ntile_buckets",
    oracle="""
SELECT doc_id, n_chars,
       CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS INT) AS decile
  FROM documents
""",
    description="decile bucketing by document length (curriculum stages / "
    "length analysis): engine computes ((rn-1)*10) DIV n + 1 — provably "
    "identical to NTILE(10) (first n%10 buckets get the extra row) but "
    "decomposed into rank arithmetic, which at scale becomes "
    "range-partitioned row numbering (partition-local rank + cumulative "
    "offsets) instead of a monolithic single-partition NTILE; the oracle "
    "runs native ntile to certify the equivalence",
)
def window_ntile_buckets(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    n = d.agg(F.count(F.lit(1)).alias("n"))
    rn = F.row_number().over(Window.orderBy("n_chars", "doc_id"))
    return (
        d.withColumn("rn", rn)
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "n_chars",
            (F.expr("((rn - 1) * 10) DIV n") + 1).cast("int").alias("decile"),
        )
    )
