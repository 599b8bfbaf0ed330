"""[EXT] round-4 time-series operators (SURVEY.md §2.D, r4 batch 2).

Regular-grid resampling with forward fill, gaps-and-islands run detection,
and lag-chain exponential smoothing over the ``events`` table — the
standard shapes for turning an irregular event stream into model-ready
series features.

Not in the reference (no temporal layer); design rules as elsewhere in the
registry:

- ``timeseries_resample_ffill`` is the union+carry-forward formulation
  (same single-shuffle pattern as ``join_asof``): grid markers and
  observations union into one stream, one window pass carries the last
  observation forward — one shuffle regardless of grid density, versus the
  per-grid-point probe a correlated subquery would cost.  The DuckDB
  oracle uses native ASOF JOIN — different strategy, same rows.
- ``events_ewma_lagchain`` keeps the smoothing *bit-deterministic*: a
  4-tap kernel with power-of-two weights (8, 4, 2, 1) means every product
  is an exact exponent shift, the three additions have a fixed
  parenthesized association, and the single /15.0 is one correctly-rounded
  IEEE op — so Spark and DuckDB agree to the last bit without any float
  tolerance, at any partitioning.
- ties are impossible by construction: observations pre-aggregate to one
  row per (user_id, ts), and window orders always extend with event_id.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from sparkmerge.queries import load, register


def _us(col):
    """Exact epoch microseconds.  The corpus timestamps are TIMESTAMP_NTZ;
    unix_micros needs TIMESTAMP, and the ntz->tz cast applies the session
    offset — safe here because every use is a DIFFERENCE of two casts, so
    the offset cancels exactly (integer arithmetic)."""
    return F.unix_micros(col.cast("timestamp"))



@register(
    "timeseries_resample_ffill",
    oracle="""
WITH obs AS (
  SELECT user_id, ts, max(value) AS v FROM events GROUP BY 1, 2
),
span AS (
  SELECT user_id,
         date_trunc('hour', min(ts)) AS mn,
         date_trunc('hour', max(ts)) AS mx
    FROM obs GROUP BY 1
),
grid AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour_ts
    FROM span
)
SELECT g.user_id, g.hour_ts, o.v AS value_ffill
  FROM grid g
  ASOF LEFT JOIN obs o
    ON g.user_id = o.user_id AND g.hour_ts >= o.ts
""",
    description="irregular events -> hourly grid with forward fill, via "
    "union+carry-forward: per-user grid ticks union with observations, one "
    "window pass (order ts, ties grid-after-obs) carries last value — ONE "
    "shuffle total at any grid density; oracle is DuckDB's native ASOF "
    "JOIN, a different physical strategy agreeing on every row; the first "
    "tick of a series (before its first observation) is NULL on both sides",
)
def timeseries_resample_ffill(spark, sf_dir):
    obs = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("v"))
    )
    span = obs.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("mn"),
        F.date_trunc("hour", F.max("ts")).alias("mx"),
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence(F.col("mn"), F.col("mx"), F.expr("INTERVAL 1 HOUR"))
        ).alias("ts"),
    )
    both = obs.select(
        "user_id", "ts", "v", F.lit(0).alias("is_grid")
    ).unionByName(
        grid.select(
            "user_id", "ts", F.lit(None).cast("double").alias("v"),
            F.lit(1).alias("is_grid"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        both.withColumn("value_ffill", F.last("v", ignorenulls=True).over(w))
        .filter(F.col("is_grid") == 1)
        .select("user_id", F.col("ts").alias("hour_ts"), "value_ffill")
    )


@register(
    "events_gap_islands",
    oracle="""
WITH s AS (
  SELECT user_id, event_type, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS grp
    FROM events
)
SELECT user_id, event_type,
       min(ts) AS island_start, max(ts) AS island_end,
       COUNT(*) AS n_events
  FROM s GROUP BY user_id, event_type, grp
""",
    description="gaps-and-islands: maximal runs of consecutive same-type "
    "events per user via the row_number-difference trick (two window "
    "passes sharing ONE user-partitioned shuffle, then an agg on the same "
    "keys); run ordering is total (ts, event_id) so islands are "
    "deterministic under timestamp ties",
)
def events_gap_islands(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    s = e.select(
        "user_id",
        "event_type",
        "ts",
        (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias("grp"),
    )
    return s.groupBy("user_id", "event_type", "grp").agg(
        F.min("ts").alias("island_start"),
        F.max("ts").alias("island_end"),
        F.count(F.lit(1)).alias("n_events"),
    ).drop("grp")


@register(
    "events_ewma_lagchain",
    oracle="""
WITH l AS (
  SELECT user_id, event_id, ts, value,
         COALESCE(lag(value, 1) OVER w, 0.0) AS l1,
         COALESCE(lag(value, 2) OVER w, 0.0) AS l2,
         COALESCE(lag(value, 3) OVER w, 0.0) AS l3
    FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id, ts, value,
       ((((value * 8.0) + (l1 * 4.0)) + (l2 * 2.0)) + l3) / 15.0 AS ewma
  FROM l
""",
    description="4-tap exponential smoothing per user series; power-of-two "
    "weights (8/4/2/1) make every product an exact exponent shift, the "
    "additions carry a fixed association, and the /15.0 is one "
    "correctly-rounded IEEE division — bit-identical across engines and "
    "partitionings with no float tolerance; missing lags at series start "
    "coalesce to 0 (documented cold-start bias); one window shuffle",
)
def events_ewma_lagchain(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    l = e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.coalesce(F.lag("value", 1).over(w), F.lit(0.0)).alias("l1"),
        F.coalesce(F.lag("value", 2).over(w), F.lit(0.0)).alias("l2"),
        F.coalesce(F.lag("value", 3).over(w), F.lit(0.0)).alias("l3"),
    )
    ewma = (
        (((F.col("value") * 8.0) + (F.col("l1") * 4.0)) + (F.col("l2") * 2.0))
        + F.col("l3")
    ) / 15.0
    return l.select("user_id", "event_id", "ts", "value", ewma.alias("ewma"))


_ATTR_WINDOW_H = 72  # attribution lookback


@register(
    "events_attribution_lasttouch",
    oracle=f"""
WITH c AS (
  SELECT user_id, ts, event_id, event_type,
         last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
           OVER w AS c_ts,
         last_value(CASE WHEN event_type = 'click' THEN event_id END
                    IGNORE NULLS) OVER w AS c_id
    FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, ts,
       CASE WHEN c_ts >= ts - INTERVAL {_ATTR_WINDOW_H} HOURS
            THEN c_id END AS click_event_id,
       CASE WHEN c_ts >= ts - INTERVAL {_ATTR_WINDOW_H} HOURS
            THEN epoch_us(ts) - epoch_us(c_ts) END AS gap_us
  FROM c WHERE event_type = 'purchase'
""",
    description=f"last-touch conversion attribution: each purchase credits "
    f"the user's most recent strictly-preceding click within "
    f"{_ATTR_WINDOW_H} h (else unattributed NULL); the carry-forward window "
    f"(frame ends 1 PRECEDING — a same-instant click never self-attributes) "
    f"is ONE user-keyed shuffle at any history length, vs the per-purchase "
    f"probe a correlated subquery would cost; the gap rides as exact "
    f"epoch-microsecond integers",
)
def events_attribution_lasttouch(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_click = F.col("event_type") == "click"
    c = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.last(F.when(is_click, F.col("ts")), ignorenulls=True).over(w).alias("c_ts"),
        F.last(F.when(is_click, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("c_id"),
    )
    in_window = F.col("c_ts") >= F.col("ts") - F.expr(
        f"INTERVAL {_ATTR_WINDOW_H} HOURS"
    )
    return c.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.when(in_window, F.col("c_id")).alias("click_event_id"),
        F.when(
            in_window, _us(F.col("ts")) - _us(F.col("c_ts"))
        ).alias("gap_us"),
    )


@register(
    "timeseries_interpolate_linear",
    oracle="""
WITH obs AS (
  SELECT user_id, ts, max(value) AS v FROM events GROUP BY 1, 2
),
span AS (
  SELECT user_id,
         date_trunc('hour', min(ts)) AS mn,
         date_trunc('hour', max(ts)) AS mx
    FROM obs GROUP BY 1
),
grid AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour_ts
    FROM span
),
fw AS (
  SELECT g.user_id, g.hour_ts, o.v AS pv, o.ts AS pts
    FROM grid g
    ASOF LEFT JOIN obs o ON g.user_id = o.user_id AND g.hour_ts >= o.ts
),
bw AS (
  SELECT g.user_id, g.hour_ts, o.v AS nv, o.ts AS nts
    FROM grid g
    ASOF LEFT JOIN obs o ON g.user_id = o.user_id AND g.hour_ts < o.ts
)
SELECT f.user_id, f.hour_ts,
       CASE WHEN f.pts IS NULL THEN b.nv
            WHEN b.nts IS NULL THEN f.pv
            ELSE f.pv + ((b.nv - f.pv)
                 * (CAST(epoch_us(f.hour_ts) - epoch_us(f.pts) AS DOUBLE)
                    / CAST(epoch_us(b.nts) - epoch_us(f.pts) AS DOUBLE)))
       END AS value_interp
  FROM fw f JOIN bw b ON f.user_id = b.user_id AND f.hour_ts = b.hour_ts
""",
    description="hourly grid with LINEAR interpolation (the gap-fill "
    "complement of timeseries_resample_ffill): one union+window pass "
    "carries the last observation forward AND the next observation "
    "backward — still ONE shuffle; the blend is a fixed expression tree "
    "(exact epoch-µs integers, one division, one multiply, one add), so "
    "both engines produce bit-identical doubles; series edges extrapolate "
    "flat from the nearest observation",
)
def timeseries_interpolate_linear(spark, sf_dir):
    obs = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("v"))
    )
    span = obs.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("mn"),
        F.date_trunc("hour", F.max("ts")).alias("mx"),
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence(F.col("mn"), F.col("mx"), F.expr("INTERVAL 1 HOUR"))
        ).alias("ts"),
    )
    both = obs.select(
        "user_id", "ts", "v", F.lit(0).alias("is_grid")
    ).unionByName(
        grid.select(
            "user_id", "ts", F.lit(None).cast("double").alias("v"),
            F.lit(1).alias("is_grid"),
        )
    )
    base = Window.partitionBy("user_id").orderBy("ts", "is_grid")
    w_fw = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_bw = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_ts = F.when(F.col("v").isNotNull(), F.col("ts"))
    g = (
        both.withColumn("pv", F.last("v", ignorenulls=True).over(w_fw))
        .withColumn("pts", F.last(obs_ts, ignorenulls=True).over(w_fw))
        .withColumn("nv", F.first("v", ignorenulls=True).over(w_bw))
        .withColumn("nts", F.first(obs_ts, ignorenulls=True).over(w_bw))
        .filter(F.col("is_grid") == 1)
    )
    # match the oracle's association exactly: pv + ((nv - pv) * (Δg / Δobs))
    blend = F.col("pv") + (
        (F.col("nv") - F.col("pv"))
        * (
            (_us(F.col("ts")) - _us(F.col("pts"))).cast(
                "double"
            )
            / (_us(F.col("nts")) - _us(F.col("pts"))).cast(
                "double"
            )
        )
    )
    interp = (
        F.when(F.col("pts").isNull(), F.col("nv"))
        .when(F.col("nts").isNull(), F.col("pv"))
        .otherwise(blend)
    )
    return g.select(
        "user_id", F.col("ts").alias("hour_ts"), interp.alias("value_interp")
    )


# --- timeseries_seasonal_profile -----------------------------------------


@register(
    "timeseries_seasonal_profile",
    oracle="""
WITH h AS (
  SELECT event_type,
         CAST((epoch_us(ts) // 3600000000) % 168 AS BIGINT) AS hour_of_week,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
    FROM events GROUP BY 1, 2
)
SELECT event_type, hour_of_week, n, cents,
       CAST(n AS DOUBLE)
       / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE) AS share
  FROM h
""",
    description="seasonal (hour-of-week) activity profile per event type: "
    "count + exact integer-cents value per (type, how) cell, and each "
    "cell's share of its type's total volume as ONE IEEE division of two "
    "exact int64 sums (type total via a partition window over the already-"
    "aggregated 168-cell table — no second scan); ONE map-side-combined "
    "agg shuffle on (type, how), output bounded at |types| × 168",
)
def timeseries_seasonal_profile(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    how = (F.expr("unix_seconds(CAST(ts AS TIMESTAMP)) div 3600") % 168).alias(
        "hour_of_week"
    )
    h = e.groupBy("event_type", how).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long")).alias("cents"),
    )
    total = F.sum("n").over(Window.partitionBy("event_type"))
    return h.select(
        "event_type",
        "hour_of_week",
        "n",
        "cents",
        (F.col("n").cast("double") / total.cast("double")).alias("share"),
    )


# --- window_streak_longest -----------------------------------------------


@register(
    "window_streak_longest",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
    FROM events
),
isl AS (
  SELECT user_id, d,
         d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
    FROM days
),
runs AS (
  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS run_len
    FROM isl GROUP BY 1, 2
)
SELECT user_id,
       max(run_len) AS longest_streak_days,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(sum(run_len) AS BIGINT) AS active_days
  FROM runs GROUP BY 1
""",
    description="longest consecutive-day activity streak per user (the "
    "engagement/retention statistic): gaps-and-islands via the classic "
    "d − row_number() island key — distinct active days (one user-keyed "
    "shuffle), island id map-side from one rank window on the SAME key, "
    "then two same-key aggs; everything after the first shuffle is "
    "partition-local (no re-Exchange: all windows/aggs share the user_id "
    "partitioning)",
)
def window_streak_longest(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    days = e.select(
        "user_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").alias("d"),
    ).distinct()
    grp = F.col("d") - F.row_number().over(
        Window.partitionBy("user_id").orderBy("d")
    )
    runs = (
        days.withColumn("grp", grp)
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return runs.groupBy("user_id").agg(
        F.max("run_len").alias("longest_streak_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum("run_len").alias("active_days"),
    )


# --- events_inter_arrival (r6) ---------------------------------------------


@register(
    "events_inter_arrival",
    oracle="""
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
    FROM events
),
gaps AS (SELECT user_id, gap_us // 1000000 AS gap_s FROM g WHERE gap_us IS NOT NULL)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(min(gap_s) AS BIGINT) AS min_gap_s,
       CAST(max(gap_s) AS BIGINT) AS max_gap_s,
       CAST(sum(gap_s) AS BIGINT) AS total_gap_s,
       CAST(list_sort(list(gap_s))[CAST((9 * count(*) + 9) // 10 AS BIGINT)]
            AS BIGINT) AS p90_gap_s
  FROM gaps GROUP BY 1
""",
    description="per-user inter-arrival gap profile (the activity-cadence "
    "feature behind churn/anomaly models): consecutive-event gaps via ONE "
    "lag window ordered by (ts, event_id) — total order, engine-portable "
    "— then min/max/sum/count plus a nearest-rank p90 picked from the "
    "per-user sorted gap array at index ceil(0.9n) = (9n+9) DIV 10 (exact "
    "integer index into exact integer seconds — no interpolated-percentile "
    "FP hazard); the window and the aggregation share the user_id hash "
    "partitioning, so everything after the single shuffle is partition-"
    "local; per-user state is bounded by per-user activity (same envelope "
    "as events_top_paths)",
)
def events_inter_arrival(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = _us(F.col("ts"))
    gaps = (
        e.select("user_id", "ts", "event_id")
        .withColumn("gap_us", us - F.lag(us).over(w))
        .filter(F.col("gap_us").isNotNull())
        .select("user_id", F.expr("gap_us div 1000000").alias("gap_s"))
    )
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_s").alias("min_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
        F.sum("gap_s").alias("total_gap_s"),
        F.sort_array(F.collect_list("gap_s")).alias("sorted_gaps"),
    )
    idx = F.expr("(9 * n_gaps + 9) div 10")  # integer div — never FP floor
    return agg.select(
        "user_id",
        "n_gaps",
        "min_gap_s",
        "max_gap_s",
        "total_gap_s",
        F.element_at("sorted_gaps", idx.cast("int")).alias("p90_gap_s"),
    )


# --- timeseries_mom_growth (r6) ---------------------------------------------


@register(
    "timeseries_mom_growth",
    oracle="""
WITH m AS (
  SELECT n.n_name,
         date_trunc('month', o.o_orderdate) AS month,
         CAST(SUM(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS revenue_cents
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
   GROUP BY 1, 2
)
SELECT n_name, strftime(month, '%Y-%m-%d') AS month, revenue_cents,
       lag(revenue_cents) OVER (PARTITION BY n_name ORDER BY month)
         AS prev_cents,
       CASE WHEN lag(revenue_cents) OVER (PARTITION BY n_name ORDER BY month)
                 IS NOT NULL
            THEN CAST(revenue_cents
                      - lag(revenue_cents) OVER (PARTITION BY n_name
                                                 ORDER BY month) AS DOUBLE)
                 / CAST(lag(revenue_cents) OVER (PARTITION BY n_name
                                                 ORDER BY month) AS DOUBLE)
            END AS mom_growth
  FROM m
""",
    description="month-over-month revenue growth per nation (the period-"
    "over-period KPI shape): orders→customer hash join + broadcast nation "
    "dim, revenue in exact integer cents (floor(x*100+0.5) — the "
    "registry's money idiom), ONE monthly agg shuffle, then lag + growth "
    "from a window that reuses the nation partitioning; growth is ONE "
    "division of exact integers (NULL for each nation's first month), so "
    "the double is engine-portable; month rendered as VARCHAR on both "
    "sides (DATE/TIMESTAMP canon forms differ across engines)",
)
def timeseries_mom_growth(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    m = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            "n_name", F.date_trunc("month", F.col("o_orderdate")).alias("month")
        )
        .agg(F.sum(cents).alias("revenue_cents"))
    )
    w = Window.partitionBy("n_name").orderBy("month")
    prev = F.lag("revenue_cents").over(w)
    return m.select(
        "n_name",
        F.date_format("month", "yyyy-MM-dd").alias("month"),
        "revenue_cents",
        prev.alias("prev_cents"),
        F.when(
            prev.isNotNull(),
            (F.col("revenue_cents") - prev).cast("double") / prev.cast("double"),
        ).alias("mom_growth"),
    )


# --- events_user_cadence_cv (r7b2) -------------------------------------------
#
# Per-user activity-cadence regularity — the bot / scheduled-job detector:
# a coefficient of variation of the inter-arrival gaps near 0 means
# clockwork automation, ≫1 means bursty human traffic.  ONE user-keyed
# shuffle shared by the lag window and the aggregation; variance comes
# from exact int64 moment sums (n·Σg² − (Σg)², the agg_variance_exact
# recipe) and the regular/bursty/mixed boundaries compare by integer
# cross-multiplication (CV < 1/2 ⇔ 4·var_num < s1², CV > 2 ⇔ var_num >
# 4·s1²), so both engines classify identically.  Overflow bound: Σgaps
# telescopes to (last − first) ≤ corpus span (~2.6e6 s), so s1² ≤ span²
# ≈ 7e12 is always safe; n·s2 is bounded by n_gaps·span², which stays
# below 2^63 while per-user event counts stay under ~1.3e6.  That holds
# on this corpus at every SF because user_id is strided per replica
# (per-user counts do NOT grow with SF) — a feed whose per-user event
# counts DO scale uses the pre-scaled-DIV moment recipe, IMPLEMENTED
# below as ``gap_unit_s`` (r8 verdict ask #7 — the hatch is code now,
# not narration): gaps integer-DIV into coarser units BEFORE the moment
# sums, shrinking n·s2's bound by unit² (gap_unit_s=60 buys 3600×
# headroom → safe past 4e9 events/user).  CV is dimensionless, so the
# published cv_scaled/class agree with the exact path up to gap
# quantization (±unit/mean_gap relative error — agreement measured in
# tests/test_r9_levers.py); s1/s2 are then in UNITS, documented, and the
# default gap_unit_s=1 stays the exact oracle surface.


@register(
    "events_user_cadence_cv",
    oracle="""
WITH g AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS gap_s
    FROM events
),
m AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(gap_s) AS BIGINT) AS s1,
         CAST(sum(gap_s * gap_s) AS BIGINT) AS s2
    FROM g WHERE gap_s IS NOT NULL GROUP BY user_id
  HAVING count(*) >= 2
)
SELECT user_id, n_gaps, s1, s2,
       CASE WHEN s1 = 0 THEN NULL
            ELSE sqrt(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE))
                 / CAST(s1 AS DOUBLE) END AS cv_scaled,
       CASE WHEN s1 = 0 THEN 'degenerate'
            WHEN 4 * (n_gaps * s2 - s1 * s1) < s1 * s1 THEN 'regular'
            WHEN n_gaps * s2 - s1 * s1 > 4 * (s1 * s1) THEN 'bursty'
            ELSE 'mixed' END AS cadence_class
  FROM m
""",
    description="per-user cadence regularity (bot / scheduled-job "
    "detector): inter-arrival gap seconds from ONE lag window ordered by "
    "(ts, event_id), exact int64 moment sums (n, Σg, Σg²) sharing the "
    "same user partitioning — one shuffle total; CV published as one "
    "fixed-association sqrt/divide and the regular(<0.5)/bursty(>2) "
    "class boundaries decided by integer cross-multiplication (no FP "
    "threshold hazard); Σgaps telescopes to the user's active span so "
    "every moment stays far below 2^63 at any SF; gap_unit_s is the "
    "REGISTERED overflow hatch for feeds whose per-user counts scale "
    "(pre-scaled DIV on the gap moments — unit² more headroom, CV "
    "agreement measured in tests)",
)
def events_user_cadence_cv(spark, sf_dir, gap_unit_s=1):
    if gap_unit_s < 1:
        raise ValueError(f"gap_unit_s must be >= 1, got {gap_unit_s!r}")
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    g = (
        e.select("user_id", "ts", "event_id")
        .withColumn("gap_us", us - F.lag(us).over(w))
        .filter(F.col("gap_us").isNotNull())
        # pre-scaled DIV (the overflow hatch): quantize BEFORE momenting so
        # s2's n·span² bound shrinks by gap_unit_s²; default 1 = exact path
        .select(
            "user_id",
            F.expr(f"gap_us div {1_000_000 * int(gap_unit_s)}").alias("gap_s"),
        )
    )
    m = (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap_s").alias("s1"),
            F.sum(F.col("gap_s") * F.col("gap_s")).alias("s2"),
        )
        .filter(F.col("n_gaps") >= 2)
    )
    var_num = F.col("n_gaps") * F.col("s2") - F.col("s1") * F.col("s1")
    cv = F.when(F.col("s1") == 0, F.lit(None).cast("double")).otherwise(
        F.sqrt(var_num.cast("double")) / F.col("s1").cast("double")
    )
    klass = (
        F.when(F.col("s1") == 0, F.lit("degenerate"))
        .when(F.lit(4) * var_num < F.col("s1") * F.col("s1"), F.lit("regular"))
        .when(var_num > F.lit(4) * F.col("s1") * F.col("s1"), F.lit("bursty"))
        .otherwise(F.lit("mixed"))
    )
    return m.select(
        "user_id", "n_gaps", "s1", "s2",
        cv.alias("cv_scaled"), klass.alias("cadence_class"),
    )


# --- window_calendar_densify (r7b2) ------------------------------------------
#
# Gapless reporting calendar — the densification every BI/forecast table
# needs: emit one row per (event_type, day) for EVERY day in the type's
# [min, max] active range, zero-filled where no events landed.  The
# missing days come from a map-side sequence-explode of the per-type date
# range (bounded by |types| × calendar — NEVER a cross join against a
# global calendar table) left-joined against the per-day aggregate; both
# engines build the identical day list with date-increment sequences.


@register(
    "window_calendar_densify",
    oracle="""
WITH per AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
    FROM events GROUP BY 1, 2
),
spans AS (
  SELECT event_type, min(d) AS d0, max(d) AS d1 FROM per GROUP BY 1
),
cal AS (
  SELECT event_type, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS d
    FROM spans
)
SELECT c.event_type, CAST(c.d AS VARCHAR) AS d,
       coalesce(p.n, 0) AS n,
       coalesce(p.cents, 0) AS cents,
       (p.n IS NULL) AS is_gap
  FROM cal c LEFT JOIN per p ON p.event_type = c.event_type AND p.d = c.d
""",
    description="gapless reporting calendar per event type: per-(type, day) "
    "aggregate (ONE map-side-combined shuffle over raw events), per-type "
    "min/max span over that bounded relation, map-side sequence-explode of "
    "each type's day range (bounded by |types| × calendar — never a cross "
    "join against a global calendar), LEFT JOIN back zero-filling gap "
    "days; everything after the first shuffle is day-domain-sized at any "
    "corpus scale; exact integers throughout",
)
def window_calendar_densify(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    per = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long")).alias("cents"),
    )
    spans = per.groupBy("event_type").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    cal = spans.select(
        "event_type",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("d"),
    )
    return (
        cal.join(per, ["event_type", "d"], "left")
        .select(
            "event_type",
            F.col("d").cast("string").alias("d"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.coalesce(F.col("cents"), F.lit(0)).alias("cents"),
            F.col("n").isNull().alias("is_gap"),
        )
    )


# --- orders_seasonal_naive_mase (r8) -----------------------------------------
#
# Forecast-accuracy evaluation of the seasonal-naive baseline (ŷ_m =
# y_{m−12}, "same month last year") per part brand — the demand-planning
# question "does this brand's revenue have exploitable yearly structure,
# or is last month already the best predictor?".  MASE (mean absolute
# scaled error, Hyndman & Koehler 2006) scales the seasonal-naive MAE by
# the one-step-naive MAE, so MASE < 1 means the seasonal forecast beats
# carrying last month forward.
#
# Determinism: monthly revenue is an EXACT int64 cents sum (per-row
# floor(x·100+0.5), the house recipe), absolute errors and their sums are
# exact integers, and MASE is ONE IEEE division of two cross-multiplied
# exact integers ((sae_s·n_n) / (sae_n·n_s)) — no FP accumulation, no mean
# of means.  Lags are CALENDAR joins on add_months(month, −12/−1), not
# row-offset lag windows, so a brand with a missing month never silently
# pairs the wrong months.
#
# Scale (100 TB): the only data-sized work is ONE map-side-combined
# (brand, month) aggregation over lineitem (part joined by broadcast —
# the dim is tiny); everything downstream runs on the |brands| × |months|
# relation (25 × ~80 here, still only ~10^5 ish for a real catalog), so
# the lag joins and final rollup are driver-trivial at any corpus size.
# Overflow: sae ≤ Σ|rev| ≈ total corpus cents (~2e13 at sf10); the
# cross-multiply by n ≤ 10^2 months keeps products ≪ 2^63.


@register(
    "orders_seasonal_naive_mase",
    oracle="""
WITH m AS (
  SELECT p_brand AS brand,
         date_trunc('month', CAST(l_shipdate AS DATE)) AS mo,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                       AS BIGINT)) AS BIGINT) AS rev
    FROM lineitem JOIN part ON l_partkey = p_partkey
   GROUP BY 1, 2
),
s AS (
  SELECT a.brand,
         CAST(count(*) AS BIGINT) AS n_seasonal,
         CAST(sum(abs(a.rev - b.rev)) AS BIGINT) AS sae_seasonal_cents
    FROM m a JOIN m b
      ON a.brand = b.brand
     AND b.mo = CAST(a.mo - INTERVAL 12 MONTH AS DATE)
   GROUP BY 1
),
n AS (
  SELECT a.brand,
         CAST(count(*) AS BIGINT) AS n_naive,
         CAST(sum(abs(a.rev - b.rev)) AS BIGINT) AS sae_naive_cents
    FROM m a JOIN m b
      ON a.brand = b.brand
     AND b.mo = CAST(a.mo - INTERVAL 1 MONTH AS DATE)
   GROUP BY 1
),
t AS (SELECT brand, CAST(count(*) AS BIGINT) AS n_months FROM m GROUP BY 1)
SELECT t.brand, t.n_months, s.n_seasonal, n.n_naive,
       s.sae_seasonal_cents, n.sae_naive_cents,
       CASE WHEN n.sae_naive_cents = 0 THEN NULL
            ELSE CAST(s.sae_seasonal_cents * n.n_naive AS DOUBLE)
                 / CAST(n.sae_naive_cents * s.n_seasonal AS DOUBLE) END AS mase
  FROM t
  JOIN s ON s.brand = t.brand
  JOIN n ON n.brand = t.brand
""",
    description="seasonal-naive forecast evaluation per part brand: monthly "
    "revenue as EXACT int64 cents, seasonal (m−12) and one-step (m−1) "
    "absolute errors via calendar add_months joins (gap-proof, never "
    "row-offset lag), MASE = ONE IEEE division of cross-multiplied exact "
    "integers; ONE map-side-combined (brand, month) agg over lineitem with "
    "the part dim broadcast — everything downstream is |brands|×|months|-"
    "sized at any corpus scale",
)
def orders_seasonal_naive_mase(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0 + 0.5
    ).cast("long")
    # The (brand, month) relation feeds FIVE consumers (t, both sides of
    # each lag join) whose downstream partitionings differ — ReuseExchange
    # cannot collapse them, so without the checkpoint the lineitem scan +
    # broadcast join + agg runs five times (measured 11.8 s → 2.1 s warm
    # at sf1).  The relation is BOUNDED (|brands| is catalog-fixed,
    # |months| calendar-fixed — ~2,000 rows at any corpus size), so the
    # eager checkpoint is the sanctioned kind.
    m = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.trunc(F.col("l_shipdate").cast("date"), "month").alias("mo"),
        )
        .agg(F.sum(cents).alias("rev"))
        .localCheckpoint(eager=True)
    )

    def lag_errors(months: int, n_name: str, sae_name: str):
        # r12 (guide §3.1 — pick the join strategy deliberately): m is
        # |brands|×|months|-bounded (~2,000 rows at ANY corpus size —
        # catalog × calendar), so the lag self-join is a broadcast hash
        # join by construction, never a sort-merge Exchange pair.
        a, b = m.alias("a"), m.alias("b")
        return (
            a.join(
                F.broadcast(b),
                (F.col("a.brand") == F.col("b.brand"))
                & (F.col("b.mo") == F.add_months(F.col("a.mo"), -months)),
            )
            .groupBy(F.col("a.brand").alias("brand"))
            .agg(
                F.count(F.lit(1)).alias(n_name),
                F.sum(F.abs(F.col("a.rev") - F.col("b.rev"))).alias(sae_name),
            )
        )

    s = lag_errors(12, "n_seasonal", "sae_seasonal_cents")
    n = lag_errors(1, "n_naive", "sae_naive_cents")
    t = m.groupBy("brand").agg(F.count(F.lit(1)).alias("n_months"))
    mase = F.when(F.col("sae_naive_cents") == 0, F.lit(None).cast("double")).otherwise(
        (F.col("sae_seasonal_cents") * F.col("n_naive")).cast("double")
        / (F.col("sae_naive_cents") * F.col("n_seasonal")).cast("double")
    )
    return (
        t.join(F.broadcast(s), "brand")
        .join(F.broadcast(n), "brand")
        .select(
            "brand", "n_months", "n_seasonal", "n_naive",
            "sae_seasonal_cents", "sae_naive_cents", mase.alias("mase"),
        )
    )


# --- events_dwell_bucket_profile (r8b4) --------------------------------------
#
# Dwell-time distribution per event type on power-of-two second buckets —
# the engagement-depth table: after a user fires an event of type X, how
# long until their NEXT action?  Short dwells after 'error' events mean
# rage-retries; long dwells after 'view' mean reading.  The dwell is the
# forward gap (lead over the per-user timeline), attributed to the type
# of the event it FOLLOWS; each user's last event has no forward gap and
# is excluded on both sides.
#
# Bucket = bit length of the dwell seconds, rendered portably as
# length(bin(n)) — the binary-string trick from pipeline_length_bucket_
# stats; no log2() (not bit-portable) anywhere.  share_of_type is ONE
# IEEE division of two exact integer counts.
#
# Scale: ONE user-keyed window shuffle builds the gaps, then ONE
# map-side-combined (type, bucket) aggregation; the share window runs on
# the |types| × ≤64-bucket output relation — nothing downstream of the
# second shuffle is corpus-sized.


@register(
    "events_dwell_bucket_profile",
    oracle="""
WITH g AS (
  SELECT event_type,
         (lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          - epoch_us(ts)) // 1000000 AS dwell_s
    FROM events
),
b AS (
  SELECT event_type,
         CAST(length(bin(dwell_s)) AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(dwell_s) AS BIGINT) AS total_dwell_s,
         CAST(min(dwell_s) AS BIGINT) AS min_dwell_s,
         CAST(max(dwell_s) AS BIGINT) AS max_dwell_s
    FROM g WHERE dwell_s IS NOT NULL GROUP BY 1, 2
)
SELECT event_type, bucket, n_gaps, total_dwell_s, min_dwell_s, max_dwell_s,
       CAST(n_gaps AS DOUBLE)
         / CAST(sum(n_gaps) OVER (PARTITION BY event_type) AS DOUBLE)
         AS share_of_type
  FROM b
""",
    description="engagement-depth table: forward inter-event dwell seconds "
    "(lead over the per-user (ts, event_id) timeline, attributed to the "
    "event the gap follows) bucketed on powers of two via the portable "
    "length(bin(n)) bit-length render — no log2 anywhere; count, total/"
    "min/max dwell and share-of-type per bucket, the share ONE IEEE "
    "division of exact counts; ONE user-keyed window shuffle + ONE "
    "map-side-combined (type, bucket) agg, share window on the "
    "|types|×≤64 output relation",
)
def events_dwell_bucket_profile(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    g = (
        e.select("user_id", "event_type", "ts", "event_id")
        .withColumn("dwell_us", F.lead(us).over(w) - us)
        .filter(F.col("dwell_us").isNotNull())
        .select("event_type", F.expr("dwell_us div 1000000").alias("dwell_s"))
    )
    b = g.groupBy(
        "event_type",
        F.length(F.bin(F.col("dwell_s"))).cast("long").alias("bucket"),
    ).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("dwell_s").alias("total_dwell_s"),
        F.min("dwell_s").alias("min_dwell_s"),
        F.max("dwell_s").alias("max_dwell_s"),
    )
    share = F.col("n_gaps").cast("double") / F.sum("n_gaps").over(
        Window.partitionBy("event_type")
    ).cast("double")
    return b.select(
        "event_type", "bucket", "n_gaps", "total_dwell_s", "min_dwell_s",
        "max_dwell_s", share.alias("share_of_type"),
    )


# --- events_weekday_hour_heatmap (r8b5) --------------------------------------
#
# Activity heatmap cells (weekday × hour × type) with per-cell distinct
# users and share-of-type — the bounded-domain (7·24·|types|) reporting
# surface behind every ops dashboard.  Weekday is computed PORTABLY as
# pure integer arithmetic on the epoch day ((days + 4) % 7: 1970-01-01
# was a Thursday, so 0 = Sunday) — never the engines' dayofweek(),
# whose 0/1-based and Sunday/Monday-start conventions differ.
#
# Scale: ONE map-side-combined (type, dow, hod) shuffle carrying the
# distinct-user partial; the distinct pairs per cell are bounded by the
# user population, and the share window runs on the ≤168·|types| output
# relation.  No window over the raw events anywhere.


@register(
    "events_weekday_hour_heatmap",
    oracle="""
WITH c AS (
  SELECT event_type,
         CAST(((epoch_us(ts) // 86400000000) + 4) % 7 AS BIGINT) AS dow,
         CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hod,
         user_id
    FROM events
),
g AS (
  SELECT event_type, dow, hod,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM c GROUP BY 1, 2, 3
)
SELECT event_type, dow, hod, n_events, n_users,
       CAST(n_events AS DOUBLE)
         / CAST(sum(n_events) OVER (PARTITION BY event_type) AS DOUBLE)
         AS share_of_type
  FROM g
""",
    description="ops-dashboard heatmap: (weekday × hour × type) cells with "
    "event counts, distinct users and share-of-type; weekday via portable "
    "integer epoch-day arithmetic ((days+4)%7, 0=Sunday) — never the "
    "engines' divergent dayofweek() conventions; ONE map-side-combined "
    "cell agg with the distinct-user partial, share window on the "
    "≤168·|types| output relation",
)
def events_weekday_hour_heatmap(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    c = e.select(
        "event_type",
        F.expr(
            "(unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000 + 4) % 7"
        ).alias("dow"),
        F.expr(
            "(unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000) % 24"
        ).alias("hod"),
        "user_id",
    )
    g = c.groupBy("event_type", "dow", "hod").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    )
    share = F.col("n_events").cast("double") / F.sum("n_events").over(
        Window.partitionBy("event_type")
    ).cast("double")
    return g.select(
        "event_type", "dow", "hod", "n_events", "n_users",
        share.alias("share_of_type"),
    )


# --- window_first_last_touch (r8b5) ------------------------------------------
#
# First- and last-touch extraction per user — the attribution table's
# bookends: which event type opened the relationship, which one is the
# latest state, and how long the span is.  Complements
# events_attribution_lasttouch (per-purchase click credit inside a
# window) with the per-user lifetime view.  Both extrema are selected
# by the (ts, event_id) STRUCT key, so same-instant ties resolve by id
# — a total order, deterministic on any engine/partitioning (the
# fn_agg_argminmax discipline).  Timestamps publish as exact epoch
# micros (BIGINT), span as integer seconds — no timestamp rendering
# divergence.
#
# Scale: ONE map-side-combined user-keyed aggregation (min/max + the
# struct-keyed min_by/max_by partials all combine associatively);
# DuckDB 1.0's arg_min takes no struct ordering key, so the oracle
# certifies via the two-pass extremum join (min ts per user, then
# min id among ties).


@register(
    "window_first_last_touch",
    oracle="""
WITH b AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
    FROM events
),
s AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         CAST(min(us) AS BIGINT) AS first_us,
         CAST(max(us) AS BIGINT) AS last_us
    FROM b GROUP BY 1
),
fid AS (
  SELECT b.user_id, min(b.event_id) AS fi
    FROM b JOIN s ON s.user_id = b.user_id AND b.us = s.first_us GROUP BY 1
),
lid AS (
  SELECT b.user_id, max(b.event_id) AS li
    FROM b JOIN s ON s.user_id = b.user_id AND b.us = s.last_us GROUP BY 1
)
SELECT s.user_id, s.n_events, s.first_us, s.last_us,
       CAST((s.last_us - s.first_us) // 1000000 AS BIGINT) AS span_s,
       fb.event_type AS first_type, fb.cents AS first_cents,
       lb.event_type AS last_type, lb.cents AS last_cents
  FROM s
  JOIN fid ON fid.user_id = s.user_id
  JOIN lid ON lid.user_id = s.user_id
  JOIN b fb ON fb.user_id = s.user_id AND fb.event_id = fid.fi
  JOIN b lb ON lb.user_id = s.user_id AND lb.event_id = lid.li
""",
    description="per-user first/last-touch bookends: opening and latest "
    "event (type + value cents) with lifetime span, extrema selected by "
    "the (ts, event_id) struct key so ties resolve deterministically "
    "(fn_agg_argminmax discipline); ONE map-side-combined user agg via "
    "struct-keyed min_by/max_by — the oracle certifies with the two-pass "
    "extremum join DuckDB's struct-less arg_min requires; timestamps as "
    "exact epoch-micro BIGINTs, span in integer seconds",
)
def window_first_last_touch(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    b = e.select(
        "user_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("us"),
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    key = F.struct(F.col("us"), F.col("event_id"))
    payload = F.struct(F.col("event_type"), F.col("cents"))
    g = b.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("first_us"),
        F.max("us").alias("last_us"),
        F.min_by(payload, key).alias("fi"),
        F.max_by(payload, key).alias("la"),
    )
    return g.select(
        "user_id", "n_events", "first_us", "last_us",
        F.expr("(last_us - first_us) div 1000000").alias("span_s"),
        F.col("fi.event_type").alias("first_type"),
        F.col("fi.cents").alias("first_cents"),
        F.col("la.event_type").alias("last_type"),
        F.col("la.cents").alias("last_cents"),
    )


# --- events_session_duration_profile (r8b5/b6) -------------------------------
#
# Per-user session KPIs under a 30-minute inactivity cut — the
# engagement summary every product dashboard leads with: how many
# sessions, how long, how dense.  Sessionization is the gap-islands
# recipe (events_gap_islands' discipline) promoted to a user KPI: a
# session break is a NULL or >30-min lag gap, the session id is the
# running count of breaks, and every per-session and per-user rollup
# reuses the SAME user-keyed partitioning — the lag window, the
# (user, session) agg, and the user agg plan ZERO additional exchanges
# (hash(user_id) satisfies the clustered distribution of both
# downstream groupings).  Durations ride exact epoch-micro integers;
# mean duration is ONE IEEE division of exact integers.
#
# Scale: one user-keyed shuffle total, at any history length; the
# per-session relation is bounded by the event count and collapses
# map-side within partitions.

_SESSION_GAP_US = 30 * 60 * 1_000_000


@register(
    "events_session_duration_profile",
    oracle=f"""
WITH g AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   <= {_SESSION_GAP_US} THEN 0 ELSE 1 END AS brk
    FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, us,
         sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
    FROM g
),
per_session AS (
  SELECT user_id, sid,
         CAST(count(*) AS BIGINT) AS n_ev,
         CAST(max(us) - min(us) AS BIGINT) AS dur_us
    FROM s GROUP BY 1, 2
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(n_ev) AS BIGINT) AS n_events,
       CAST(sum(dur_us) // 1000000 AS BIGINT) AS total_duration_s,
       CAST(max(dur_us) // 1000000 AS BIGINT) AS longest_session_s,
       CAST(max(n_ev) AS BIGINT) AS max_session_events,
       CAST(sum(dur_us) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0
         AS mean_session_duration_s
  FROM per_session GROUP BY user_id
""",
    description="per-user session KPIs under a 30-min inactivity cut: "
    "session count, events, total/longest duration, densest session, mean "
    "duration — the gap-islands recipe promoted to an engagement summary; "
    "ONE user-keyed shuffle total (lag window, running break-count, "
    "(user, session) agg and user rollup all reuse hash(user_id) — zero "
    "additional exchanges), exact epoch-micro integers with ONE IEEE "
    "division chain for the mean",
)
def events_session_duration_profile(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    g = e.select("user_id", "ts", "event_id", us.alias("us")).withColumn(
        "brk",
        F.when(
            F.col("us") - F.lag("us").over(w) <= _SESSION_GAP_US, F.lit(0)
        ).otherwise(F.lit(1)),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = g.withColumn("sid", F.sum("brk").over(ws))
    per_session = s.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_ev"),
        (F.max("us") - F.min("us")).alias("dur_us"),
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_ev").alias("n_events"),
        F.expr("sum(dur_us) div 1000000").alias("total_duration_s"),
        F.expr("max(dur_us) div 1000000").alias("longest_session_s"),
        F.max("n_ev").alias("max_session_events"),
        (
            F.sum("dur_us").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1000000.0)
        ).alias("mean_session_duration_s"),
    )


# --- events_burstiness_fano (r8b8) --------------------------------------------
#
# Per-type traffic burstiness via the Fano factor (variance-to-mean ratio
# of hourly arrival counts over the FULL observed span, empty hours
# included): ~1 means Poisson-like arrivals, >1 means bursty, <1 means
# pacemaker-regular — the load-model selector read before capacity
# planning.  Two bounded shuffles: (type, hour) counts (map-side
# combined), then per-type exact moments (Σc, Σc², active hours, min/max
# hour).  Empty hours never materialize: with Z empty hours contributing
# 0 to both Σc and Σc², the population variance over H = span hours is
# algebraically (H·Σc² − (Σc)²)/H², so Fano = (H·Σc² − (Σc)²)/(H·Σc) —
# three exact int64 terms (H·Σc² ≲ 8e13 at sf10 — exact in int64 AND
# double) in ONE fixed IEEE division.  The global span comes from a
# window max/min over the |types|-row frame — no second scan, no
# checkpoint.


@register(
    "events_burstiness_fano",
    oracle="""
WITH hourly AS (
  SELECT event_type,
         epoch_us(ts) // 3600000000 AS h,
         CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
t AS (
  SELECT event_type,
         CAST(sum(c) AS BIGINT) AS n_events,
         CAST(sum(c * c) AS BIGINT) AS sum_sq,
         CAST(count(*) AS BIGINT) AS active_hours,
         CAST(min(h) AS BIGINT) AS mn,
         CAST(max(h) AS BIGINT) AS mx
    FROM hourly GROUP BY 1
),
s AS (
  SELECT event_type, n_events, sum_sq, active_hours,
         CAST(max(mx) OVER () - min(mn) OVER () + 1 AS BIGINT) AS span_hours
    FROM t
)
SELECT event_type, n_events, active_hours, span_hours, sum_sq,
       CAST(span_hours * sum_sq - n_events * n_events AS DOUBLE)
       / CAST(span_hours * n_events AS DOUBLE) AS fano
  FROM s
""",
    description="per-type Fano factor (variance/mean of hourly counts over "
    "the full span, empty hours included algebraically — they never "
    "materialize): (type, hour) counts + per-type exact int64 moments in "
    "two bounded map-side-combined shuffles, global span via a window "
    "max/min over the |types| frame (no second scan), Fano = ONE fixed "
    "IEEE division of exact integers",
)
def events_burstiness_fano(spark, sf_dir):
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000").alias("h"),
    )
    hourly = e.groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("c"))
    t = hourly.groupBy("event_type").agg(
        F.sum("c").alias("n_events"),
        F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
        F.count(F.lit(1)).alias("active_hours"),
        F.min("h").alias("mn"),
        F.max("h").alias("mx"),
    )
    w = Window.partitionBy()
    s = t.select(
        "event_type",
        "n_events",
        "sum_sq",
        "active_hours",
        (F.max("mx").over(w) - F.min("mn").over(w) + 1).alias("span_hours"),
    )
    fano = (
        F.col("span_hours") * F.col("sum_sq")
        - F.col("n_events") * F.col("n_events")
    ).cast("double") / (F.col("span_hours") * F.col("n_events")).cast("double")
    return s.select(
        "event_type", "n_events", "active_hours", "span_hours", "sum_sq",
        fano.alias("fano"),
    )


# --- events_peak_concentration (r8b10) ----------------------------------------
#
# Per-type peak-hour concentration — the capacity-planning complement of
# the Fano factor off the SAME bounded (type, hour) relation: which hour
# carries the most traffic, what share of the type's events it holds
# (exact per-mille), and the peak-to-mean ratio over active hours.  The
# arg-max hour uses the two-pass extremum discipline (min hour among the
# max-count ties — DuckDB's arg_max takes no struct ordering key), here
# as ONE window max + conditional min so no join-back is needed.  Two
# bounded map-side-combined shuffles; ratios are single IEEE divisions
# of exact int64 terms.


@register(
    "events_peak_concentration",
    oracle="""
WITH hourly AS (
  SELECT event_type,
         epoch_us(ts) // 3600000000 AS h,
         CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, h, c,
         max(c) OVER (PARTITION BY event_type) AS maxc
    FROM hourly
)
SELECT event_type,
       CAST(sum(c) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS active_hours,
       CAST(min(CASE WHEN c = maxc THEN h END) AS BIGINT) AS peak_hour,
       CAST(max(c) AS BIGINT) AS peak_count,
       CAST((1000 * max(c)) // sum(c) AS BIGINT) AS peak_share_pm,
       CAST(max(c) * count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
         AS peak_to_mean
  FROM w GROUP BY event_type
""",
    description="per-type peak-hour concentration off the bounded "
    "(type, hour) relation: peak hour via the two-pass extremum "
    "discipline (window max + conditional min — deterministic under "
    "count ties), exact per-mille peak share, peak-to-mean over active "
    "hours as ONE IEEE division; two bounded map-side-combined shuffles",
)
def events_peak_concentration(spark, sf_dir):
    from pyspark.sql import Window as _W

    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000").alias("h"),
    )
    hourly = e.groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("c"))
    w = hourly.select(
        "event_type", "h", "c",
        F.max("c").over(_W.partitionBy("event_type")).alias("maxc"),
    )
    return w.groupBy("event_type").agg(
        F.sum("c").alias("n_events"),
        F.count(F.lit(1)).alias("active_hours"),
        F.min(F.when(F.col("c") == F.col("maxc"), F.col("h"))).alias("peak_hour"),
        F.max("c").alias("peak_count"),
        F.expr("(1000 * max(c)) div sum(c)").alias("peak_share_pm"),
        (
            (F.max("c") * F.count(F.lit(1))).cast("double")
            / F.sum("c").cast("double")
        ).alias("peak_to_mean"),
    )
