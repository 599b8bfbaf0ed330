"""[EXT] temporal joins (as-of, range) — time-series surface beyond the
reference (SURVEY.md §2.C notes their absence in SimpleMerge).

Determinism: the as-of right side is pre-deduped to one row per
(key, time) — as-of over duplicate timestamps is undefined in any engine —
so DuckDB's native ASOF JOIN and the union+window formulation agree
exactly.  The range join compares integer microseconds on both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkmerge.ext.temporal import asof_join, range_join_binned
from sparkmerge.queries import load, register


@register(
    "join_asof",
    oracle="""
WITH r AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS last_orderkey
    FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, e.ts, o.last_orderkey
  FROM events e ASOF LEFT JOIN r o
    ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
    description="as-of join: latest order at-or-before each event, via the "
    "union + partitioned-window carry-forward (ONE shuffle total — never a "
    "nested-loop theta join); the (key,time) dedup that the oracle's GROUP "
    "BY performs rides the window's sort via right_dups='max' instead of "
    "spending a second Exchange; oracle is DuckDB's native ASOF JOIN",
)
def join_asof(spark, sf_dir):
    events = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", F.col("o_orderkey").alias("last_orderkey")
    )
    return asof_join(
        events,
        orders,
        key=("user_id", "o_custkey"),
        time=("ts", "o_orderdate"),
        right_payload=["last_orderkey"],
        right_dups="max",
    )


@register(
    "join_range_binned",
    oracle="""
WITH e AS (SELECT event_id, user_id, ts FROM events WHERE user_id % 10 = 0)
SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
  FROM e a JOIN e b ON a.user_id = b.user_id
 WHERE (epoch_us(b.ts) - epoch_us(a.ts) > 0
        OR (epoch_us(b.ts) = epoch_us(a.ts) AND a.event_id < b.event_id))
   AND epoch_us(b.ts) - epoch_us(a.ts) <= 3600000000
""",
    description="range join (event pairs per user within 1 hour) via interval "
    "binning: equi-join on (key, time bin) + exact post-filter — bounded "
    "shuffle instead of an inequality nested loop",
)
def join_range_binned(spark, sf_dir):
    e = load(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    return range_join_binned(
        e, key="user_id", time="ts", id_col="event_id", max_gap_us=3_600_000_000
    )


@register(
    "join_interval_overlap",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > 1800 THEN 1 ELSE 0 END AS new_session
    FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM flagged
),
spans AS (
  SELECT user_id, session_id, min(ts) AS s_start, max(ts) AS s_end
    FROM sessions GROUP BY user_id, session_id
),
incidents AS (
  SELECT DISTINCT time_bucket(INTERVAL '1 hour', ts) AS i_start,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL 2 HOUR AS i_end
    FROM events
   WHERE hour(time_bucket(INTERVAL '1 hour', ts)) % 6 = 0
)
SELECT s.user_id, s.session_id, s.s_start, i.i_start,
       epoch_us(least(s.s_end, i.i_end)) - epoch_us(greatest(s.s_start, i.i_start))
         AS overlap_us
  FROM spans s JOIN incidents i
    ON s.s_start < i.i_end AND i.i_start < s.s_end
""",
    description="interval-overlap join (sessions x 2-hour incident windows, "
    "half-open semantics) via hour binning: each interval explodes into its "
    "covered hour bins, pairs equi-join on the bin and dedupe, the exact "
    "overlap predicate filters — bounded shuffle instead of the theta "
    "nested-loop the oracle runs; overlap length in exact integer microseconds",
)
def join_interval_overlap(spark, sf_dir):
    from sparkmerge.ext.streaming import session_windows

    e = load(spark, sf_dir, "events")
    spans = session_windows(e, gap_minutes=30).select(
        "user_id", "session_id",
        F.col("session_start").alias("s_start"),
        F.col("session_end").alias("s_end"),
    )
    hour = F.date_trunc("hour", F.col("ts"))
    incidents = (
        e.select(hour.alias("i_start"))
        .filter(F.hour(F.col("i_start")) % 6 == 0)
        .distinct()
        .withColumn("i_end", F.col("i_start") + F.expr("INTERVAL 2 HOURS"))
    )
    s_bins = spans.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("s_start")),
                F.date_trunc("hour", F.col("s_end")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ),
    )
    i_bins = incidents.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.col("i_start"),
                F.col("i_start") + F.expr("INTERVAL 1 HOUR"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ),
    )
    pairs = (
        s_bins.join(i_bins, "bin")
        .drop("bin")
        .distinct()
        .filter((F.col("s_start") < F.col("i_end")) & (F.col("i_start") < F.col("s_end")))
    )
    ep = lambda c: F.unix_micros(F.col(c).cast("timestamp"))
    return pairs.select(
        "user_id", "session_id", "s_start", "i_start",
        (
            F.least(ep("s_end"), ep("i_end")) - F.greatest(ep("s_start"), ep("i_start"))
        ).alias("overlap_us"),
    )


@register(
    "join_asof_tolerance",
    oracle="""
WITH r AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS last_orderkey
    FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, e.ts,
       CASE WHEN o.o_orderdate >= e.ts - INTERVAL 7 DAY
            THEN o.last_orderkey END AS last_orderkey,
       CASE WHEN o.o_orderdate >= e.ts - INTERVAL 7 DAY
            THEN o.o_orderdate END AS matched_ts
  FROM events e ASOF LEFT JOIN r o
    ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
    description="as-of join with a staleness tolerance (the feature-store "
    "point-in-time lookup: a feature older than the window is no feature): "
    "same single-shuffle union + carry-forward as join_asof — the matched "
    "right timestamp rides in the carried payload and a map-side mask nulls "
    "matches older than 7 days; no second join, no theta join",
)
def join_asof_tolerance(spark, sf_dir):
    from sparkmerge.ext.temporal import asof_join

    events = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    # right_dups='max': payload struct leads with last_orderkey, so the
    # lexicographic max at a duplicate (key, time) IS the oracle's
    # max(o_orderkey) — no pre-aggregate shuffle (same fold as join_asof)
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", F.col("o_orderkey").alias("last_orderkey")
    )
    joined = asof_join(
        events,
        orders,
        key=("user_id", "o_custkey"),
        time=("ts", "o_orderdate"),
        right_payload=["last_orderkey", "o_orderdate"],
        right_dups="max",
    )
    fresh = F.col("o_orderdate") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.when(fresh, F.col("last_orderkey")).alias("last_orderkey"),
        F.when(fresh, F.col("o_orderdate")).alias("matched_ts"),
    )


@register(
    "join_asof_nearest",
    oracle="""
WITH u AS (
  SELECT o_custkey AS k, epoch_us(o_orderdate) AS t_us, 0 AS side,
         NULL AS event_id, o_orderkey AS payload
    FROM orders
  UNION ALL
  SELECT user_id AS k, epoch_us(ts) AS t_us, 1 AS side,
         event_id, NULL AS payload
    FROM events
),
carried AS (
  SELECT k, t_us, side, event_id,
         last_value(payload IGNORE NULLS) OVER
           (PARTITION BY k ORDER BY t_us, side, payload
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_pay,
         last_value(CASE WHEN side = 0 THEN t_us END IGNORE NULLS) OVER
           (PARTITION BY k ORDER BY t_us, side, payload
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
         first_value(payload IGNORE NULLS) OVER
           (PARTITION BY k ORDER BY t_us, side, payload DESC
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_pay,
         first_value(CASE WHEN side = 0 THEN t_us END IGNORE NULLS) OVER
           (PARTITION BY k ORDER BY t_us, side, payload DESC
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
    FROM u
)
SELECT event_id, k AS user_id, t_us,
       CASE WHEN prev_t IS NULL THEN next_pay
            WHEN next_t IS NULL THEN prev_pay
            WHEN t_us - prev_t <= next_t - t_us THEN prev_pay
            ELSE next_pay END AS nearest_orderkey,
       CASE WHEN prev_t IS NULL THEN next_t - t_us
            WHEN next_t IS NULL THEN t_us - prev_t
            WHEN t_us - prev_t <= next_t - t_us THEN t_us - prev_t
            ELSE next_t - t_us END AS gap_us
  FROM carried WHERE side = 1
""",
    description="nearest-neighbor as-of join (backward OR forward, whichever "
    "closer; ties prefer backward): ONE key shuffle carries the latest "
    "preceding AND earliest following order through two frames of the same "
    "partitioned window — never a theta join; duplicate right timestamps "
    "resolve to max orderkey in BOTH directions (backward scan orders "
    "payload asc so last wins; forward scan orders payload desc so first "
    "wins), exact integer-µs gaps",
)
def join_asof_nearest(spark, sf_dir):
    from pyspark.sql.window import Window

    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("t_us"),
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("payload"),
    )
    events = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        F.lit(1).alias("side"),
        "event_id",
        F.lit(None).cast("long").alias("payload"),
    )
    u = orders.unionByName(events)
    w_back = (
        Window.partitionBy("k")
        .orderBy("t_us", "side", "payload")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("k")
        .orderBy(F.col("t_us"), F.col("side"), F.col("payload").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    right_t = F.when(F.col("side") == 0, F.col("t_us"))
    carried = u.select(
        "k", "t_us", "side", "event_id",
        F.last("payload", ignorenulls=True).over(w_back).alias("prev_pay"),
        F.last(right_t, ignorenulls=True).over(w_back).alias("prev_t"),
        F.first("payload", ignorenulls=True).over(w_fwd).alias("next_pay"),
        F.first(right_t, ignorenulls=True).over(w_fwd).alias("next_t"),
    )
    back_gap = F.col("t_us") - F.col("prev_t")
    fwd_gap = F.col("next_t") - F.col("t_us")
    prefer_back = F.col("next_t").isNull() | (back_gap <= fwd_gap)
    return carried.filter(F.col("side") == 1).select(
        "event_id",
        F.col("k").alias("user_id"),
        "t_us",
        F.when(F.col("prev_t").isNull(), F.col("next_pay"))
        .when(prefer_back, F.col("prev_pay"))
        .otherwise(F.col("next_pay"))
        .alias("nearest_orderkey"),
        F.when(F.col("prev_t").isNull(), fwd_gap)
        .when(prefer_back, back_gap)
        .otherwise(fwd_gap)
        .alias("gap_us"),
    )


@register(
    "join_asof_forward",
    oracle="""
WITH r AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS next_orderkey
    FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, e.ts, o.next_orderkey
  FROM events e ASOF LEFT JOIN r o
    ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
""",
    description="forward as-of join (the 'next scheduled event' direction "
    "the backward family can't answer): earliest order at-or-AFTER each "
    "event, via the same union + partitioned-window carry-forward with the "
    "time ordering reversed — still ONE shuffle total, never a nested-loop "
    "theta join; right side deduped to max orderkey per (key, time) on "
    "both engines; oracle is DuckDB's native forward ASOF JOIN (ts <= t)",
)
def join_asof_forward(spark, sf_dir):
    from sparkmerge.ext.temporal import asof_join

    events = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", F.col("o_orderkey").alias("next_orderkey")
    )
    return asof_join(
        events,
        orders,
        key=("user_id", "o_custkey"),
        time=("ts", "o_orderdate"),
        right_payload=["next_orderkey"],
        right_dups="max",
        direction="forward",
    )


# --- join_temporal_validity (r8) ---------------------------------------------
#
# Validity-interval join: two per-entity interval tables, pairs whose
# validity windows OVERLAP at some instant — the temporal-warehouse shape
# behind "which dimension versions were simultaneously valid" / "which
# later purchase's return window fell inside an earlier purchase's
# warranty".  Both interval tables derive deterministically from orders
# (the corpus carries no native end-date column — same derived-input
# precedent as window_interval_stabbing): per order, a 90-day warranty
# [d, d+90) and a 30-day return window [d, d+30), keyed by customer.
#
# Scale: NEVER the theta nested-loop the oracle runs — each interval
# explodes into its covered MONTH bins (≤ 4 for the 90-day side), pairs
# equi-join on (custkey, bin) with bounded per-bin occupancy (per-customer
# order counts do not grow with corpus size), duplicates from multi-bin
# matches collapse via distinct, and the exact half-open overlap predicate
# filters.  One shuffle per side on the bin key; overlap length in exact
# integer days.


@register(
    "join_temporal_validity",
    oracle="""
WITH o AS (
  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders
),
a AS (
  SELECT o_custkey, o_orderkey AS a_orderkey, d AS a_start, d + 90 AS a_end
    FROM o
),
b AS (
  SELECT o_custkey, o_orderkey AS b_orderkey, d AS b_start, d + 30 AS b_end
    FROM o
)
SELECT a.o_custkey, a.a_orderkey, b.b_orderkey,
       CAST(a.a_start AS VARCHAR) AS a_start,
       CAST(b.b_start AS VARCHAR) AS b_start,
       CAST(date_diff('day', greatest(a.a_start, b.b_start),
                      least(a.a_end, b.b_end)) AS BIGINT) AS overlap_days
  FROM a JOIN b
    ON a.o_custkey = b.o_custkey
   AND a.a_orderkey <> b.b_orderkey
   AND a.a_start < b.b_end AND b.b_start < a.a_end
""",
    description="validity-interval join (per-customer 90-day warranty "
    "windows × 30-day return windows, half-open overlap semantics) via "
    "month-bin decomposition: each interval explodes into ≤4 covered month "
    "bins, pairs equi-join on (custkey, bin) — bounded shuffle with "
    "per-bin occupancy pinned by per-customer order counts — multi-bin "
    "duplicates collapse via distinct, the exact overlap predicate "
    "filters; overlap length in exact integer days (the oracle runs the "
    "theta nested-loop, proving the decomposition exact)",
)
def join_temporal_validity(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("d"),
    )

    def binned(prefix: str, days: int):
        start = F.col("d")
        end = F.date_add(F.col("d"), days)
        return o.select(
            "o_custkey",
            F.col("o_orderkey").alias(f"{prefix}_orderkey"),
            start.alias(f"{prefix}_start"),
            end.alias(f"{prefix}_end"),
            F.explode(
                F.sequence(
                    F.trunc(start, "month"),
                    F.trunc(F.date_sub(end, 1), "month"),
                    F.expr("interval 1 month"),
                )
            ).alias("bin"),
        )

    a = binned("a", 90)
    b = binned("b", 30)
    return (
        a.join(b, ["o_custkey", "bin"])
        .filter(
            (F.col("a_orderkey") != F.col("b_orderkey"))
            & (F.col("a_start") < F.col("b_end"))
            & (F.col("b_start") < F.col("a_end"))
        )
        .select(
            "o_custkey",
            "a_orderkey",
            "b_orderkey",
            F.col("a_start").cast("string").alias("a_start"),
            F.col("b_start").cast("string").alias("b_start"),
            F.datediff(
                F.least(F.col("a_end"), F.col("b_end")),
                F.greatest(F.col("a_start"), F.col("b_start")),
            )
            .cast("long")
            .alias("overlap_days"),
        )
        .distinct()
    )
