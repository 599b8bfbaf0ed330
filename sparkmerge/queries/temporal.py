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
    orders = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("last_orderkey"))
    )
    joined = asof_join(
        events,
        orders,
        key=("user_id", "o_custkey"),
        time=("ts", "o_orderdate"),
        right_payload=["last_orderkey", "o_orderdate"],
    )
    fresh = F.col("o_orderdate") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.when(fresh, F.col("last_orderkey")).alias("last_orderkey"),
        F.when(fresh, F.col("o_orderdate")).alias("matched_ts"),
    )
