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
    "union + partitioned-window carry-forward (ONE shuffle — never a "
    "nested-loop theta join); oracle is DuckDB's native ASOF JOIN",
)
def join_asof(spark, sf_dir):
    events = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("last_orderkey"))
    )
    return asof_join(
        events,
        orders,
        key=("user_id", "o_custkey"),
        time=("ts", "o_orderdate"),
        right_payload=["last_orderkey"],
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
