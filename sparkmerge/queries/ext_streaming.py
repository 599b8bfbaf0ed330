"""[EXT] streaming operators over events (SURVEY.md §2.C streaming row).

Tumbling/sliding/session have batch-SQL formulations (identical semantics),
so they carry real oracle checks; the two genuinely-streaming ops
(watermark, foreachBatch merge sink) run actual Structured Streaming jobs
and get rows-only checks + pytest equivalence properties.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from sparkmerge.ext.streaming import (
    foreachbatch_merge_replay,
    session_windows,
    sliding_counts,
    stateful_user_counts,
    tumbling_counts,
    watermark_tumbling_stream,
)
from sparkmerge.queries import events_path, load, register


@register(
    "window_tumbling",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       count(*) AS n, min(value) AS min_value, max(value) AS max_value
  FROM events GROUP BY 1, 2
""",
    description="tumbling 1h windows per event type (F.window ≙ time_bucket)",
)
def window_tumbling(spark, sf_dir):
    return tumbling_counts(load(spark, sf_dir, "events"), width="1 hour")


@register(
    "window_sliding",
    oracle="""
WITH assigned AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour' FROM events
)
SELECT window_start, count(*) AS n FROM assigned GROUP BY 1
""",
    description="sliding 2h windows every 1h (each event lands in 2 windows)",
)
def window_sliding(spark, sf_dir):
    return sliding_counts(load(spark, sf_dir, "events"), width="2 hours", slide="1 hour")


@register(
    "window_session",
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
)
SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
  FROM sessions GROUP BY user_id, session_id
""",
    description="session windows (30-min gap) via lag + cumulative sum — batch ≙ session_window",
)
def window_session(spark, sf_dir):
    return session_windows(load(spark, sf_dir, "events"), gap_minutes=30)


@register(
    "watermark_late_drop",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       count(*) AS n
  FROM events GROUP BY 1, 2
""",
    description="Structured Streaming: readStream → withWatermark(2h) → tumbling agg "
    "(availableNow processes the corpus as one batch, so no row is late and the "
    "result equals the batch aggregate — actual late-row dropping across batch "
    "boundaries is exercised in tests/test_ext.py)",
)
def watermark_late_drop(spark, sf_dir):
    return watermark_tumbling_stream(spark, events_path(sf_dir), width="1 hour", watermark="2 hours")


@register(
    "stream_stateful_counts",
    oracle="""
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents,
       CAST(max(floor(epoch(ts))) AS BIGINT) AS last_ts
  FROM events GROUP BY user_id
""",
    description="applyInPandasWithState: per-user running (count, value cents, last ts) "
    "GroupState across micro-batches; integer-cents accumulation makes the final "
    "state order-independent, so the batch aggregate is an exact oracle",
)
def stream_stateful_counts(spark, sf_dir):
    return stateful_user_counts(spark, events_path(sf_dir))


@register(
    "stream_merge_foreachbatch",
    oracle="""
SELECT user_id, event_id, ts, event_type, value FROM (
  SELECT user_id, event_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
    FROM events) t
 WHERE rn = 1
""",
    description="foreachBatch merge sink: ts-ordered micro-batch upserts into a "
    "SnapshotTable; because batches are ts-range ordered, the final table is "
    "exactly the per-user latest event (the upsert-convergence invariant)",
)
def stream_merge_foreachbatch(spark, sf_dir):
    path = os.path.join(tempfile.mkdtemp(prefix="sm_stream_"), "state")
    try:
        table = foreachbatch_merge_replay(spark, events_path(sf_dir), path, num_batches=4)
        # materialize before the temp dir is removed
        rows = table.read(spark).collect()
        return spark.createDataFrame(rows, table.read(spark).schema)
    finally:
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)


@register(
    "stream_dedup_watermark",
    oracle="""
SELECT event_id, user_id, event_type, value, ts FROM events
""",
    description="streaming exact dedup: a doubled copy of the events files "
    "(every row delivered twice, across micro-batch boundaries) runs through "
    "readStream -> withWatermark -> dropDuplicatesWithinWatermark(event_id); "
    "keyed state suppresses the re-delivery and is watermark-evicted "
    "(bounded state at scale), so the sink equals the distinct event set",
)
def stream_dedup_watermark(spark, sf_dir):
    import glob

    from sparkmerge.ext.streaming import streaming_dedup

    src = events_path(sf_dir)
    doubled = tempfile.mkdtemp(prefix="sm_dedup_src_")
    for i, f in enumerate(sorted(glob.glob(os.path.join(src, "*.parquet")))):
        shutil.copy(f, os.path.join(doubled, f"a{i}.parquet"))
        shutil.copy(f, os.path.join(doubled, f"b{i}.parquet"))
    try:
        result = streaming_dedup(spark, doubled)
        # materialize before the temp source dir is removed
        return spark.createDataFrame(result.collect(), result.schema)
    finally:
        shutil.rmtree(doubled, ignore_errors=True)


@register(
    "stream_session_window",
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
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
  FROM sessions GROUP BY user_id, session_id
""",
    description="native streaming sessionization: F.session_window merges "
    "per-user session state across micro-batches and closes sessions as the "
    "watermark passes; the drained sink must equal the batch lag+cumsum "
    "sessionization (same 30-min gap), which is what the oracle computes",
)
def stream_session_window(spark, sf_dir):
    from sparkmerge.ext.streaming import streaming_session_windows

    return streaming_session_windows(spark, events_path(sf_dir), gap_minutes=30)


@register(
    "stream_stream_join",
    oracle="""
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       c.ts AS click_ts, p.ts AS purchase_ts
  FROM events c
  JOIN events p
    ON p.user_id = c.user_id AND p.event_type = 'purchase'
   AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
 WHERE c.event_type = 'click'
""",
    description="watermarked stream-stream inner join (online attribution): "
    "clicks joined to purchases within 30 minutes, watermarks + an event-"
    "time join bound let Spark evict expired join state (bounded memory at "
    "scale); append mode emits exactly the batch join's pair set",
)
def stream_stream_join(spark, sf_dir):
    from sparkmerge.ext.streaming import stream_stream_join as ssj

    return ssj(spark, events_path(sf_dir))


@register(
    "funnel_conversion",
    oracle="""
WITH clicks AS (
  SELECT user_id, ts AS click_ts, event_id AS click_id
    FROM events WHERE event_type = 'click'
),
conv AS (
  SELECT c.user_id, c.click_id,
         min(p.event_id) AS first_purchase_id
    FROM clicks c
    JOIN events p
      ON p.user_id = c.user_id AND p.event_type = 'purchase'
     AND p.ts > c.click_ts AND p.ts <= c.click_ts + INTERVAL 30 MINUTE
   GROUP BY c.user_id, c.click_id
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_converted_clicks,
       CAST(count(DISTINCT first_purchase_id) AS BIGINT) AS n_purchases_credited
  FROM conv GROUP BY user_id
""",
    description="sessionized funnel: clicks converting to a purchase within 30 "
    "minutes, per user — the event-sequence analytics shape (self range-join "
    "bounded by the conversion window)",
)
def funnel_conversion(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    conv = (
        clicks.join(
            purchases,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_ts") > F.col("click_ts"))
            & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .groupBy("user_id", "click_id")
        .agg(F.min("p_id").alias("first_purchase_id"))
    )
    return conv.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_converted_clicks"),
        F.countDistinct("first_purchase_id").alias("n_purchases_credited"),
    )


@register(
    "rollup_incremental",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       count(*) AS n, min(value) AS min_value, max(value) AS max_value
  FROM events GROUP BY 1, 2
""",
    description="continuous aggregate (hypertable-rollup pattern): hourly "
    "rollup maintained incrementally across 4 replayed batches via "
    "combine-and-merge; final state must equal the one-shot batch aggregate "
    "(the materialized-view-maintenance guarantee)",
)
def rollup_incremental(spark, sf_dir):
    from sparkmerge.ext.streaming import incremental_rollup

    path = os.path.join(tempfile.mkdtemp(prefix="sm_rollup_"), "t")
    try:
        table = incremental_rollup(spark, events_path(sf_dir), path, num_batches=4)
        rows = table.read(spark).collect()
        return spark.createDataFrame(rows, table.read(spark).schema)
    finally:
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)


@register(
    "window_retention_cohort",
    oracle="""
WITH first_seen AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week FROM events GROUP BY user_id
)
SELECT f.cohort_week,
       CAST((epoch(date_trunc('week', e.ts)) - epoch(f.cohort_week)) / 604800 AS INT)
         AS week_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active_users
  FROM events e JOIN first_seen f ON e.user_id = f.user_id
 GROUP BY 1, 2
""",
    description="cohort retention matrix: users bucketed by first-seen week, "
    "activity counted per week offset — the product-analytics retention "
    "shape; per-user min-ts aggregate, key-co-partitioned join back on "
    "user_id, one distinct-count aggregate (both joins shuffle on the same "
    "key, so AQE can reuse the exchange)",
)
def window_retention_cohort(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    joined = e.join(first_seen, "user_id")
    offset = (
        (
            F.unix_timestamp(F.date_trunc("week", F.col("ts")))
            - F.unix_timestamp(F.col("cohort_week"))
        )
        / 604800
    ).cast("int")
    return (
        joined.groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


# --- stream_scd2_foreachbatch: streaming dimension loads into SCD2 history ---


@register(
    "stream_scd2_foreachbatch",
    oracle=None,  # set below — built from core's _scd2_apply_sql helper
    description="streaming SCD2 sink: readStream over ordered extract files "
    "-> foreachBatch(scd2_merge) into a versioned SnapshotTable; each "
    "micro-batch is one dimension load, re-changed keys accumulate version "
    "chains exactly as sequential batch loads would (the oracle replays "
    "both loads in SQL from an EMPTY history); state lives in the table, "
    "not stream memory, so the sink is bounded at any corpus size",
)
def stream_scd2_foreachbatch(spark, sf_dir):
    from sparkmerge.ext.streaming import scd2_foreachbatch_stream

    c = load(spark, sf_dir, "customer")
    s1 = c.filter(F.col("c_custkey") % 7 == 3).withColumn(
        "c_acctbal", F.col("c_acctbal") + 10.0
    )
    s2 = c.filter(F.col("c_custkey") % 14 == 3).withColumn(
        "c_acctbal", F.col("c_acctbal") + 20.0
    )
    root = tempfile.mkdtemp(prefix="sm_scd2_stream_")
    src = os.path.join(root, "loads")
    os.makedirs(src)
    try:
        for i, batch in enumerate([s1, s2]):
            staging = os.path.join(root, f"b{i}")
            batch.coalesce(1).write.parquet(staging)
            part = next(
                p for p in os.listdir(staging) if p.endswith(".parquet")
            )
            dst = os.path.join(src, f"load{i}.parquet")
            os.rename(os.path.join(staging, part), dst)
            # pinned mtimes fix the micro-batch order
            os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
        table = scd2_foreachbatch_stream(
            spark,
            src,
            os.path.join(root, "dim"),
            key="c_custkey",
            batch_load_ts=["2024-02-01 00:00:00", "2024-03-01 00:00:00"],
        )
        hist = table.read(spark)
        rows = hist.collect()  # materialize before the temp dir is removed
        return spark.createDataFrame(rows, hist.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _install_scd2_stream_oracle() -> None:
    """The oracle replays both streaming loads as batch SCD2 SQL, reusing
    core's _scd2_apply_sql (the merge_scd2_multibatch machinery) from an
    empty starting history."""
    from sparkmerge.queries import _REGISTRY
    from sparkmerge.queries.core import _SCD2_COLS, _scd2_apply_sql

    sql = f"""
WITH h0 AS (
  SELECT {_SCD2_COLS},
         CAST(NULL AS TIMESTAMP) AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
    FROM customer WHERE FALSE
),
s1 AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 10.0 AS c_acctbal,
         c_mktsegment
    FROM customer WHERE c_custkey % 7 = 3
),
h1 AS ({_scd2_apply_sql('h0', 's1', '2024-02-01 00:00:00')}),
s2 AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 20.0 AS c_acctbal,
         c_mktsegment
    FROM customer WHERE c_custkey % 14 = 3
)
{_scd2_apply_sql('h1', 's2', '2024-03-01 00:00:00')}
"""
    spec = _REGISTRY["stream_scd2_foreachbatch"]
    _REGISTRY["stream_scd2_foreachbatch"] = type(spec)(
        spec.op_id, spec.fn, sql, spec.description
    )


_install_scd2_stream_oracle()


# --- stream_hll_rollup: mergeable sketch state across ingest shards ---


def _hll_rollup_oracle() -> str:
    from sparkmerge.ext.hashing import mix32_sql_chain
    from sparkmerge.queries.analytics import (
        _HLL_M,
        _HLL_NUM,
        _hll_rho_sql,
        _hll_term_sql,
    )

    return f"""
WITH du AS (
  SELECT date_trunc('day', ts) AS day, event_type, user_id FROM events
),
{mix32_sql_chain('hashed', 'du', 'day, event_type, user_id', 'user_id')},
slotted AS (
  SELECT day, event_type, h % {_HLL_M} AS bucket,
         CAST((h - (h % {_HLL_M})) / {_HLL_M} AS BIGINT) AS rest
    FROM hashed),
regs AS (
  SELECT day, event_type, bucket, max({_hll_rho_sql('rest')}) AS rho
    FROM slotted GROUP BY 1, 2, 3),
z AS (
  SELECT day, event_type,
         CAST(sum({_hll_term_sql('rho')}) AS BIGINT)
           + ({_HLL_M} - CAST(count(*) AS BIGINT)) * {1 << 40} AS z_scaled,
         CAST({_HLL_M} - count(*) AS BIGINT) AS zero_regs
    FROM regs GROUP BY 1, 2),
ex AS (
  SELECT date_trunc('day', ts) AS day, event_type,
         CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
    FROM events GROUP BY 1, 2)
SELECT z.day, z.event_type,
       {_HLL_NUM!r} / CAST(z.z_scaled AS DOUBLE) AS raw_est,
       z.zero_regs, ex.exact_distinct
  FROM z JOIN ex ON z.day = ex.day AND z.event_type = ex.event_type
"""


@register(
    "stream_hll_rollup",
    oracle=_hll_rollup_oracle(),
    description="incremental distinct-user rollup via mergeable HLL state: "
    "per-(day, event_type) registers are computed INDEPENDENTLY on three "
    "ingest shards (event_id mod 3 — arrival order is irrelevant), then "
    "merged by register-wise max — associative and commutative, so shard "
    "count, batch order, and partitioning cannot change the result; the "
    "oracle computes the same sketch in ONE pass over all events and the "
    "hash match PROVES state merging is lossless.  This is the rollup "
    "shape that lets a 100 TB pipeline maintain daily distinct counts "
    "with constant-size state per window instead of re-scanning history "
    "(exact per-day distincts ride along as the quality audit)",
)
def stream_hll_rollup(spark, sf_dir):
    from sparkmerge.ext.hashing import mix32
    from sparkmerge.queries.analytics import (
        _HLL_M,
        _HLL_NUM,
        _HLL_REST_BITS,
    )

    e = load(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
        "user_id",
        "event_id",
    )

    h = mix32(F.col("user_id"))
    bucket = h % _HLL_M
    rest = ((h - bucket) / F.lit(float(_HLL_M))).cast("long")

    rho = None
    for k in range(1, _HLL_REST_BITS + 1):
        cond = F.col("rest") >= (1 << (_HLL_REST_BITS - k))
        rho = F.when(cond, k) if rho is None else rho.when(cond, k)
    rho = rho.otherwise(_HLL_REST_BITS + 1)

    term = None
    for k in range(1, _HLL_REST_BITS + 2):
        c = F.col("rho") == k
        t = F.lit(1 << (40 - k))
        term = F.when(c, t) if term is None else term.when(c, t)

    def shard_regs(shard: int):
        return (
            e.filter(F.col("event_id") % 3 == shard)
            .select("day", "event_type", bucket.alias("bucket"), rest.alias("rest"))
            .withColumn("rho_row", rho)
            .groupBy("day", "event_type", "bucket")
            .agg(F.max("rho_row").alias("rho"))
        )

    merged = (
        shard_regs(0)
        .unionByName(shard_regs(1))
        .unionByName(shard_regs(2))
        .groupBy("day", "event_type", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    z = merged.groupBy("day", "event_type").agg(
        (
            F.sum(term).cast("long")
            + (F.lit(_HLL_M) - F.count("*")) * F.lit(1 << 40)
        ).alias("z_scaled"),
        (F.lit(_HLL_M) - F.count("*")).cast("long").alias("zero_regs"),
    )
    ex = e.groupBy("day", "event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return z.join(ex, ["day", "event_type"]).select(
        "day",
        "event_type",
        (F.lit(_HLL_NUM) / F.col("z_scaled").cast("double")).alias("raw_est"),
        "zero_regs",
        "exact_distinct",
    )


@register(
    "stream_outer_join_watermark",
    oracle="""
WITH bounds AS (
  SELECT least(max(ts) FILTER (event_type = 'click'),
               max(ts) FILTER (event_type = 'purchase')) AS side_max
    FROM events
),
clicks AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts
    FROM events, bounds
   WHERE event_type = 'click'
     AND ts < side_max - INTERVAL 30 MINUTE - INTERVAL 2 HOUR
)
SELECT c.user_id, c.click_id, p.event_id AS purchase_id, c.click_ts
  FROM clicks c
  LEFT JOIN events p
    ON p.user_id = c.user_id AND p.event_type = 'purchase'
   AND p.ts > c.click_ts AND p.ts <= c.click_ts + INTERVAL 30 MINUTE
""",
    description="watermarked LEFT-OUTER stream-stream join: every click "
    "emits, NULL-padded when no purchase follows within 30 min — the null "
    "row only materializes once the watermark proves no match can arrive, "
    "so state stays bounded AND correct; result restricted to the decided "
    "region (clicks whose window+watermark closed before stream end, with "
    "margin) so streaming output ≡ the batch left join the oracle runs",
)
def stream_outer_join_watermark(spark, sf_dir):
    from sparkmerge.ext.streaming import stream_stream_outer_join

    return stream_stream_outer_join(spark, events_path(sf_dir))
