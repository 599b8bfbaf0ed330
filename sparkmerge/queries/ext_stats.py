"""[EXT] round-5 statistics & relational-completeness operators (SURVEY.md
§2.E, r5 batch 1).

Six surfaces a warehouse/pipeline user expects that the registry didn't yet
cover as first-class ops:

- ``agg_rollup_cube`` — CUBE hierarchy aggregates (the OLAP subtotal
  lattice).  Spark's ``df.cube`` is one Expand + one shuffle — the grouping
  sets never re-scan the input; NULL group keys are sentinel-coalesced so
  both engines emit identical label columns.
- ``agg_linear_fit`` — per-group OLS (slope/intercept) from EXACT integer
  moment sums (n, Σx, Σy, Σxy, Σx²) combined in ONE fixed-association IEEE
  expression — the distributed-regression shape with zero order-dependent
  float accumulation (same discipline as ``agg_corr_pairs``).
- ``agg_weighted_median`` — weighted median via the cumulative-weight
  window (first value whose running weight reaches half the total) —
  the exact weighted-quantile formulation that needs one key shuffle and
  no per-group sort-all-to-driver.
- ``fn_window_distribution`` — the remaining rank-family window surface:
  cume_dist / percent_rank / nth_value / first_value / last_value over an
  explicitly unique ordering (ties broken by key) so both engines agree
  bit-for-bit on the FP divisions.
- ``text_simpson_diversity`` — per-language vocabulary concentration via
  the Simpson repeat probability Σc(c−1)/(N(N−1)) — the entropy-class
  diversity signal expressed in exact integers + ONE division (log-free,
  bit-portable; complement of ``agg_token_gini``).
- ``timeseries_changepoint_cusum`` — CUSUM drift detection over per-type
  hourly counts, in scaled integers (S_t = Σ m·cᵢ − t·… — see op) so the
  running statistic is bit-reproducible under any partitioning.

Scale notes (100 TB): every op is one agg shuffle + (where needed) one
window over the same key, or map-side only; no collect, no cross join, no
Python.  The weighted-median window partitions by the group key — skewed
groups spill, never OOM the driver.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparkmerge.queries import load, register

# --- agg_rollup_cube -----------------------------------------------------


@register(
    "agg_rollup_cube",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM orders
 GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    description="OLAP subtotal lattice: CUBE(status, priority) with count + "
    "exact integer-cents sum; one Expand + ONE shuffle (grouping sets never "
    "re-scan the fact table); NULL group keys coalesced to a sentinel so "
    "the label columns are engine-portable",
)
def agg_rollup_cube(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(
        "o_orderstatus",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("cents_raw"),
    )
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents_raw").alias("cents"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n",
            "cents",
        )
    )


# --- agg_linear_fit ------------------------------------------------------

# x = hour-of-week (0..167): small enough that every moment sum stays exact
# in int64 AND in double (< 2^53) at any realistic SF; y = value in integer
# cents.  slope/intercept are then ONE fixed-association double expression
# over the five per-group scalars — both engines evaluate the identical
# tree, so the result is bit-identical without being order-dependent.


@register(
    "agg_linear_fit",
    oracle="""
WITH m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum((epoch_us(ts) // 3600000000) % 168) AS BIGINT) AS sx,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sy,
         CAST(sum(((epoch_us(ts) // 3600000000) % 168)
                  * CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sxy,
         CAST(sum(((epoch_us(ts) // 3600000000) % 168)
                  * ((epoch_us(ts) // 3600000000) % 168)) AS BIGINT) AS sxx
    FROM events GROUP BY event_type
)
SELECT event_type, n, sx, sy, sxy, sxx,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         AS slope_cents_per_hour
  FROM m
""",
    description="distributed per-group OLS: value-cents vs hour-of-week from "
    "five EXACT integer moment sums (each < 2^53 — exact in int64 and in "
    "double) combined in one fixed-association IEEE expression; ONE "
    "map-side-combined aggregate, no order-dependent float sums",
)
def agg_linear_fit(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    # integer `div`, not double `/`+cast: FP division can round up across an
    # integer boundary before the cast truncates, off-by-one vs DuckDB's `//`
    x = F.expr("unix_seconds(CAST(ts AS TIMESTAMP)) div 3600") % 168
    y = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    d = lambda c: F.col(c).cast("double")
    return m.select(
        "event_type", "n", "sx", "sy", "sxy", "sxx",
        (
            (d("n") * d("sxy") - d("sx") * d("sy"))
            / (d("n") * d("sxx") - d("sx") * d("sx"))
        ).alias("slope_cents_per_hour"),
    )


# --- agg_weighted_median -------------------------------------------------


@register(
    "agg_weighted_median",
    oracle="""
WITH v AS (
  SELECT lang, doc_id, n_chars,
         CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
    FROM documents
),
cum AS (
  SELECT lang, doc_id, n_tokens, n_chars,
         sum(n_chars) OVER (PARTITION BY lang ORDER BY n_tokens, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cumw,
         sum(n_chars) OVER (PARTITION BY lang) AS total_w
    FROM v
)
SELECT lang,
       min(n_tokens ORDER BY n_tokens, doc_id) AS weighted_median_tokens,
       CAST(min(total_w) AS BIGINT) AS total_weight
  FROM cum
 WHERE 2 * cumw >= total_w
 GROUP BY lang
""",
    description="exact weighted median (doc token count weighted by chars): "
    "cumulative-weight window ordered by (value, id) — deterministic under "
    "ties — first row whose running weight reaches half the total; the two "
    "windows and the final agg share ONE lang-keyed shuffle, all integer "
    "comparisons",
)
def agg_weighted_median(spark, sf_dir):
    from sparkmerge.ext.text import token_count

    d = load(spark, sf_dir, "documents")
    v = d.select(
        "lang", "doc_id", "n_chars",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    w_cum = (
        Window.partitionBy("lang")
        .orderBy("n_tokens", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("lang")
    cum = v.select(
        "lang", "doc_id", "n_tokens",
        F.sum("n_chars").over(w_cum).alias("cumw"),
        F.sum("n_chars").over(w_all).alias("total_w"),
    )
    return (
        cum.filter(2 * F.col("cumw") >= F.col("total_w"))
        .groupBy("lang")
        .agg(
            F.min(F.struct("n_tokens", "doc_id")).getField("n_tokens").alias(
                "weighted_median_tokens"
            ),
            F.min("total_w").alias("total_weight"),
        )
    )


# --- fn_window_distribution ----------------------------------------------


@register(
    "fn_window_distribution",
    oracle="""
SELECT c_custkey, c_nationkey,
       cume_dist() OVER w AS cd,
       percent_rank() OVER w AS pr,
       nth_value(c_custkey, 2) OVER
         (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key,
       first_value(c_custkey) OVER w AS poorest_key,
       last_value(c_custkey) OVER
         (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest_key
  FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
""",
    description="rank-family window completeness: cume_dist / percent_rank / "
    "nth_value / first_value / last_value per nation over an explicitly "
    "UNIQUE ordering (acctbal, custkey) — no peer groups, so the two FP "
    "divisions (rn/n, (rn−1)/(n−1)) are bit-identical across engines; all "
    "five functions share ONE nation-keyed shuffle",
)
def fn_window_distribution(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey", "c_nationkey",
        F.cume_dist().over(w).alias("cd"),
        F.percent_rank().over(w).alias("pr"),
        F.nth_value("c_custkey", 2).over(w_full).alias("second_key"),
        F.first("c_custkey").over(w).alias("poorest_key"),
        F.last("c_custkey").over(w_full).alias("richest_key"),
    )


# --- text_simpson_diversity ----------------------------------------------


@register(
    "text_simpson_diversity",
    oracle="""
WITH toks AS (
  SELECT lang, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS tok
    FROM documents
),
cnts AS (
  SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
    FROM toks GROUP BY 1, 2
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS vocab,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(sum(c * (c - 1)) AS DOUBLE)
         / CAST(sum(c) * (sum(c) - 1) AS DOUBLE) AS simpson_repeat_prob
  FROM cnts GROUP BY lang
""",
    description="per-language vocabulary concentration: Simpson repeat "
    "probability Σc(c−1)/(N(N−1)) + vocab size — the log-free diversity "
    "signal (bit-portable: exact integer numerator/denominator, ONE IEEE "
    "division); one explode + two map-side-combined agg shuffles",
)
def text_simpson_diversity(spark, sf_dir):
    from sparkmerge.ext.text import whitespace_tokens

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "lang", F.explode(whitespace_tokens(F.lower(F.col("text")))).alias("tok")
    )
    cnts = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    return cnts.groupBy("lang").agg(
        F.count(F.lit(1)).alias("vocab"),
        F.sum("c").alias("n_tokens"),
        (
            F.sum(F.col("c") * (F.col("c") - 1)).cast("double")
            / (F.sum("c") * (F.sum("c") - 1)).cast("double")
        ).alias("simpson_repeat_prob"),
    )


# --- timeseries_changepoint_cusum ----------------------------------------

# Scaled-integer CUSUM: with m hourly buckets per type and total count T,
#   S_t = Σ_{i≤t} (m·cᵢ − T)
# is the classic CUSUM of (cᵢ − mean) scaled by m — exact int64 (counts are
# < 2^31, m < 10^5), so the running statistic is bit-reproducible and the
# drift flag |S_t| > T is an integer comparison.


@register(
    "timeseries_changepoint_cusum",
    oracle="""
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS h,
         CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, h, c,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS m,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS t
    FROM hourly
)
SELECT event_type, h, c,
       CAST(sum(m * c - t) OVER (PARTITION BY event_type ORDER BY h
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cusum,
       CAST(abs(sum(m * c - t) OVER (PARTITION BY event_type ORDER BY h
                                     ROWS UNBOUNDED PRECEDING)) > t AS BOOLEAN)
         AS drift_flag
  FROM stats
""",
    description="CUSUM changepoint detection over per-type hourly counts in "
    "scaled integers (S_t = Σ m·cᵢ − T ≡ m·CUSUM(cᵢ − mean); exact int64, "
    "no FP mean) with an integer drift flag |S_t| > T; one agg shuffle + "
    "one type-keyed window shuffle",
)
def timeseries_changepoint_cusum(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    hourly = (
        e.select("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_all = Window.partitionBy("event_type")
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stats = hourly.select(
        "event_type", "h", "c",
        F.count(F.lit(1)).over(w_all).alias("m"),
        F.sum("c").over(w_all).alias("t"),
    )
    cusum = F.sum(F.col("m") * F.col("c") - F.col("t")).over(w_cum)
    return stats.select(
        "event_type", "h", "c",
        cusum.alias("cusum"),
        (F.abs(cusum) > F.col("t")).alias("drift_flag"),
    )


# --- agg_variance_exact (r6) ---------------------------------------------
#
# The moment-sum discipline from agg_linear_fit applied to the variance:
# value in integer cents, so n / Σy / Σy² are EXACT int64 aggregates
# (cents ≤ ~1e5, cents² ≤ 1e10 — Σ stays < 2^63 through sf100 on this
# corpus, the documented envelope of the whole moments family), then the
# population variance is ONE fixed-association double expression over the
# three scalars: (n·Σy² − (Σy)²)/n² — no order-dependent float sums, no
# two-pass mean subtraction.  sqrt is a single correctly-rounded IEEE op,
# so stddev is bit-portable too.


@register(
    "agg_variance_exact",
    oracle="""
WITH m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS s1,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                  * CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS s2
    FROM events GROUP BY event_type
)
SELECT event_type, n, s1, s2,
       (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_cents2,
       sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS stddev_cents
  FROM m
""",
    description="exact distributed variance: per-type population variance "
    "of value-cents from three EXACT integer moment sums (n, Σy, Σy²) "
    "combined in one fixed-association IEEE expression + one sqrt — the "
    "one-pass formulation that map-side-combines (vs var_pop's engine-"
    "specific order-dependent accumulation); ONE aggregate shuffle",
)
def agg_variance_exact(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    y = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y).alias("s1"),
        F.sum(y * y).alias("s2"),
    )
    d = lambda c: F.col(c).cast("double")
    var = (d("n") * d("s2") - d("s1") * d("s1")) / (d("n") * d("n"))
    return m.select("event_type", "n", "s1", "s2",
                    var.alias("var_cents2"), F.sqrt(var).alias("stddev_cents"))


# --- window_running_distinct (r6) ----------------------------------------
#
# Running COUNT(DISTINCT) is the window nobody can evaluate directly at
# scale (distinct state per frame).  The standard reformulation: distinct =
# first-seen — min-aggregate each user's first active day (ONE user-keyed
# shuffle over the raw events), roll up new-user counts per day (tiny), and
# cumsum over the per-day frame.  The unbounded-order window runs over the
# AGGREGATED day domain (bounded by the calendar, thousands of rows at any
# corpus size), never over raw events — the 100 TB shape.


@register(
    "window_running_distinct",
    oracle="""
WITH fs AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id
),
per AS (SELECT d, CAST(count(*) AS BIGINT) AS new_users FROM fs GROUP BY d)
SELECT CAST(d AS VARCHAR) AS d, new_users,
       CAST(sum(new_users) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_distinct_users
  FROM per
""",
    description="running distinct-user count per day via the first-seen "
    "reformulation: min(first active day) per user (one user-keyed "
    "map-side-combined shuffle), new-user counts per day, cumulative sum "
    "over the bounded per-day frame — running COUNT(DISTINCT) without any "
    "per-frame distinct state; exact integers throughout",
)
def window_running_distinct(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    fs = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d"))
    per = fs.groupBy("d").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per.select(
        F.col("d").cast("string").alias("d"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_distinct_users"),
    )


# --- window_cumulative_share (r6b2): Pareto / ABC classification ----------
#
# The warehouse ABC question: rank customers by revenue, classify by the
# cumulative revenue share (A ≤ 80 %, B ≤ 95 %, C rest).  Revenue per
# customer is an EXACT integer cents sum (map-side-combined, one key
# shuffle); the cumulative sum runs over the AGGREGATED per-customer frame
# (bounded by |customers|, global-order window = a range-partitioned sort
# at cluster scale — the standard top-N/Pareto shape); share is exact-int /
# exact-int in ONE IEEE division, so the class boundaries compare
# identically in both engines.


@register(
    "window_cumulative_share",
    oracle="""
WITH rev AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev_cents
    FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT o_custkey, rev_cents,
         CAST(sum(rev_cents) OVER (ORDER BY rev_cents DESC, o_custkey
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents,
         CAST(sum(rev_cents) OVER () AS BIGINT) AS total_cents
    FROM rev
)
SELECT o_custkey, rev_cents,
       CAST(cum_cents AS DOUBLE) / CAST(total_cents AS DOUBLE) AS cum_share,
       CASE WHEN CAST(cum_cents AS DOUBLE) / CAST(total_cents AS DOUBLE) <= 0.80 THEN 'A'
            WHEN CAST(cum_cents AS DOUBLE) / CAST(total_cents AS DOUBLE) <= 0.95 THEN 'B'
            ELSE 'C' END AS abc_class
  FROM ranked
""",
    description="Pareto/ABC analysis: customers ranked by exact integer "
    "revenue cents, cumulative share over the aggregated per-customer "
    "frame (one key-shuffle agg + one global-order window on the bounded "
    "domain), class thresholds compared on the single-division share — "
    "deterministic tiebreak (rev desc, custkey) makes the running sum "
    "unique, so both engines agree bit-for-bit",
)
def window_cumulative_share(spark, sf_dir):
    """Distributed two-pass prefix sum (r10): the r6 formulation ran the
    cumulative sum AND the grand total as UNPARTITIONED windows — Spark
    plans both as a single-partition sort, i.e. one task walks every
    customer serially (the r9 verdict's ~3× sf10 mark was this shape, and
    at 10⁹ customers it would be a straight scale-killer).  The rewrite is
    the textbook distributed scan: range-partition on the Pareto order,
    cumsum WITHIN each partition (parallel), then add each partition's
    prefix offset — per-partition totals are |shuffle partitions| rows, a
    bounded driver-side collect exactly like the IVF/PQ centroid seeds.
    Output values are partitioning-invariant: the key (rev desc, custkey)
    is a total order, so every row's prefix is unique regardless of where
    the range boundaries land.  Measured sf10: 5.3 → 1.9 s (BASELINE.md
    round-10).

    Cluster caveat (ADVICE r10): ``localCheckpoint`` blocks are not
    fault-tolerant — an executor loss makes the returned frame
    unrecomputable.  On a real cluster, set a checkpoint dir and swap in
    reliable ``checkpoint()`` (same pin semantics, HDFS-backed); local[)
    test mode has no executor loss, so the cheap pin is used here."""
    o = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    rev = o.groupBy("o_custkey").agg(F.sum(cents).alias("rev_cents"))
    order = [F.desc("rev_cents"), F.asc("o_custkey")]
    part = rev.repartitionByRange(*order).withColumn(
        "_pid", F.spark_partition_id()
    )
    part = part.localCheckpoint(eager=True)  # pin sampled range boundaries:
    # two consumers (offsets, cumsum) must see the SAME partitioning
    w_local = Window.partitionBy("_pid").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ptot = sorted(
        part.groupBy("_pid").agg(F.sum("rev_cents").alias("_t")).collect(),
        key=lambda r: r["_pid"],
    )  # bounded: one row per shuffle partition
    if not ptot:
        # empty orders input (ADVICE r10): F.lit([]) below cannot infer an
        # array type and the share would divide by 0.0 — the correct result
        # is simply the empty frame with the contract schema
        return part.select(
            "o_custkey",
            "rev_cents",
            F.lit(None).cast("double").alias("cum_share"),
            F.lit(None).cast("string").alias("abc_class"),
        )
    total = sum(r["_t"] for r in ptot)
    offsets, acc = {}, 0
    for r in ptot:
        offsets[r["_pid"]] = acc
        acc += r["_t"]
    off = F.element_at(
        F.map_from_arrays(
            F.lit([int(k) for k in offsets]),
            F.lit([int(offsets[k]) for k in offsets]),
        ),
        F.col("_pid").cast("long"),
    )
    cum = F.sum("rev_cents").over(w_local) + off
    share = cum.cast("double") / F.lit(float(total))
    return part.select(
        "o_custkey", "rev_cents",
        share.alias("cum_share"),
        F.when(share <= 0.80, "A").when(share <= 0.95, "B").otherwise("C").alias("abc_class"),
    )


# --- window_rolling_distinct (r6b2): sliding-window COUNT(DISTINCT) -------
#
# The sliding complement of window_running_distinct: distinct users active
# in the trailing 7 days, per day.  No window can hold distinct state at
# scale; the reformulation is the CONTRIBUTION EXPLODE — each (user, day)
# presence row contributes to the 7 window-end days it falls into (a
# map-side 7× fan-out of the deduped presence set, linear), then one
# distinct-count per end day.  Presence dedup is the only raw-data shuffle.


@register(
    "window_rolling_distinct",
    oracle="""
WITH pres AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
days AS (SELECT DISTINCT d FROM pres),
contrib AS (
  SELECT p.user_id, p.d + CAST(x.i AS INTEGER) AS end_d
    FROM pres p, (SELECT unnest(generate_series(0, 6)) AS i) x
)
SELECT CAST(c.end_d AS VARCHAR) AS d,
       CAST(count(DISTINCT c.user_id) AS BIGINT) AS n_active_7d
  FROM contrib c
 WHERE c.end_d IN (SELECT d FROM days)
 GROUP BY c.end_d
""",
    description="trailing-7-day distinct active users per day via the "
    "contribution-explode reformulation: dedup (user, day) presence (ONE "
    "raw-data shuffle), fan each presence out to the ≤7 window-end days it "
    "covers (map-side, linear), distinct-count per end day over the tiny "
    "day domain — sliding COUNT(DISTINCT) with zero per-frame state; end "
    "days restricted to observed active days so both engines emit the "
    "same calendar; mode='hll' is the registered 100 TB lever (one "
    "datasketches-HLL per day, trailing union over the |days|×7 day-level "
    "sketch table — kills the presences×7 shuffle, same machinery as "
    "window_dau_mau_stickiness(mau='hll'); register-max union is order-"
    "independent, exact path stays the oracle surface)",
)
def window_rolling_distinct(spark, sf_dir, mode="exact"):
    if mode not in ("exact", "hll"):
        raise ValueError(f"mode must be 'exact' or 'hll', got {mode!r}")
    e = load(spark, sf_dir, "events")
    if mode == "hll":
        # the 100 TB lever, sharing window_dau_mau_stickiness(mau='hll')'s
        # shape: the exact path's contribution explode shuffles
        # presences×7 into the per-end-day distinct (linear in presences);
        # here each DAY aggregates one mergeable HLL of its actives in ONE
        # raw-event aggregation (the sketch dedups inherently — no
        # materialized presence dedup), and the trailing-7 union runs over
        # the ×7 fan-out of the DAY-LEVEL sketch table — |days|×7 rows at
        # any corpus size.  Register-max union is order-independent, so
        # the estimate is deterministic; not oracle-checkable (DuckDB's
        # sketch differs), the exact default is the driver-verified
        # surface (agreement tested alongside the DAU/MAU lever).
        daily = (
            e.select(F.to_date("ts").alias("d"), "user_id")
            .groupBy("d")
            .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
        )
        contrib = (
            daily.select("d", "sk")
            .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(6))))
            .select(F.date_add(F.col("d"), F.col("i")).alias("end_d"), "sk")
        )
        days = daily.select(F.col("d").alias("end_d"))
        return (
            contrib.join(days, "end_d", "left_semi")
            .groupBy("end_d")
            .agg(
                F.expr("hll_sketch_estimate(hll_union_agg(sk))")
                .cast("long")
                .alias("n_active_7d")
            )
            .select(F.col("end_d").cast("string").alias("d"), "n_active_7d")
        )
    pres = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    contrib = pres.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        "d",
    ).select("user_id", F.date_add(F.col("d"), F.col("i")).alias("end_d"))
    days = pres.select("d").distinct().withColumnRenamed("d", "end_d")
    return (
        contrib.join(days, "end_d", "left_semi")
        .groupBy("end_d")
        .agg(F.count_distinct(F.col("user_id")).alias("n_active_7d"))
        .select(F.col("end_d").cast("string").alias("d"), "n_active_7d")
    )


# --- timeseries_acf_lags (r6) -----------------------------------------------
#
# Autocorrelation of each event type's daily-revenue series at lags 1-3 —
# the seasonality/momentum diagnostic.  FP discipline: the series is exact
# integer (daily cents DIV 100 — the DIV bounds the moment sums below 2^63
# even at sf10), every moment (S, S2, P_k, A_k, B_k, counts) is an exact
# integer aggregate, and the estimator combines them in ONE fixed
# parenthesization of correctly-rounded IEEE ops — identical on any
# engine/partitioning.  Estimator (x̄ = S/n over the full series):
#   r_k = (((P_k − x̄·A_k) − x̄·B_k) + n_k·x̄²) / (S2 − x̄·S)


@register(
    "timeseries_acf_lags",
    oracle="""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d,
         CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) // 100
              AS BIGINT) AS x
    FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, x,
         lag(x, 1) OVER w AS l1,
         lag(x, 2) OVER w AS l2,
         lag(x, 3) OVER w AS l3
    FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY d)
),
m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(x) AS BIGINT) AS s1,
         CAST(sum(x * x) AS BIGINT) AS s2,
         CAST(sum(CASE WHEN l1 IS NOT NULL THEN x * l1 END) AS BIGINT) AS p1,
         CAST(sum(CASE WHEN l1 IS NOT NULL THEN x END) AS BIGINT) AS a1,
         CAST(sum(l1) AS BIGINT) AS b1,
         CAST(count(l1) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN l2 IS NOT NULL THEN x * l2 END) AS BIGINT) AS p2,
         CAST(sum(CASE WHEN l2 IS NOT NULL THEN x END) AS BIGINT) AS a2,
         CAST(sum(l2) AS BIGINT) AS b2,
         CAST(count(l2) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN l3 IS NOT NULL THEN x * l3 END) AS BIGINT) AS p3,
         CAST(sum(CASE WHEN l3 IS NOT NULL THEN x END) AS BIGINT) AS a3,
         CAST(sum(l3) AS BIGINT) AS b3,
         CAST(count(l3) AS BIGINT) AS n3
    FROM lagged GROUP BY 1
)
SELECT event_type, CAST(lg AS INT) AS lag, n_days, n_pairs,
       CASE WHEN den <> 0.0 THEN num / den END AS acf
  FROM (
    SELECT event_type, u.lg, n_days,
           CASE u.lg WHEN 1 THEN n1 WHEN 2 THEN n2 ELSE n3 END AS n_pairs,
           (((CAST(CASE u.lg WHEN 1 THEN p1 WHEN 2 THEN p2 ELSE p3 END AS DOUBLE)
              - (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE))
                * CAST(CASE u.lg WHEN 1 THEN a1 WHEN 2 THEN a2 ELSE a3 END AS DOUBLE))
             - (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE))
               * CAST(CASE u.lg WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS DOUBLE))
           + CAST(CASE u.lg WHEN 1 THEN n1 WHEN 2 THEN n2 ELSE n3 END AS DOUBLE)
             * ((CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE))
                * (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE)))) AS num,
           CAST(s2 AS DOUBLE)
           - (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE)) * CAST(s1 AS DOUBLE)
             AS den
      FROM m CROSS JOIN (SELECT unnest([1, 2, 3]) AS lg) u
  )
""",
    description="lag-1/2/3 autocorrelation of each event type's daily "
    "revenue series (seasonality/momentum diagnostic): exact-integer daily "
    "series (cents DIV 100 bounds every moment below 2^63 at sf10 — the "
    "spatial-overflow lesson applied up front), one type-keyed window for "
    "the lag columns riding the same shuffle as the moment agg, estimator "
    "combined in ONE fixed parenthesization of IEEE ops — bit-portable, "
    "no tolerance; output is |types|·3 rows from a bounded per-type state",
)
def timeseries_acf_lags(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    daily = (
        e.groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.sum(cents).alias("c"))
        .select("event_type", "d", F.expr("c div 100").alias("x"))
    )
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type",
        "x",
        *[F.lag("x", k).over(w).alias(f"l{k}") for k in (1, 2, 3)],
    )
    aggs = [
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    ]
    for k in (1, 2, 3):
        lk = F.col(f"l{k}")
        aggs += [
            F.sum(F.when(lk.isNotNull(), F.col("x") * lk)).alias(f"p{k}"),
            F.sum(F.when(lk.isNotNull(), F.col("x"))).alias(f"a{k}"),
            F.sum(lk).alias(f"b{k}"),
            F.count(lk).alias(f"n{k}"),
        ]
    m = lagged.groupBy("event_type").agg(*aggs)
    mu = F.col("s1").cast("double") / F.col("n_days").cast("double")
    rows = []
    for k in (1, 2, 3):
        num = (
            (
                F.col(f"p{k}").cast("double")
                - mu * F.col(f"a{k}").cast("double")
            )
            - mu * F.col(f"b{k}").cast("double")
        ) + F.col(f"n{k}").cast("double") * (mu * mu)
        den = F.col("s2").cast("double") - mu * F.col("s1").cast("double")
        rows.append(
            m.select(
                "event_type",
                F.lit(k).cast("int").alias("lag"),
                "n_days",
                F.col(f"n{k}").alias("n_pairs"),
                F.when(den != 0.0, num / den).alias("acf"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# --- window_dau_mau_stickiness (r7) -----------------------------------------
#
# DAU / MAU(28d) engagement ratio per day — the product-analytics
# "stickiness" curve.  Both distinct counts come from the SAME deduped
# (user, day) presence relation (ONE raw-data shuffle); the trailing-28-day
# distinct uses the contribution-explode reformulation proven by
# window_rolling_distinct (each presence fans out map-side to the ≤28
# window-end days it covers — no per-frame distinct state, linear in
# presences at any corpus size), and DAU is a plain count over the already-
# distinct presences.  The ratio is ONE IEEE division of two exact integers
# (bit-portable).  End days restricted to observed active days so both
# engines emit the same calendar.


@register(
    "window_dau_mau_stickiness",
    oracle="""
WITH pres AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
days AS (SELECT DISTINCT d FROM pres),
dau AS (
  SELECT d, CAST(count(*) AS BIGINT) AS dau FROM pres GROUP BY d
),
contrib AS (
  SELECT p.user_id, p.d + CAST(x.i AS INTEGER) AS end_d
    FROM pres p, (SELECT unnest(generate_series(0, 27)) AS i) x
),
mau AS (
  SELECT c.end_d AS d, CAST(count(DISTINCT c.user_id) AS BIGINT) AS mau_28
    FROM contrib c
   WHERE c.end_d IN (SELECT d FROM days)
   GROUP BY c.end_d
)
SELECT CAST(dau.d AS VARCHAR) AS d, dau.dau, mau.mau_28,
       CAST(dau.dau AS DOUBLE) / CAST(mau.mau_28 AS DOUBLE) AS stickiness
  FROM dau JOIN mau ON dau.d = mau.d
""",
    description="DAU/MAU(28d) stickiness per day: dedup (user, day) presence "
    "once (ONE raw-data shuffle), DAU = plain per-day count of the distinct "
    "presences, trailing-28-day MAU via the contribution-explode "
    "reformulation (map-side fan-out to ≤28 window-end days, distinct-count "
    "over the tiny day domain — zero per-frame distinct state), stickiness "
    "= ONE IEEE division of the two exact integers; the DAU and MAU "
    "aggregates join on the bounded day domain; mau='hll' is the "
    "registered 100 TB lever (one datasketches-HLL per day, trailing "
    "union over the |days|×28 day-level sketch table — kills the "
    "presences×28 shuffle, register-max union is order-independent; "
    "±~2 %% agreement tested, exact path stays the oracle surface)",
)
def window_dau_mau_stickiness(spark, sf_dir, mau="exact"):
    if mau not in ("exact", "hll"):
        raise ValueError(f"mau must be 'exact' or 'hll', got {mau!r}")
    e = load(spark, sf_dir, "events")
    pres = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    if mau == "hll":
        # the 100 TB lever: the exact path shuffles presences×28 into the
        # per-end-day distinct (linear in presences — 17.6 s at sf10);
        # here each DAY aggregates one mergeable datasketches-HLL of its
        # actives (one pass over presences), and the trailing-28 union
        # runs over the ×28 fan-out of the DAY-LEVEL sketch table —
        # |days|×28 rows at any corpus size.  HLL register-max union is
        # order-independent, so the estimate is deterministic; not
        # oracle-checkable (DuckDB's sketch differs), the exact default
        # is the driver-verified surface (±~2 % agreement tested).
        # no materialized presence-dedup here: the sketch dedups
        # inherently and count_distinct dedups in-agg, so BOTH come from
        # ONE aggregation of raw events (the exact path's pres.distinct()
        # was the dominant sf10 cost, shared for no reason)
        daily = (
            e.select(F.to_date("ts").alias("d"), "user_id")
            .groupBy("d")
            .agg(
                F.count_distinct("user_id").cast("long").alias("dau"),
                F.expr("hll_sketch_agg(user_id)").alias("sk"),
            )
        )
        contrib = (
            daily.select("d", "sk")
            .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(27))))
            .select(F.date_add(F.col("d"), F.col("i")).alias("end_d"), "sk")
        )
        days = daily.select(F.col("d").alias("end_d"))
        mau_df = (
            contrib.join(days, "end_d", "left_semi")
            .groupBy("end_d")
            .agg(
                F.expr("hll_sketch_estimate(hll_union_agg(sk))")
                .cast("long")
                .alias("mau_28")
            )
            .withColumnRenamed("end_d", "d")
        )
        return daily.select("d", "dau").join(mau_df, "d").select(
            F.col("d").cast("string").alias("d"),
            "dau",
            "mau_28",
            (
                F.col("dau").cast("double") / F.col("mau_28").cast("double")
            ).alias("stickiness"),
        )
    dau = pres.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    contrib = pres.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(27))).alias("i"),
        "d",
    ).select("user_id", F.date_add(F.col("d"), F.col("i")).alias("end_d"))
    days = pres.select("d").distinct().withColumnRenamed("d", "end_d")
    mau = (
        contrib.join(days, "end_d", "left_semi")
        .groupBy("end_d")
        .agg(F.count_distinct(F.col("user_id")).alias("mau_28"))
        .withColumnRenamed("end_d", "d")
    )
    return dau.join(mau, "d").select(
        F.col("d").cast("string").alias("d"),
        "dau",
        "mau_28",
        (F.col("dau").cast("double") / F.col("mau_28").cast("double")).alias(
            "stickiness"
        ),
    )


# --- timeseries_seasonal_strength (r7) ---------------------------------------
#
# Variance-ratio seasonal strength per event type: 1 − SSW/SST where the
# seasonal component is the hour-of-week cell mean (timeseries_seasonal_
# profile's decomposition) — the STL-style "how much of the series variance
# the seasonal pattern explains" statistic.  Cross-engine determinism comes
# from rounding every mean to INTEGER cents with floor-division (values are
# non-negative cents, so DuckDB `//` and Spark `div` agree): with integer
# means, SSW = Σ_g (Q_g − 2·m̂_g·S_g + n_g·m̂_g²) and SST = Q − 2·m̂·S + n·m̂²
# are EXACT int64 sums — no order-dependent FP accumulation across the 168
# cells — and the strength is ONE IEEE division of two exact integers.
# Overflow bound: terms ≤ 4·n·C² for C = max cents; at sf10 (n≈1e7, C≈1e5)
# that is ~4e17 ≪ 2^63.  Plan: ONE map-side-combined (type, how) agg
# shuffle over raw events; everything after runs on the |types|×168 cell
# relation.


@register(
    "timeseries_seasonal_strength",
    oracle="""
WITH c AS (
  SELECT event_type,
         CAST((epoch_us(ts) // 3600000000) % 168 AS BIGINT) AS how,
         CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS s_g,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                  * CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS q_g
    FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type, n_g, s_g, q_g,
         (2 * s_g + n_g) // (2 * n_g) AS mhat_g
    FROM c
),
t AS (
  SELECT event_type,
         CAST(sum(n_g) AS BIGINT) AS n,
         CAST(sum(s_g) AS BIGINT) AS s,
         CAST(sum(q_g) AS BIGINT) AS q,
         CAST(sum(q_g - 2 * mhat_g * s_g + n_g * mhat_g * mhat_g) AS BIGINT)
           AS ssw
    FROM m GROUP BY event_type
),
f AS (
  SELECT event_type, n, ssw,
         CAST(q - 2 * ((2 * s + n) // (2 * n)) * s
                + n * ((2 * s + n) // (2 * n)) * ((2 * s + n) // (2 * n))
              AS BIGINT) AS sst
    FROM t
)
SELECT event_type, n, sst, ssw,
       CASE WHEN sst <= 0 THEN 0.0
            ELSE CAST(sst - ssw AS DOUBLE) / CAST(sst AS DOUBLE) END
         AS seasonal_strength
  FROM f
""",
    description="variance-ratio seasonal strength per event type (1 − "
    "SSW/SST with hour-of-week cell means as the seasonal component — the "
    "STL-style explained-variance statistic): seasonal means rounded to "
    "integer cents by floor-division so SSW and SST are EXACT int64 moment "
    "sums (zero order-dependent FP accumulation across the 168 cells; "
    "terms bounded ≤4·n·C² ≪ 2^63 at sf10), strength = ONE IEEE division "
    "of the two exact integers; ONE map-side-combined (type, hour-of-week) "
    "agg shuffle, everything downstream on the |types|×168 cell relation",
)
def timeseries_seasonal_strength(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    how = (
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000") % 168
    ).alias("how")
    cells = e.groupBy("event_type", how).agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(cents).alias("s_g"),
        F.sum(cents * cents).alias("q_g"),
    )
    m = cells.withColumn("mhat_g", F.expr("(2 * s_g + n_g) div (2 * n_g)"))
    t = m.groupBy("event_type").agg(
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("q_g").alias("q"),
        F.sum(
            F.expr("q_g - 2 * mhat_g * s_g + n_g * mhat_g * mhat_g")
        ).alias("ssw"),
    )
    f = t.select(
        "event_type",
        "n",
        "ssw",
        F.expr(
            "q - 2 * ((2 * s + n) div (2 * n)) * s"
            " + n * ((2 * s + n) div (2 * n)) * ((2 * s + n) div (2 * n))"
        ).alias("sst"),
    )
    strength = F.when(F.col("sst") <= 0, F.lit(0.0)).otherwise(
        (F.col("sst") - F.col("ssw")).cast("double")
        / F.col("sst").cast("double")
    )
    return f.select(
        "event_type", "n", "sst", "ssw", strength.alias("seasonal_strength")
    )


# --- window_interval_stabbing (r7b2) ------------------------------------------
#
# The interval-stabbing / backlog question ("how many intervals are open on
# day d?") evaluated the scale-safe way: NEVER a day×interval range join —
# each interval contributes a +1 delta at its open day and a −1 at its
# close day (exclusive), deltas aggregate per day (ONE map-side-combined
# shuffle, |days| rows out), and the open count is the running sum over the
# bounded calendar domain.  Intervals are derived deterministically from
# lineitem (open = ship day, span = 1 + l_partkey % 28 days) because the
# corpus carries no native close column — same derived-input precedent as
# the spatial family's coordinates.


@register(
    "window_interval_stabbing",
    oracle="""
WITH iv AS (
  SELECT CAST(l_shipdate AS DATE) AS d0,
         CAST(l_shipdate AS DATE) + CAST(1 + l_partkey % 28 AS INTEGER) AS d1
    FROM lineitem
),
deltas AS (
  SELECT d0 AS d, CAST(1 AS BIGINT) AS delta FROM iv
  UNION ALL
  SELECT d1 AS d, CAST(-1 AS BIGINT) AS delta FROM iv
),
per AS (SELECT d, CAST(sum(delta) AS BIGINT) AS day_delta FROM deltas GROUP BY d)
SELECT CAST(d AS VARCHAR) AS d, day_delta,
       CAST(sum(day_delta) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS open_count
  FROM per
""",
    description="interval stabbing / backlog curve: open-interval count per "
    "day via the event-delta reformulation (+1 at open day, −1 at exclusive "
    "close day) — ONE map-side-combined day aggregation over 2 rows per "
    "interval, then a running sum over the BOUNDED calendar domain; never "
    "a day×interval range join (which is |days|·|intervals| at 100 TB); "
    "exact integers throughout, intervals derived deterministically from "
    "lineitem (span = 1 + l_partkey % 28 days)",
)
def window_interval_stabbing(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    d0 = F.to_date("l_shipdate")
    span = (F.lit(1) + F.col("l_partkey") % 28).cast("int")
    opens = li.select(d0.alias("d"), F.lit(1).cast("long").alias("delta"))
    closes = li.select(
        F.date_add(d0, span).alias("d"), F.lit(-1).cast("long").alias("delta")
    )
    per = (
        opens.unionByName(closes)
        .groupBy("d")
        .agg(F.sum("delta").alias("day_delta"))
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        F.col("d").cast("string").alias("d"),
        "day_delta",
        F.sum("day_delta").over(w).alias("open_count"),
    )


# --- timeseries_seasonal_mad_outliers (r8b2) ---------------------------------
#
# Seasonally-adjusted robust anomaly detection — the production-monitoring
# refinement of events_anomaly_mad: remove the hour-of-week expectation
# BEFORE flagging, so a quiet overnight hour is not "anomalous" merely for
# being overnight and a spike during a busy hour is not hidden by it.
# Residual = integer cents − integer cell mean (timeseries_seasonal_
# strength's floor-div m̂_g recipe — non-negative cents, so DuckDB `//`
# and Spark `div` agree), then per-type median/MAD over the residuals via
# the explicit window-rank median (events_anomaly_mad's _MED_PICK
# pattern: exact integer ranks, the final median is avg of ≤2 integers —
# a dyadic rational, bit-identical in both engines), and the flag
# compares |resid − med| > 3·MAD with dyadic values only.
#
# Scale: one (type, how) cell agg (map-side combined) + broadcast of the
# ≤|types|×168 cell means back onto events, then the two value-ordered
# rank windows per type that the MAD definition requires — the same
# global-order-per-type posture as events_anomaly_mad (a sketch-quantile
# lever would replace the exact median at 100 TB; the exact form is the
# oracle surface).


@register(
    "timeseries_seasonal_mad_outliers",
    oracle="""
WITH c AS (
  SELECT event_type,
         CAST((epoch_us(ts) // 3600000000) % 168 AS BIGINT) AS how,
         CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS s_g
    FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type, how, (2 * s_g + n_g) // (2 * n_g) AS mhat_g FROM c
),
r AS (
  SELECT e.event_id, e.event_type,
         CAST((epoch_us(e.ts) // 3600000000) % 168 AS BIGINT) AS how,
         CAST(floor(e.value * 100.0 + 0.5) AS BIGINT) - m.mhat_g AS resid
    FROM events e
    JOIN m ON m.event_type = e.event_type
          AND m.how = CAST((epoch_us(e.ts) // 3600000000) % 168 AS BIGINT)
),
r1 AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type ORDER BY resid, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS cnt
    FROM r
),
med AS (
  SELECT event_type,
         avg(resid) FILTER (rn >= (cnt + 1) // 2 AND rn <= (cnt + 2) // 2) AS med
    FROM r1 GROUP BY event_type
),
d AS (
  SELECT r.event_id, r.event_type, r.how, r.resid, med.med,
         abs(r.resid - med.med) AS dev
    FROM r JOIN med USING (event_type)
),
r2 AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS cnt
    FROM d
),
mad AS (
  SELECT event_type,
         avg(dev) FILTER (rn >= (cnt + 1) // 2 AND rn <= (cnt + 2) // 2) AS mad
    FROM r2 GROUP BY event_type
)
SELECT d.event_id, d.event_type, d.how, d.resid, d.med, mad.mad,
       (d.dev > (3.0 * mad.mad)) AS is_anomaly
  FROM d JOIN mad USING (event_type)
""",
    description="seasonally-adjusted robust anomaly flags: residual = "
    "integer cents − hour-of-week integer cell mean (floor-div — both "
    "engines agree), per-type median/MAD of residuals via explicit "
    "window-rank medians (dyadic-exact), flag |resid−med| > 3·MAD — the "
    "monitoring op that neither hides busy-hour spikes nor flags quiet "
    "overnight hours; one cell agg + broadcast means + the two "
    "value-ordered rank windows the exact MAD requires (sketch quantiles "
    "are the 100 TB lever; exact stays the oracle surface)",
)
def timeseries_seasonal_mad_outliers(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    how = (
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000") % 168
    ).alias("how")
    cells = e.groupBy("event_type", how).agg(
        F.count(F.lit(1)).alias("n_g"), F.sum(cents).alias("s_g")
    )
    m = cells.select(
        "event_type",
        "how",
        F.expr("(2 * s_g + n_g) div (2 * n_g)").alias("mhat_g"),
    )
    r = (
        e.select(
            "event_id", "event_type", how, cents.alias("cents")
        )
        .join(F.broadcast(m), ["event_type", "how"])
        .select(
            "event_id",
            "event_type",
            "how",
            (F.col("cents") - F.col("mhat_g")).alias("resid"),
        )
    )
    wt = Window.partitionBy("event_type")
    w1 = wt.orderBy("resid", "event_id")
    r1 = r.select(
        "*",
        F.row_number().over(w1).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("cnt"),
    )
    pick = (F.col("rn") >= F.expr("(cnt + 1) div 2")) & (
        F.col("rn") <= F.expr("(cnt + 2) div 2")
    )
    med = r1.groupBy("event_type").agg(
        F.avg(F.when(pick, F.col("resid"))).alias("med")
    )
    d = r.join(med, "event_type").select(
        "event_id",
        "event_type",
        "how",
        "resid",
        "med",
        F.abs(F.col("resid") - F.col("med")).alias("dev"),
    )
    w2 = wt.orderBy("dev", "event_id")
    r2 = d.select(
        "*",
        F.row_number().over(w2).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("cnt"),
    )
    mad = r2.groupBy("event_type").agg(
        F.avg(F.when(pick, F.col("dev"))).alias("mad")
    )
    return d.join(mad, "event_type").select(
        "event_id",
        "event_type",
        "how",
        "resid",
        "med",
        "mad",
        (F.col("dev") > 3.0 * F.col("mad")).alias("is_anomaly"),
    )
