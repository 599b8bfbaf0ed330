"""TPC-H-style analytics smoke queries (SURVEY.md §5.4) — exercise the
join/aggregation/window surface the merge engine is built from, and serve as
the bench headliners.

FP determinism: every sum over doubles goes through exact DECIMAL
accumulation (order-independent) and is cast back to double at the end.  The
corpus's monetary columns are exact 2-decimal values (verified), so products
of two/three such values are exact at 4/6 decimals — DECIMAL(18,4)/(18,6)
represents them exactly and both engines round the (bit-identical) double
products to the same decimal.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sparkmerge.queries import load, register


def _dec_sum(col, scale: int):
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def _cents_sum(col, scale: int):
    """Exact long-cents aggregation of an exact ``scale``-decimal product,
    converted by the single-rounding decimal shift (tpch_q1's r10/r11
    discipline): bit-identical to ``_dec_sum`` while per-group integer
    totals stay inside int64, and ~1.2-5× cheaper because the per-row sum
    stays in the long fast path instead of Spark's widened-decimal
    accumulator.  Promote an op from _dec_sum only with a measured win
    (q3 measured NO win — join-dominated — and keeps _dec_sum)."""
    from decimal import Decimal as _D

    c = F.floor(col * F.lit(float(10**scale)) + F.lit(0.5)).cast("long")
    return (F.sum(c).cast("decimal(38,0)") * F.lit(_D(f"1E-{scale}"))).cast("double")


@register(
    "tpch_q1",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
  FROM lineitem
 WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
 GROUP BY l_returnflag, l_linestatus
""",
    description="TPC-H Q1 pricing summary: wide aggregation over lineitem",
)
def tpch_q1(spark, sf_dir):
    """Exact LONG-CENTS aggregation (r10): the r9 verdict flagged this op
    at ~12.6× of DuckDB at sf10; profiling showed the cost was Spark's
    decimal sum path (sum(decimal(18,s)) widens to decimal(28,s) —
    Int128/BigDecimal arithmetic outside the fast long aggregator).  The
    monetary inputs are exact 2-decimal values (module docstring), so
    every sum here is an exact integer sum of scaled longs producing the
    IDENTICAL rational — and therefore the identical final double — as
    the decimal formulation the DuckDB oracle still runs (A/B measured
    sf10 5.40 → 0.95 s, outputs bit-equal; BASELINE.md round-10).

    Overflow budget, 60-billion-row scale: scale-2 sums peak ~2.3e14 per
    1e8 rows — safe in int64 to sf1000+.  The scale-6 charge sum would
    cross int64 near sf40, so it aggregates as a hi/lo SPLIT (div/mod
    1e9) recombined exactly in decimal(38,0) on the ≤4 output rows —
    decimal math on the result grain, never in the per-row hot path."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.expr("TIMESTAMP '1998-09-02 00:00:00'")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))

    def cents(col, scale):
        # floor(x·10^s + 0.5): the house exact-cents recipe — total FP
        # error of the double product is ≪ 0.5 ulp-at-integer-grain, so
        # this recovers the exact scaled integer
        return F.floor(col * F.lit(float(10**scale)) + F.lit(0.5)).cast("long")

    c6 = cents(charge, 6)
    n = F.count(F.lit(1))
    from decimal import Decimal as _D

    def shifted(sum_long, scale):
        # long sum is EXACT (int64 budget per docstring); one exact cast to
        # decimal(38,0), one exact scale shift, ONE double cast — the same
        # single-rounding discipline as sum_charge.  A long→double cast
        # followed by a double division rounds TWICE once the integer total
        # crosses 2^53 (scale-4 disc totals get there near sf33) and can
        # drift a ulp from the oracle's single decimal→double rounding.
        return (sum_long.cast("decimal(38,0)") * F.lit(_D(f"1E-{scale}"))).cast(
            "double"
        )

    qty = F.sum(cents(F.col("l_quantity"), 2))
    base = F.sum(cents(F.col("l_extendedprice"), 2))
    disc4 = F.sum(cents(disc_price, 4))
    dsc2 = F.sum(cents(F.col("l_discount"), 2))
    # exact scale-6 integer total (hi/lo recombined in decimal), then ONE
    # decimal scale shift (×1e-6 is exact at scale 6) and ONE double cast:
    # the charge total crosses 2^53 already at sf0.1, so a long→double
    # cast followed by /1e6 would double-round and drift a ulp from the
    # oracle's single decimal→double rounding
    charge_exact = (
        F.sum(F.expr("_c6 div 1000000000")).cast("decimal(38,0)")
        * F.lit(1000000000)
        + F.sum(F.expr("_c6 % 1000000000")).cast("decimal(38,0)")
    )
    sum_charge = (charge_exact * F.lit(_D("0.000001"))).cast("double")
    nd = n.cast("double")
    return (
        li.withColumn("_c6", c6)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            shifted(qty, 2).alias("sum_qty"),
            shifted(base, 2).alias("sum_base_price"),
            shifted(disc4, 4).alias("sum_disc_price"),
            sum_charge.alias("sum_charge"),
            (shifted(qty, 2) / nd).alias("avg_qty"),
            (shifted(base, 2) / nd).alias("avg_price"),
            (shifted(dsc2, 2) / nd).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "tpch_q3",
    oracle="""
SELECT o.o_orderkey,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       o.o_orderdate, o.o_orderpriority
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
 WHERE c.c_mktsegment = 'BUILDING'
   AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
   AND l.l_shipdate > TIMESTAMP '1996-06-01 00:00:00'
 GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
 ORDER BY revenue DESC, o_orderkey
 LIMIT 10
""",
    description="TPC-H Q3 shipping priority: 3-way join, agg, deterministic top-10",
)
def tpch_q3(spark, sf_dir):
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.expr("TIMESTAMP '1997-01-01 00:00:00'")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.expr("TIMESTAMP '1996-06-01 00:00:00'")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dec_sum(revenue, 4).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# tpch_q5's supplier-broadcast gate (r12 verdict #2): the ASIA semi-join
# keeps ~20 % of supplier projected to two int columns, so while the
# supplier table's parquet file is under this size the hinted build side is
# a few MB at most — within Spark's own 10 MiB default
# autoBroadcastJoinThreshold, i.e. the hint only forces what a stats-aware
# planner would choose anyway (64 MiB of supplier parquet ≈ ~3M rows ≈
# ~9 MB projected build side).  Past the gate the hint comes off entirely
# and the scale profile's AQE picks the join from runtime stats, so a
# corpus-growing supplier can never be forced into a driver-OOM broadcast.
_Q5_SUPPLIER_BCAST_MAX_BYTES = 64 * 1024**2


def _q5_supplier_broadcastable(sf_dir: str) -> bool:
    try:
        size = os.path.getsize(os.path.join(sf_dir, "supplier.parquet"))
    except OSError:
        return False  # unknown size: never force a broadcast
    return size <= _Q5_SUPPLIER_BCAST_MAX_BYTES


@register(
    "tpch_q5",
    oracle="""
SELECT n.n_name,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
 WHERE r.r_name = 'ASIA'
   AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
   AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
 GROUP BY n.n_name
""",
    description="TPC-H Q5 local-supplier volume: 6-way join with broadcast dims",
)
def tpch_q5(spark, sf_dir):
    # Plan: push the ASIA selectivity (~20 % of nations) BELOW the two big
    # shuffles.  Catalyst will not reorder the joins without CBO stats, so the
    # written order IS the plan: broadcast the 5-row ASIA nation set, filter
    # supplier and customer by it map-side, filter lineitem by the ASIA
    # supplier set via a broadcast join that carries (s_nationkey, n_name)
    # onto the lineitem side — s_suppkey is unique, so this join cannot fan
    # out.  Only the ~20 %-width lineitem then shuffles on l_orderkey, and
    # the customer join shuffles on custkey with the c_nationkey =
    # s_nationkey residual applied in the same exchange.  The SHAPE (filter
    # lineitem below its only exchange) carries to any scale — the
    # difference between shuffling the full lineitem table and a fifth of
    # it (measured 10.68 s -> see BASELINE.md round-11 for the A/B).  The
    # hard F.broadcast(s_asia) HINT does not (ADVICE r11 / r12 verdict #2):
    # s_asia is ~20 % of supplier and grows linearly with the corpus, so it
    # is SIZE-GATED (_q5_supplier_broadcastable below) — hinted while the
    # supplier table is provably small enough that a stats-aware planner
    # would broadcast it anyway (the hint only matters under the lean
    # sf0.1 profile, which runs AQE-off and would otherwise SMJ lineitem
    # on l_suppkey), unhinted past the gate so AQE is free to pick the
    # join from runtime stats and a 100 TB supplier can never be forced
    # into a driver-OOM broadcast.
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1996-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP '1998-01-01 00:00:00'"))
    )
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select("n_nationkey", "n_name")
    s_asia = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(asia_nations.select("n_nationkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_nationkey")
    )
    c_asia = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(asia_nations.select("n_nationkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("c_custkey", "c_nationkey")
    )
    s_build = F.broadcast(s_asia) if _q5_supplier_broadcastable(sf_dir) else s_asia
    li_asia = load(spark, sf_dir, "lineitem").join(
        s_build, F.col("l_suppkey") == F.col("s_suppkey")
    )
    # Shrink orders by the ASIA customer set BEFORE the big orderkey shuffle
    # (date filter ~30 % × ASIA ~20 % ≈ 6 % of orders reach the SMJ).  At
    # sf10 AQE broadcasts c_asia; at 100 TB this is a custkey shuffle of the
    # pre-join orders — still cheaper than shuffling the post-join lineitem
    # result on custkey.
    o_asia = o.join(c_asia, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "c_nationkey"
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # Group on the int nationkey (narrow shuffle rows) and attach the 25-row
    # name map after the 5-row aggregate.
    return (
        li_asia.join(
            o_asia,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("s_nationkey")
        .agg(_dec_sum(revenue, 4).alias("revenue"))
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "revenue")
    )


@register(
    "tpch_q6",
    oracle="""
SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
  FROM lineitem
 WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
   AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
   AND l_discount BETWEEN 0.03 AND 0.07
   AND l_quantity < 24.0
""",
    description="TPC-H Q6 revenue forecast: scan-heavy filter + single agg",
)
def tpch_q6(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP '1996-01-01 00:00:00'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP '1997-01-01 00:00:00'"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(_dec_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"))
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
  FROM orders
 GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    description="rollup/grouping-sets aggregation (Catalyst built-in surface)",
)
def agg_grouping_sets(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), _dec_sum(F.col("o_totalprice"), 2).alias("total")
    )


@register(
    "pivot_wide",
    oracle="""
SELECT o_orderpriority,
       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS F,
       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS O,
       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS P
  FROM orders GROUP BY o_orderpriority
""",
    description="pivot: long->wide order counts by status (groupBy().pivot())",
)
def pivot_wide(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


@register(
    "agg_percentiles",
    oracle="""
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       min(o_totalprice) AS lo,
       max(o_totalprice) AS hi
  FROM orders GROUP BY o_orderstatus
""",
    description="exact percentile aggregation (Spark percentile == DuckDB "
    "quantile_cont: linear interpolation between exact 2-decimal values is a "
    "single IEEE midpoint op, bit-deterministic)",
)
def agg_percentiles(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@register(
    "tpch_q10",
    oracle="""
SELECT c.c_custkey, c.c_name,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       n.n_name
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
 WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
   AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
   AND l.l_returnflag = 'R'
 GROUP BY c.c_custkey, c.c_name, n.n_name
 ORDER BY revenue DESC, c_custkey
 LIMIT 20
""",
    description="TPC-H Q10 returned-item reporting: 4-way join, agg, deterministic top-20",
)
def tpch_q10(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1996-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP '1996-07-01 00:00:00'"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dec_sum(revenue, 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q18",
    oracle="""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
 WHERE o.o_orderkey IN (
         SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey
         HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
       )
 GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
""",
    description="TPC-H Q18 large-volume customers: IN-subquery with HAVING (left-semi join)",
)
def tpch_q18(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dec_sum(F.col("l_quantity"), 2).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(big.withColumnRenamed("l_orderkey", "b_orderkey"),
              F.col("o_orderkey") == F.col("b_orderkey"), "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_dec_sum(F.col("l_quantity"), 2).alias("total_qty"))
    )


@register(
    "tpch_q14",
    oracle="""
SELECT 100.0 * CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                    THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE)
       AS promo_revenue
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
 WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
   AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
""",
    description="TPC-H Q14 promotion effect: conditional decimal aggregation over a broadcast join",
)
def tpch_q14(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP '1996-03-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP '1996-04-01 00:00:00'"))
    )
    p = load(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (100.0 * F.sum(promo).cast("double") / F.sum(rev).cast("double")).alias(
                "promo_revenue"
            )
        )
    )


@register(
    "tpch_q4_style",
    oracle="""
SELECT o.o_orderpriority, count(*) AS order_count
  FROM orders o
 WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
   AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
   AND EXISTS (SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
 GROUP BY o.o_orderpriority
""",
    description="TPC-H Q4-style order-priority checking: correlated EXISTS "
    "(left-semi join) + agg; ship-after-order stands in for the "
    "commit/receipt columns the corpus lacks",
)
def tpch_q4_style(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1996-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP '1996-07-01 00:00:00'"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q16_style",
    oracle="""
SELECT p.p_brand, p.p_type, CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
  FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
 WHERE p.p_size >= 25
 GROUP BY p.p_brand, p.p_type
""",
    description="TPC-H Q16-style parts/supplier relationship: distinct-count "
    "after a broadcast join (lineitem stands in for partsupp)",
)
def tpch_q16_style(spark, sf_dir):
    p = load(spark, sf_dir, "part").filter(F.col("p_size") >= 25)
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q7",
    oracle="""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
  FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
     WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
       AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                            AND TIMESTAMP '1996-12-31 00:00:00'
  ) shipping
 GROUP BY supp_nation, cust_nation, l_year
""",
    description="TPC-H Q7 volume shipping: dual-nation join with disjunctive "
    "nation pairing, year extraction, decimal revenue",
)
def tpch_q7(spark, sf_dir):
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP '1995-01-01 00:00:00'"))
        & (F.col("l_shipdate") <= F.expr("TIMESTAMP '1996-12-31 00:00:00'"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_dec_sum(volume, 4).alias("revenue"))
    )


@register(
    "tpch_q8",
    oracle="""
SELECT o_year,
       CAST(sum(CASE WHEN nation = 'NATION_3' THEN CAST(volume AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share
  FROM (
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           l.l_extendedprice * (1 - l.l_discount) AS volume,
           n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
     WHERE r.r_name = 'AMERICA'
       AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                             AND TIMESTAMP '1996-12-31 00:00:00'
       AND p.p_type = 'ECONOMY'
  ) all_nations
 GROUP BY o_year
""",
    description="TPC-H Q8 national market share: 8-way join, conditional "
    "decimal share per year (single IEEE division of two exact sums)",
)
def tpch_q8(spark, sf_dir):
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1995-01-01 00:00:00'"))
        & (F.col("o_orderdate") <= F.expr("TIMESTAMP '1996-12-31 00:00:00'"))
    )
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    brazil = F.when(F.col("nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(brazil).cast("double") / F.sum(vol).cast("double")).alias("mkt_share")
        )
    )


@register(
    "tpch_q13",
    oracle="""
SELECT c_count, count(*) AS custdist FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                      AND o.o_orderpriority <> '1-URGENT'
   GROUP BY c.c_custkey) c_orders
 GROUP BY c_count
""",
    description="TPC-H Q13 customer order distribution: left outer join with "
    "join-side predicate, double aggregation",
)
def tpch_q13(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q19_style",
    oracle="""
SELECT CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
 WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
        AND l.l_quantity >= 1 AND l.l_quantity <= 11)
    OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
        AND l.l_quantity >= 10 AND l.l_quantity <= 20)
    OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
        AND l.l_quantity >= 20 AND l.l_quantity <= 30)
""",
    description="TPC-H Q19-style discounted revenue: disjunctive multi-clause "
    "join predicate (brand/size/quantity triplets; corpus lacks p_container)",
)
def tpch_q19_style(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    q = F.col("l_quantity")
    clause = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & (q >= 20) & (q <= 30))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(clause)
        .agg(_dec_sum(rev, 4).alias("revenue"))
    )


@register(
    "tpch_q22_style",
    oracle="""
WITH avg_bal AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS v
    FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey, count(*) AS numcust,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
  FROM customer c, avg_bal
 WHERE c.c_acctbal > avg_bal.v
   AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                     AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
 GROUP BY c.c_nationkey
""",
    description="TPC-H Q22-style global sales opportunity: scalar-average "
    "subquery + anti join against recent orders (every corpus customer has at least one order, so recency scopes the anti join; corpus lacks c_phone — nationkey "
    "stands in for the phone country code)",
)
def tpch_q22_style(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        (_dec_sum(F.col("c_acctbal"), 2) / F.count(F.lit(1))).alias("v")
    )
    return (
        c.join(F.broadcast(pos))
        .filter(F.col("c_acctbal") > F.col("v"))
        .join(
            o.filter(F.col("o_orderdate") >= F.expr("TIMESTAMP '2000-01-01 00:00:00'")),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dec_sum(F.col("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "tpch_q2_style",
    oracle="""
WITH ps AS (
  SELECT l.l_partkey AS p_key, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name,
         min(l.l_extendedprice / l.l_quantity) AS unit_cost
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
   WHERE r.r_name = 'EUROPE'
   GROUP BY l.l_partkey, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
),
best AS (SELECT p_key, min(unit_cost) AS best_cost FROM ps GROUP BY p_key)
SELECT ps.s_acctbal, ps.s_name, ps.n_name, p.p_partkey, p.p_type,
       ps.s_suppkey, ps.unit_cost
  FROM ps
  JOIN best ON ps.p_key = best.p_key AND ps.unit_cost = best.best_cost
  JOIN part p ON p.p_partkey = ps.p_key
 WHERE p.p_size <= 25 AND p.p_type = 'LARGE'
 ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
 LIMIT 100
""",
    description="TPC-H Q2-style minimum-cost supplier: corpus has no partsupp, "
    "so supply cost is the observed min unit price (l_extendedprice/l_quantity "
    "— single IEEE division, bit-deterministic) per (part, supplier) within "
    "region EUROPE; window-min per part replaces the correlated subquery",
)
def tpch_q2_style(spark, sf_dir):
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 25) & (F.col("p_type") == "LARGE")
    )
    ps = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("l_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        ps.withColumn("best_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("best_cost"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
                "s_suppkey", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey", "s_suppkey")
        .limit(100)
    )


@register(
    "tpch_q9_style",
    oracle="""
SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE)
       - 0.1 * CAST(sum(CAST(p.p_retailprice * l.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
       AS sum_profit
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
 WHERE p.p_name LIKE '%red%'
 GROUP BY n.n_name, year(o.o_orderdate)
""",
    description="TPC-H Q9-style product-type profit by nation/year: corpus has "
    "no ps_supplycost, so cost is proxied as 10% of p_retailprice*l_quantity; "
    "two exact decimal sums combined with two mirrored IEEE double ops",
)
def tpch_q9_style(spark, sf_dir):
    """Long-cents promotion (r11, q1's template): both revenue and cost are
    exact 4-decimal products of exact 2-decimal inputs, so each sum
    aggregates as exact scale-4 long cents and converts via the
    single-rounding decimal shift — bit-identical to the decimal oracle
    (verified at sf10) and A/B-measured 3.98 → 3.20 s there (interleaved
    5-rep medians, BASELINE.md round-11).  Overflow budget: per-group
    scale-4 totals are ~1.7e15 at sf1000 (bounded 25×7 lattice) — int64
    safe; the totals cross 2^53 near sf40, which is why the conversion
    goes through decimal, not a double division."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cost = F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_cents_sum(rev, 4).alias("_r"), _cents_sum(cost, 4).alias("_c"))
        .select("nation", "o_year",
                (F.col("_r") - 0.1 * F.col("_c")).alias("sum_profit"))
    )


@register(
    "tpch_q11_style",
    oracle="""
WITH v AS (
  SELECT l.l_partkey AS partkey,
         sum(CAST(l.l_extendedprice * l.l_quantity AS DECIMAL(18,4))) AS val
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
   WHERE n.n_name = 'NATION_7'
   GROUP BY l.l_partkey
),
t AS (SELECT sum(val) AS total FROM v)
SELECT v.partkey, CAST(v.val AS DOUBLE) AS part_value
  FROM v, t
 WHERE v.val * 1000 > t.total
""",
    description="TPC-H Q11-style important stock: corpus has no partsupp, so "
    "per-part value is shipped l_extendedprice*l_quantity from one nation's "
    "suppliers; the >fraction-of-total HAVING is exact decimal (val*1000 > "
    "total), scalar total via broadcast cross join",
)
def tpch_q11_style(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    val = (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(18,4)")
    v = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(val).alias("val"))
    )
    t = v.agg(F.sum("val").alias("total"))
    return (
        v.join(F.broadcast(t))
        .filter(F.col("val") * 1000 > F.col("total"))
        .select("partkey", F.col("val").cast("double").alias("part_value"))
    )


@register(
    "tpch_q12_style",
    oracle="""
SELECT l.l_returnflag AS ship_class,
       count(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END)
         AS high_line_count,
       count(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END)
         AS low_line_count
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
 WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
   AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
   AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
 GROUP BY l.l_returnflag
""",
    description="TPC-H Q12-style shipping priority counts: corpus has no "
    "l_shipmode/l_receiptdate, so classes come from l_returnflag and 'late' "
    "is shipped >30 days after order date; pure integer counts",
)
def tpch_q12_style(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP '1996-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP '1997-01-01 00:00:00'"))
    )
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q15",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_rev
    FROM lineitem
   WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
     AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
   GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
  FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
 WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)
""",
    description="TPC-H Q15 top supplier: quarterly revenue per supplier, "
    "scalar-max subquery as a broadcast cross join; the equality compare "
    "stays in exact DECIMAL until the final output cast",
)
def tpch_q15(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP '1996-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP '1996-04-01 00:00:00'"))
    )
    s = load(spark, sf_dir, "supplier")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(rev).alias("total_rev"))
    )
    mx = revenue.agg(F.max("total_rev").alias("mx"))
    return (
        s.join(revenue, s.s_suppkey == F.col("supplier_no"))
        .join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .select("s_suppkey", "s_name",
                F.col("total_rev").cast("double").alias("total_revenue"))
    )


@register(
    "tpch_q17_style",
    oracle="""
WITH pq AS (
  SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq, count(*) AS cnt
    FROM lineitem GROUP BY l_partkey)
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         AS avg_yearly
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN pq ON pq.l_partkey = l.l_partkey
 WHERE p.p_brand = 'Brand#3'
   AND CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * pq.cnt < pq.sq
""",
    description="TPC-H Q17 small-quantity-order revenue: the correlated "
    "0.2*avg(l_quantity) subquery is rewritten as the exact integer-scaled "
    "decimal test qty*5*cnt < sum(qty) (no FP average crosses engines); "
    "corpus has no p_container so the slice is p_brand alone",
)
def tpch_q17_style(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    # semi-filter lineitem to the brand's parts BEFORE the per-part stats:
    # per-part aggregates are unchanged by dropping other parts' rows, and
    # the shuffle shrinks to the slice
    li_b = li.join(F.broadcast(p.select("p_partkey")),
                   li.l_partkey == F.col("p_partkey"), "left_semi")
    pq_stats = li_b.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li_b.join(pq_stats, li_b.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity").cast("decimal(18,2)") * 5 * F.col("cnt") < F.col("sq"))
        .agg((_dec_sum(F.col("l_extendedprice"), 2) / 7.0).alias("avg_yearly"))
    )


@register(
    "tpch_q20_style",
    oracle="""
SELECT s.s_name, s.s_acctbal
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
 WHERE n.n_name = 'NATION_3'
   AND s.s_suppkey IN (
     SELECT l.l_suppkey
       FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'blue%'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l.l_suppkey
      HAVING sum(CAST(l.l_quantity AS DECIMAL(18,2))) > 100)
""",
    description="TPC-H Q20-style excess-stock suppliers: corpus has no "
    "partsupp/availqty, so the inner test is 'shipped more than 100 units of "
    "blue parts in 1996' (exact decimal HAVING) feeding a semi join",
)
def tpch_q20_style(spark, sf_dir):
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP '1996-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP '1997-01-01 00:00:00'"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("blue%"))
    big = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(big, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


@register(
    "tpch_q21_style",
    oracle="""
SELECT s.s_name, count(*) AS numwait
  FROM lineitem l1
  JOIN supplier s ON s.s_suppkey = l1.l_suppkey
  JOIN orders o ON o.o_orderkey = l1.l_orderkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
 WHERE o.o_orderstatus = 'F' AND n.n_name = 'NATION_1'
   AND EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
   AND NOT EXISTS (SELECT 1 FROM lineitem l3
                WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.l_shipdate > l1.l_shipdate)
 GROUP BY s.s_name
""",
    description="TPC-H Q21-style waiting suppliers: corpus has no "
    "l_receiptdate/l_commitdate, so 'kept the order waiting' = this "
    "supplier's line carries the latest l_shipdate among OTHER suppliers' "
    "lines of a multi-supplier finished order.  r6 rewrite: the oracle's "
    "EXISTS/NOT EXISTS (two lineitem self-joins — lineitem crossed the "
    "network three times) become window aggregates over ONE l_orderkey "
    "shuffle: per-line max-over-other-suppliers = (am I the unique "
    "max-date supplier ? second per-supplier max : order max), per-order "
    "distinct-supplier count via a bounded collect_set (≤7 lines/order); "
    "A/B at sf1: 2.74 s → 1.40 s, 4 → 2 Exchanges, identical output; "
    "r13: the o_orderstatus='F' gate moves BELOW the windows as a "
    "left-semi join on the window partition key (a per-order predicate "
    "over windows partitioned by order keeps every surviving order's "
    "full line set — results identical, hash-checked at sf0.01/sf0.1), "
    "so the window stage processes only finished orders' lines and the "
    "post-window orders join disappears: sf10 min-of-2 10.2-10.5 s → "
    "6.3-8.0 s, sf0.1 unchanged",
)
def tpch_q21_style(spark, sf_dir):
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    # r13 (guide §2.3 — shuffle/window fewer rows): o_orderstatus is a
    # per-ORDER predicate and every window below partitions by
    # l_orderkey, so semi-joining lineitem against finished orders FIRST
    # is exactly the oracle's post-hoc o join — each surviving order
    # still carries ALL its lines into the windows (the EXISTS /
    # NOT EXISTS comparisons only ever look within one order).  The semi
    # join rides the same l_orderkey exchange the windows need anyway;
    # the old post-window orders join is gone entirely.
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li = li.join(o, li.l_orderkey == o.o_orderkey, "left_semi")
    wk = Window.partitionBy("l_orderkey")
    wks = Window.partitionBy("l_orderkey", "l_suppkey")
    # all four window aggregates share the l_orderkey partitioning — the
    # (orderkey, suppkey) window is a sub-partitioning of it, so Catalyst
    # plans ONE Exchange for the whole chain
    x = li.select(
        "l_orderkey", "l_suppkey", "l_shipdate",
        F.max("l_shipdate").over(wks).alias("ms"),
    ).select(
        "*",
        F.max("l_shipdate").over(wk).alias("mx"),
        F.size(F.collect_set("l_suppkey").over(wk)).alias("nsupp"),
    ).select(
        "*",
        F.size(
            F.collect_set(
                F.when(F.col("ms") == F.col("mx"), F.col("l_suppkey"))
            ).over(wk)
        ).alias("n_at_mx"),
        F.max(F.when(F.col("ms") < F.col("mx"), F.col("ms"))).over(wk).alias("m2"),
    )
    i_am_unique_max = (F.col("ms") == F.col("mx")) & (F.col("n_at_mx") == 1)
    # NOT EXISTS (other supplier, later date)  ⟺  my date ≥ max over other
    # suppliers' dates; m2 is NULL only when nsupp == 1, already excluded
    max_other = F.when(i_am_unique_max, F.col("m2")).otherwise(F.col("mx"))
    waiting = x.filter((F.col("nsupp") > 1) & (F.col("l_shipdate") >= max_other))
    return (
        waiting.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "agg_outlier_rank",
    oracle="""
WITH ranked AS (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
    FROM events
)
SELECT event_type, event_id, value, CAST(rn AS INT) AS rn
  FROM ranked
 WHERE rn <= CAST(ceil(n * 0.01) AS BIGINT)
""",
    description="rank-based outlier detection: the top 1% of values per "
    "event_type via a deterministic row_number (value desc, event_id "
    "tiebreak) — distribution-free (no mean/stddev FP accumulation), one "
    "window shuffle on the group key; at 100 TB the same plan holds because "
    "percentile-by-rank only needs the per-key sort the window already does",
)
def agg_outlier_rank(spark, sf_dir):
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    wn = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "event_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.filter(
        F.col("rn") <= F.ceil(F.col("n") * 0.01).cast("long")
    ).select("event_type", "event_id", "value", F.col("rn").cast("int").alias("rn"))


@register(
    "agg_skew_profile",
    oracle="""
WITH counts AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY user_id
),
totals AS (
  SELECT CAST(count(*) AS BIGINT) AS distinct_keys, CAST(sum(n) AS BIGINT) AS total_rows
    FROM counts
)
SELECT user_id, n,
       CAST(n * distinct_keys AS DOUBLE) / CAST(total_rows AS DOUBLE) AS skew_factor
  FROM counts, totals
 ORDER BY n DESC, user_id
 LIMIT 10
""",
    description="join-key skew diagnostics: the top hot keys with their "
    "frequency and skew factor (count / mean count) — the profile that "
    "decides whether a join needs salting or AQE skew splitting; per-key agg "
    "+ global sort-limit (distributed top-k, no single-partition window), "
    "totals broadcast from a 1-row aggregate",
)
def agg_skew_profile(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.count(F.lit(1)).alias("distinct_keys"), F.sum("n").alias("total_rows")
    )
    top = counts.orderBy(F.desc("n"), "user_id").limit(10)
    return top.crossJoin(F.broadcast(totals)).select(
        "user_id",
        "n",
        (
            (F.col("n") * F.col("distinct_keys")).cast("double")
            / F.col("total_rows").cast("double")
        ).alias("skew_factor"),
    )


@register(
    "agg_histogram",
    oracle="""
SELECT CAST(floor(o_totalprice / 20000.0) AS BIGINT) AS bucket,
       CAST(floor(o_totalprice / 20000.0) AS BIGINT) * 20000.0 AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
""",
    description="fixed-width histogram (distribution profiling before "
    "choosing partition bounds / salt ranges): map-side bucket assignment + "
    "one aggregation shuffle on ~dozens of bucket keys",
)
def agg_histogram(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 20000.0).cast("bigint")
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        "bucket", (F.col("bucket") * 20000.0).alias("bucket_lo"), "n"
    )


@register(
    "pivot_unpivot",
    oracle="""
WITH wide AS (
  SELECT o_orderpriority,
         CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS F,
         CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS O,
         CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS P
    FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, status, n
  FROM wide UNPIVOT (n FOR status IN (F, O, P))
""",
    description="unpivot (melt): the wide pivot flattened back to long form "
    "via the native UNPIVOT operator (Spark melt/stack = map-side 1-row-to-N "
    "expansion, no shuffle beyond the pivot's own aggregate); round-trips "
    "pivot_wide's output exactly",
)
def pivot_unpivot(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )
    return wide.unpivot(
        ["o_orderpriority"], ["F", "O", "P"], "status", "n"
    )


# --- agg_hll_native: HyperLogLog registers in exact integer math ---

_HLL_P = 8  # 2^8 = 256 registers
_HLL_M = 1 << _HLL_P
_HLL_REST_BITS = 32 - _HLL_P  # 24-bit suffix feeds the rho (leading-zero) count
# alpha_256 * m^2 * 2^40 as one double literal (Z is kept scaled by 2^40 in
# exact integer arithmetic; a single IEEE division produces the estimate)
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
_HLL_NUM = _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << 40)


def _hll_rho_sql(rest: str) -> str:
    """rho = leading zeros of the 24-bit suffix + 1, as a literal CASE
    cascade — no log2/bit_length, whose edge rounding differs by engine."""
    branches = "\n         ".join(
        f"WHEN {rest} >= {1 << (_HLL_REST_BITS - k)} THEN {k}"
        for k in range(1, _HLL_REST_BITS + 1)
    )
    return f"(CASE {branches} ELSE {_HLL_REST_BITS + 1} END)"


def _hll_term_sql(r: str) -> str:
    """2^(40 - rho) as literal integers (pow() is a transcendental call)."""
    branches = "\n         ".join(
        f"WHEN {r} = {k} THEN {1 << (40 - k)}" for k in range(1, _HLL_REST_BITS + 2)
    )
    return f"(CASE {branches} END)"


# murmur3 32-bit finalizer constants.  The Knuth multiplicative hash is NOT
# usable here: on sequential keys it is a low-discrepancy (golden-ratio)
# sequence — far MORE uniform than random — so register occupancy breaks the
# binomial model HLL assumes and the estimate biases high.  The finalizer has
# full avalanche; its 32x32 multiplies are split 16/16 so every intermediate
# stays under 2^49 (DuckDB BIGINT overflow raises rather than wrapping).
_HLL_C1 = 0x85EBCA6B
_HLL_C2 = 0xC2B2AE35


def _hll_mix_sql() -> str:
    """CTE chain computing h = murmur3_fmix32(user_id) step by step."""

    def mulmod32(h: str, c: int) -> str:
        return f"((((({h} // 65536) * {c}) % 65536) * 65536 + (({h} % 65536) * {c})) % 4294967296)"

    return f"""h0 AS (SELECT event_type, user_id, user_id % 4294967296 AS h FROM events),
m1 AS (SELECT event_type, user_id, xor(h, h // 65536) AS h FROM h0),
m2 AS (SELECT event_type, user_id, {mulmod32('h', _HLL_C1)} AS h FROM m1),
m3 AS (SELECT event_type, user_id, xor(h, h // 8192) AS h FROM m2),
m4 AS (SELECT event_type, user_id, {mulmod32('h', _HLL_C2)} AS h FROM m3),
hashed AS (SELECT event_type, user_id, xor(h, h // 65536) AS h FROM m4)"""


@register(
    "agg_hll_native",
    oracle=f"""
WITH {_hll_mix_sql()},
slotted AS (
  SELECT event_type, user_id, h % {_HLL_M} AS bucket,
         CAST((h - (h % {_HLL_M})) / {_HLL_M} AS BIGINT) AS rest
    FROM hashed),
regs AS (
  SELECT event_type, bucket, max({_hll_rho_sql('rest')}) AS rho
    FROM slotted GROUP BY event_type, bucket),
z AS (
  SELECT event_type,
         CAST(sum({_hll_term_sql('rho')}) AS BIGINT)
           + ({_HLL_M} - CAST(count(*) AS BIGINT)) * {1 << 40} AS z_scaled,
         CAST({_HLL_M} - count(*) AS BIGINT) AS zero_regs
    FROM regs GROUP BY event_type),
ex AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
    FROM events GROUP BY event_type)
SELECT z.event_type,
       {_HLL_NUM!r} / CAST(z.z_scaled AS DOUBLE) AS raw_est,
       z.zero_regs, ex.exact_distinct
  FROM z JOIN ex ON z.event_type = ex.event_type
""",
    description="HyperLogLog implemented natively (not approx_count_distinct): "
    "murmur3-finalizer hash (full avalanche — a multiplicative hash is too "
    "uniform on sequential keys and biases the sketch) -> 256 registers, "
    "rho via a literal leading-zero CASE cascade, "
    "Z kept as an EXACT integer sum of 2^(40-rho) terms so register math is "
    "bit-reproducible in any engine and registers are mergeable across "
    "partitions/batches (max is associative-commutative); the only FP op is "
    "the final alpha*m^2/Z division.  Raw estimator by design — zero_regs is "
    "returned so a consumer can apply linear-counting correction (its ln() "
    "is a transcendental, excluded from the oracle-checked surface).  Two "
    "tiny shuffles: (group, bucket) registers, then per-group fold",
)
def agg_hll_native(spark, sf_dir):
    e = load(spark, sf_dir, "events")

    def mulmod32(h, c):
        hi = F.floor(h / F.lit(65536.0)).cast("long")
        return ((hi * c) % 65536) * 65536 + (h % 65536) * c

    def shr_xor(h, shift_div):
        return h.bitwiseXOR(F.floor(h / F.lit(float(shift_div))).cast("long"))

    h = F.col("user_id") % F.lit(4294967296)
    h = shr_xor(h, 65536)  # h ^= h >> 16
    h = mulmod32(h, _HLL_C1) % F.lit(4294967296)
    h = shr_xor(h, 8192)  # h ^= h >> 13
    h = mulmod32(h, _HLL_C2) % F.lit(4294967296)
    h = shr_xor(h, 65536)
    bucket = h % _HLL_M
    rest = ((h - bucket) / F.lit(float(_HLL_M))).cast("long")
    expr = None
    for k in range(1, _HLL_REST_BITS + 1):
        cond = F.col("rest") >= (1 << (_HLL_REST_BITS - k))
        expr = F.when(cond, k) if expr is None else expr.when(cond, k)
    rho = expr.otherwise(_HLL_REST_BITS + 1)
    term = None
    for k in range(1, _HLL_REST_BITS + 2):
        c = F.col("rho") == k
        term = F.when(c, F.lit(1 << (40 - k))) if term is None else term.when(c, F.lit(1 << (40 - k)))
    slotted = e.select("event_type", "user_id", bucket.alias("bucket"), rest.alias("rest"))
    regs = (
        slotted.withColumn("rho_row", rho)
        .groupBy("event_type", "bucket")
        .agg(F.max("rho_row").alias("rho"))
    )
    z = regs.groupBy("event_type").agg(
        (
            F.sum(term).cast("long")
            + (F.lit(_HLL_M) - F.count("*")) * F.lit(1 << 40)
        ).alias("z_scaled"),
        (F.lit(_HLL_M) - F.count("*")).cast("long").alias("zero_regs"),
    )
    ex = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return z.join(ex, "event_type").select(
        "event_type",
        (F.lit(_HLL_NUM) / F.col("z_scaled").cast("double")).alias("raw_est"),
        "zero_regs",
        "exact_distinct",
    )


# --- agg_cms_sketch: count-min sketch with point-query error report ---

_CMS_W = 256  # counters per hash row
_CMS_SEEDS = [17, 4099, 65537, 999983]  # one independent hash row each


def _cms_oracle_sql() -> str:
    from sparkmerge.ext.hashing import mix32_sql_chain

    def chains(tag: str, src: str, keep: str) -> tuple[str, str]:
        """CTE text + final per-row (row_idx, slot) UNION ALL selection."""
        ctes, selects = [], []
        for i, seed in enumerate(_CMS_SEEDS):
            ctes.append(
                mix32_sql_chain(f"{tag}h{i}", src, keep, f"xor(user_id % 4294967296, {seed})")
            )
            selects.append(
                f"SELECT {keep}, {i} AS row_idx, h % {_CMS_W} AS slot FROM {tag}h{i}"
            )
        return ",\n".join(ctes), "\nUNION ALL\n".join(selects)

    b_ctes, b_sel = chains("b", "events", "user_id")
    q_ctes, q_sel = chains("q", "qk", "user_id")
    return f"""
WITH {b_ctes},
slots AS ({b_sel}),
regs AS (
  SELECT row_idx, slot, CAST(count(*) AS BIGINT) AS c
    FROM slots GROUP BY row_idx, slot),
qk AS (SELECT DISTINCT user_id FROM events WHERE user_id < 10),
{q_ctes},
qslots AS ({q_sel}),
est AS (
  SELECT q.user_id, min(coalesce(r.c, 0)) AS est
    FROM qslots q LEFT JOIN regs r
      ON q.row_idx = r.row_idx AND q.slot = r.slot
   GROUP BY q.user_id),
ex AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS exact
    FROM events WHERE user_id < 10 GROUP BY user_id)
SELECT e.user_id, est.est, e.exact, est.est - e.exact AS overcount
  FROM ex e JOIN est ON e.user_id = est.user_id
"""


@register(
    "agg_cms_sketch",
    oracle=_cms_oracle_sql(),
    description="count-min sketch (4 hash rows x 256 counters, portable "
    "murmur-finalizer hashes from ext/hashing.py): ONE posexplode pass "
    "assigns each event its 4 (row, slot) cells, one map-side-combined "
    "count builds the mergeable counter table, and point queries take the "
    "min over 4 broadcast lookups — frequency estimation whose memory is "
    "constant in the key cardinality; overcount >= 0 is structural (CMS "
    "never underestimates), verified per key against exact counts",
)
def agg_cms_sketch(spark, sf_dir):
    from sparkmerge.ext.hashing import mix32

    e = load(spark, sf_dir, "events")

    def slots(df):
        arr = F.array(
            *[
                mix32((F.col("user_id") % F.lit(4294967296)).bitwiseXOR(F.lit(s))) % _CMS_W
                for s in _CMS_SEEDS
            ]
        )
        return df.select("user_id", F.posexplode(arr).alias("row_idx", "slot"))

    regs = slots(e).groupBy("row_idx", "slot").agg(F.count("*").alias("c"))
    qk = e.filter(F.col("user_id") < 10).select("user_id").distinct()
    est = (
        slots(qk)
        .join(F.broadcast(regs), ["row_idx", "slot"], "left")
        .groupBy("user_id")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )
    ex = (
        e.filter(F.col("user_id") < 10)
        .groupBy("user_id")
        .agg(F.count("*").alias("exact"))
    )
    return ex.join(est, "user_id").select(
        "user_id", "est", "exact", (F.col("est") - F.col("exact")).alias("overcount")
    )
