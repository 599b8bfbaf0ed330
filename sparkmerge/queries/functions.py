"""Scalar-function surface (SURVEY.md §2.B function table): every T-SQL
function the reference uses, re-expressed with built-in pyspark.sql.functions
(JVM-side, whole-stage-codegen'd — no Python UDFs) and grouped into oracle
queries by category."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparkmerge.queries import load, register

# --- string functions: replace, substring, charindex, trim, stuff, quotename, len ---


@register(
    "fn_string_ops",
    oracle="""
SELECT n_name,
       replace(n_name, 'A', '_') AS replaced,
       substring(n_name, 2, 3) AS sub,
       CAST(strpos(n_name, 'AN') AS INT) AS charindex_an,
       ltrim(concat('  ', n_name)) AS ltrimmed,
       rtrim(concat(n_name, '  ')) AS rtrimmed,
       concat(substring(n_name, 1, 1), 'XX', substring(n_name, 4)) AS stuffed,
       concat('[', n_name, ']') AS quoted,
       CAST(length(n_name) AS INT) AS name_len
  FROM nation
""",
    description="replace/substring/charindex/ltrim/rtrim/stuff/quotename/len",
)
def fn_string_ops(spark, sf_dir):
    n = load(spark, sf_dir, "nation")
    name = F.col("n_name")
    return n.select(
        name,
        F.replace(name, F.lit("A"), F.lit("_")).alias("replaced"),
        F.substring(name, 2, 3).alias("sub"),
        F.instr(name, "AN").cast("int").alias("charindex_an"),
        F.ltrim(F.concat(F.lit("  "), name)).alias("ltrimmed"),
        F.rtrim(F.concat(name, F.lit("  "))).alias("rtrimmed"),
        # stuff(name, 2, 2, 'XX'): delete 2 chars at pos 2, insert 'XX'
        F.concat(F.substring(name, 1, 1), F.lit("XX"), F.substring(name, 4, 1000)).alias("stuffed"),
        F.concat(F.lit("["), name, F.lit("]")).alias("quoted"),
        F.length(name).cast("int").alias("name_len"),
    )


# --- null handling: isnull/coalesce, nullif ---


@register(
    "fn_null_ops",
    oracle="""
SELECT c_custkey,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_or_other,
       coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS nonneg_bal,
       (nullif(c_custkey % 3, 0) IS NULL) AS div3
  FROM customer
""",
    description="isnull/coalesce + nullif (sp_SimpleMerge.sql:94,146,171,473)",
)
def fn_null_ops(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "segment_or_other"
        ),
        F.coalesce(
            F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal")), F.lit(0.0)
        ).alias("nonneg_bal"),
        F.nullif(F.col("c_custkey") % 3, F.lit(0)).isNull().alias("div3"),
    )


# --- conversion: cast, convert(...,121), isnumeric ---


@register(
    "fn_conversion_ops",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(floor(o_totalprice) AS BIGINT) AS price_int,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS odbc_canonical,
       (TRY_CAST(o_orderpriority AS DOUBLE) IS NOT NULL) AS priority_isnumeric
  FROM orders
""",
    description="cast / convert(...,121) ODBC canonical / isnumeric (try_cast)",
)
def fn_conversion_ops(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_totalprice").cast("bigint").alias("price_int"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("odbc_canonical"),
        F.expr("try_cast(o_orderpriority AS double)").isNotNull().alias("priority_isnumeric"),
    )


# --- window: row_number over composite partitions (sp_SimpleMerge.sql:210-239) ---


@register(
    "fn_window_rownum",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders) t
 WHERE rn <= 3
""",
    description="row_number() over partition with deterministic tiebreak; top-3 per group",
)
def fn_window_rownum(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


# --- set operations: INTERSECT (change-detection core) + UNION ALL ---


@register(
    "fn_setop_intersect",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
    description="INTERSECT — null-safe set semantics (the change-detection primitive)",
)
def fn_setop_intersect(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    f_side = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_side = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_side.intersect(o_side)


@register(
    "fn_setop_unionall",
    oracle="""
SELECT 'F' AS bucket, o_orderkey FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 100 = 0
UNION ALL
SELECT 'O' AS bucket, o_orderkey FROM orders WHERE o_orderstatus = 'O' AND o_orderkey % 100 = 0
""",
    description="UNION ALL (tally assembly pattern, sp_SimpleMerge.sql:164-170)",
)
def fn_setop_unionall(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    f_side = o.filter(F.col("o_orderstatus") == "F").select(
        F.lit("F").alias("bucket"), "o_orderkey"
    )
    o_side = o.filter(F.col("o_orderstatus") == "O").select(
        F.lit("O").alias("bucket"), "o_orderkey"
    )
    return f_side.unionAll(o_side)


# --- datetime functions: trunc/extract/interval/diff (engine surface beyond
#     the reference's sysdatetime/convert-121, sp_SimpleMerge.sql:488) ---


@register(
    "fn_datetime_ops",
    oracle="""
SELECT o_orderkey,
       date_trunc('month', o_orderdate) AS order_month,
       CAST(year(o_orderdate) AS INT) AS y,
       CAST(month(o_orderdate) AS INT) AS m,
       CAST(dayofweek(o_orderdate) AS INT) AS dow,
       o_orderdate + INTERVAL 90 DAY AS due_date,
       CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT) AS days_since_95,
       strftime(o_orderdate, '%Y-%m-%d') AS iso_day
  FROM orders WHERE o_orderkey % 100 = 0
""",
    description="date_trunc/extract/interval arithmetic/datediff/format "
    "(datetime expression surface)",
)
def fn_datetime_ops(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", d).alias("order_month"),
        F.year(d).cast("int").alias("y"),
        F.month(d).cast("int").alias("m"),
        # DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1
        (F.dayofweek(d) - 1).cast("int").alias("dow"),
        (d + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.datediff(F.to_date(d), F.lit("1995-01-01").cast("date")).cast("int").alias("days_since_95"),
        F.date_format(d, "yyyy-MM-dd").alias("iso_day"),
    )


# --- distinct aggregation: exact + approximate cardinality ---


@register(
    "agg_distinct",
    oracle="""
SELECT o_orderstatus,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
       count(*) AS n_orders
  FROM orders GROUP BY o_orderstatus
""",
    description="count(DISTINCT) aggregation (expand-based distinct agg; the "
    "approx_count_distinct scale path is exercised in tests)",
)
def agg_distinct(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --- window frames: running/sliding aggregates, lag/lead, ranks ---


@register(
    "fn_window_frames",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w_run AS DOUBLE) AS running_total,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sliding3,
       lag(o_totalprice) OVER w AS prev_price,
       lead(o_totalprice) OVER w AS next_price,
       CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS INT) AS status_rank,
       CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS INT) AS status_dense
  FROM orders
 WHERE o_custkey % 50 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey),
       w_run AS (PARTITION BY o_custkey ORDER BY o_orderkey ROWS UNBOUNDED PRECEDING)
""",
    description="window frames: running + sliding decimal sums (rowsBetween), "
    "lag/lead, rank/dense_rank over a deterministic total order",
)
def fn_window_frames(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    slide = w.rowsBetween(-2, Window.currentRow)
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    ws = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(price_dec).over(run).cast("double").alias("running_total"),
        F.sum(price_dec).over(slide).cast("double").alias("sliding3"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.rank().over(ws).cast("int").alias("status_rank"),
        F.dense_rank().over(ws).cast("int").alias("status_dense"),
    )


# --- array/higher-order function surface ---


@register(
    "fn_array_ops",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
       CAST(list_transform(embedding, x -> CAST(x AS DOUBLE) * 2.0)[1] AS DOUBLE) AS first_doubled,
       CAST(list_sort(embedding)[1] AS FLOAT) AS smallest,
       CAST(list_sort(embedding)[len(embedding)] AS FLOAT) AS largest,
       list_contains(embedding, embedding[1]) AS has_first
  FROM embeddings WHERE vec_id % 20 = 0
""",
    description="higher-order array functions: size/filter/transform/sort/"
    "element_at/contains over array<float>",
)
def fn_array_ops(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 20 == 0)
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        F.element_at(F.transform(emb, lambda x: x.cast("double") * 2.0), 1).alias("first_doubled"),
        F.element_at(F.array_sort(emb), 1).alias("smallest"),
        F.element_at(F.array_sort(emb), F.size(emb)).alias("largest"),
        F.array_contains(emb, F.element_at(emb, 1)).alias("has_first"),
    )


# --- correlated scalar subquery (spark.sql surface) ---


@register(
    "subquery_scalar",
    oracle="""
SELECT c_custkey, c_name,
       (SELECT max(o_totalprice) FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_order,
       (SELECT CAST(count(*) AS BIGINT) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
  FROM customer c
 WHERE c_custkey % 25 = 0
""",
    description="correlated scalar subqueries via spark.sql (Catalyst rewrites "
    "them to aggregated left outer joins)",
)
def subquery_scalar(spark, sf_dir):
    load(spark, sf_dir, "customer").createOrReplaceTempView("sm_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("sm_orders")
    return spark.sql("""
        SELECT c_custkey, c_name,
               (SELECT max(o_totalprice) FROM sm_orders o WHERE o.o_custkey = c.c_custkey) AS max_order,
               (SELECT count(*) FROM sm_orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
          FROM sm_customer c
         WHERE c_custkey % 25 = 0
    """)


# --- approximate aggregation: the scale path for cardinality/quantiles ---


@register(
    "agg_approx",
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
       true AS approx_customers_ok,
       true AS approx_p50_ok
  FROM orders GROUP BY o_orderstatus
""",
    description="approximate aggregation surface: approx_count_distinct (HLL++) "
    "and approx_percentile sketches — sketch values are engine-specific, so the "
    "hash-checked output is the exact twin plus bounded-error verdicts "
    "(|approx−exact|/exact ≤ 5%; p50 sketch within the exact p25..p75 band)",
)
def agg_approx(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("exact_customers"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("_approx_customers"),
        F.expr("approx_percentile(o_totalprice, 0.5, 1000)").alias("_approx_p50"),
        F.expr("percentile(o_totalprice, 0.25)").alias("_p25"),
        F.expr("percentile(o_totalprice, 0.75)").alias("_p75"),
    )
    err = F.abs(F.col("_approx_customers") - F.col("exact_customers")) / F.col(
        "exact_customers"
    )
    return agg.select(
        "o_orderstatus",
        "n_orders",
        "exact_customers",
        (err <= 0.05).alias("approx_customers_ok"),
        F.col("_approx_p50").between(F.col("_p25"), F.col("_p75")).alias("approx_p50_ok"),
    )


# --- struct/map construction + field access ---


@register(
    "fn_struct_map_ops",
    oracle="""
SELECT n_nationkey,
       struct_pack(name := n_name, region := n_regionkey).name AS s_name,
       CAST(struct_pack(name := n_name, region := n_regionkey).region AS BIGINT) AS s_region,
       MAP {'name': n_name, 'upper': upper(n_name)}['upper'][1] AS m_upper,
       CAST(cardinality(MAP {'name': n_name, 'upper': upper(n_name)}) AS INT) AS m_size
  FROM nation
""",
    description="struct/map construction and field/key access (nested-type "
    "expression surface; outputs flattened for the oracle hash)",
)
def fn_struct_map_ops(spark, sf_dir):
    n = load(spark, sf_dir, "nation")
    s = F.struct(F.col("n_name").alias("name"), F.col("n_regionkey").alias("region"))
    m = F.create_map(
        F.lit("name"), F.col("n_name"), F.lit("upper"), F.upper(F.col("n_name"))
    )
    return n.select(
        "n_nationkey",
        s.getField("name").alias("s_name"),
        s.getField("region").cast("bigint").alias("s_region"),
        m.getItem("upper").alias("m_upper"),
        F.size(m).alias("m_size"),
    )


@register(
    "fn_setop_except",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
    description="EXCEPT — set difference (df.subtract; the bag-difference twin "
    "exceptAll is the engine's convergence-test primitive)",
)
def fn_setop_except(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    f_side = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_side = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_side.subtract(o_side)


# --- regexp surface: capture groups, counts, backreference replace ---


@register(
    "fn_regexp_ops",
    oracle="""
SELECT n_name,
       regexp_extract(n_name, 'NATION_([0-9]+)', 1) AS num_str,
       CAST(len(regexp_extract_all(n_name, '[0-9]')) AS INT) AS n_digits,
       regexp_replace(n_name, '([AEIOU])', '<\\1>', 'g') AS vowels_marked,
       regexp_matches(n_name, '^NATION_[0-9]+$') AS well_formed
  FROM nation
""",
    description="regexp capture groups / match counting / backreference "
    "replace / full-match test",
)
def fn_regexp_ops(spark, sf_dir):
    n = load(spark, sf_dir, "nation")
    name = F.col("n_name")
    return n.select(
        name,
        F.regexp_extract(name, r"NATION_([0-9]+)", 1).alias("num_str"),
        F.size(F.expr(r"regexp_extract_all(n_name, '[0-9]', 0)")).alias("n_digits"),
        F.regexp_replace(name, r"([AEIOU])", r"<$1>").alias("vowels_marked"),
        name.rlike(r"^NATION_[0-9]+$").alias("well_formed"),
    )


# --- conditional expressions: CASE/IF, least/greatest, between ---


@register(
    "fn_conditional_ops",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 200000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS price_band,
       IF(o_orderstatus = 'O', 'open', 'closed') AS status_word,
       least(o_totalprice, 150000.0) AS capped,
       greatest(o_totalprice, 50000.0) AS floored,
       (o_totalprice BETWEEN 50000.0 AND 150000.0) AS in_band
  FROM orders WHERE o_orderkey % 50 = 0
""",
    description="CASE/IF/least/greatest/BETWEEN conditional expression surface",
)
def fn_conditional_ops(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(p > 200000, "high").when(p > 100000, "mid").otherwise("low").alias("price_band"),
        F.when(F.col("o_orderstatus") == "O", "open").otherwise("closed").alias("status_word"),
        F.least(p, F.lit(150000.0)).alias("capped"),
        F.greatest(p, F.lit(50000.0)).alias("floored"),
        p.between(50000.0, 150000.0).alias("in_band"),
    )


# --- math surface (the reference has only * / % arithmetic, :473) ---


@register(
    "fn_math_ops",
    oracle="""
SELECT o_orderkey,
       abs(o_totalprice - 100000.0) AS dist_from_100k,
       CAST(floor(o_totalprice) AS BIGINT) AS fl,
       CAST(ceil(o_totalprice) AS BIGINT) AS ce,
       round(o_totalprice, 1) AS r1,
       sqrt(CAST(o_orderkey AS DOUBLE)) AS root,
       CAST(pow(CAST(o_orderkey % 10 AS DOUBLE), 2.0) AS DOUBLE) AS sq,
       CAST(o_orderkey % 7 AS BIGINT) AS mod7
  FROM orders WHERE o_orderkey % 100 = 0
""",
    description="abs/floor/ceil/round/sqrt/pow/mod — bit-deterministic choices "
    "only (no libm logs; round on exact 2-decimal inputs)",
)
def fn_math_ops(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    p = F.col("o_totalprice")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        F.abs(p - 100000.0).alias("dist_from_100k"),
        F.floor(p).cast("bigint").alias("fl"),
        F.ceil(p).cast("bigint").alias("ce"),
        F.round(p, 1).alias("r1"),
        F.sqrt(k.cast("double")).alias("root"),
        F.pow((k % 10).cast("double"), F.lit(2.0)).alias("sq"),
        (k % 7).cast("bigint").alias("mod7"),
    )


@register(
    "fn_bitwise_ops",
    oracle="""
SELECT o_orderkey,
       o_orderkey & 255 AS band,
       o_orderkey | 4096 AS bor,
       xor(o_orderkey, 1431655765) AS bxor,
       o_orderkey << 2 AS shl,
       o_orderkey >> 3 AS shr,
       bit_count(o_orderkey) AS popcount
  FROM orders
""",
    description="bitwise scalar surface: and/or/xor, shifts, population "
    "count — the primitives the SimHash/banding machinery builds on, here "
    "exposed as first-class scalar ops (map-side, codegen'd)",
)
def fn_bitwise_ops(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(4096)).alias("bor"),
        k.bitwiseXOR(F.lit(1431655765)).alias("bxor"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
        F.bit_count(k).cast("bigint").alias("popcount"),
    )


@register(
    "agg_mode",
    oracle="""
SELECT c_nationkey, c_mktsegment AS mode_segment FROM (
  SELECT c_nationkey, c_mktsegment,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY count(*) DESC, c_mktsegment) AS rn
    FROM customer GROUP BY c_nationkey, c_mktsegment) t
 WHERE rn = 1
""",
    description="per-group mode (most frequent value, ties -> lexicographic "
    "min): two-level aggregate — count per (group, value) then a rank window "
    "over the tiny per-group distinct set; never materializes a per-group "
    "value list, so it holds at any group cardinality",
)
def agg_mode(spark, sf_dir):
    from pyspark.sql.window import Window

    c = load(spark, sf_dir, "customer")
    counts = c.groupBy("c_nationkey", "c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("n"), "c_mktsegment")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", F.col("c_mktsegment").alias("mode_segment"))
    )


@register(
    "fn_try_cast_ops",
    oracle="""
SELECT o_orderkey,
       try_cast(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS roundtrip_int,
       try_cast(o_orderpriority AS BIGINT) AS bad_int,
       try_cast(CAST(o_totalprice AS VARCHAR) AS DOUBLE) AS roundtrip_double,
       try_cast(o_orderpriority AS DATE) AS bad_date,
       try_cast(strftime(o_orderdate, '%Y-%m-%d') AS DATE) IS NOT NULL AS good_date
  FROM orders
""",
    description="error-tolerant cast surface (TRY_CAST): malformed values "
    "become NULL instead of failing the job — the ingestion-hardening "
    "primitive (a single bad row must not kill a 100 TB load); map-side, "
    "codegen'd (decimal-string→int excluded: DuckDB rounds, Spark nulls — "
    "engines disagree, so the op pins the portable subset)",
)
def fn_try_cast_ops(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr("try_cast(CAST(o_orderkey AS STRING) AS BIGINT)").alias("roundtrip_int"),
        F.expr("try_cast(o_orderpriority AS BIGINT)").alias("bad_int"),
        F.expr("try_cast(CAST(o_totalprice AS STRING) AS DOUBLE)").alias("roundtrip_double"),
        F.expr("try_cast(o_orderpriority AS DATE)").alias("bad_date"),
        F.expr("try_cast(date_format(o_orderdate, 'yyyy-MM-dd') AS DATE)")
        .isNotNull()
        .alias("good_date"),
    )


# --- time-RANGE window frames: trailing-interval aggregates per key ---


@register(
    "fn_window_range_frame",
    oracle="""
WITH v AS (
  SELECT event_id, user_id, epoch_us(ts) AS t_us,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
    FROM events)
SELECT event_id, user_id, t_us,
       CAST(count(*) OVER w AS BIGINT) AS n_1h,
       CAST(sum(cents) OVER w AS BIGINT) AS cents_1h
  FROM v
WINDOW w AS (PARTITION BY user_id ORDER BY t_us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
    description="trailing-interval (RANGE frame) window aggregates: per-user "
    "count and exact integer-cents sum over the last hour, ordered by "
    "microsecond epoch — the time-series feature shape (rolling activity, "
    "rolling spend) ROWS frames cannot express.  Value scaled via explicit "
    "floor(x*100+0.5) half-up (portable) so the rolling sum is exact integer "
    "math; one shuffle on user_id, frame evaluation is a per-partition "
    "sliding scan",
)
def fn_window_range_frame(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    v = e.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us")
        .rangeBetween(-3600000000, Window.currentRow)
    )
    return v.select(
        "event_id",
        "user_id",
        "t_us",
        F.count("*").over(w).alias("n_1h"),
        F.sum("cents").over(w).alias("cents_1h"),
    )


# --- fn_json_table: JSON-array document → lateral typed rows (r5) --------


@register(
    "fn_json_table",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS qty_cents
  FROM lineitem WHERE l_orderkey % 11 = 0
""",
    description="the JSON_TABLE surface: per-order line items serialized "
    "into ONE JSON array document (to_json over a sort_array'd struct list "
    "— deterministic element order), then parsed back with an explicit "
    "array<struct> schema and LATERAL-exploded into typed rows; the oracle "
    "reads the relational original, so the hash match proves the "
    "serialize→parse→explode round trip is lossless; one groupBy shuffle, "
    "parse+explode are map-side",
)
def fn_json_table(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 11 == 0)
    docs = (
        li.select(
            "l_orderkey",
            F.struct(
                F.col("l_linenumber").alias("ln"),
                F.floor(F.col("l_quantity") * 100.0 + 0.5).cast("long").alias("qc"),
            ).alias("item"),
        )
        .groupBy("l_orderkey")
        .agg(F.to_json(F.sort_array(F.collect_list("item"))).alias("doc"))
    )
    parsed = docs.select(
        "l_orderkey",
        F.explode(
            F.from_json(F.col("doc"), "array<struct<ln:int,qc:bigint>>")
        ).alias("item"),
    )
    return parsed.select(
        "l_orderkey",
        F.col("item.ln").alias("l_linenumber"),
        F.col("item.qc").alias("qty_cents"),
    )


# --- fn_xml_xpath: the XPath extraction surface (r5) ---------------------


@register(
    "fn_xml_xpath",
    oracle="""
SELECT o_orderkey,
       o_orderstatus AS status,
       CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
       o_orderpriority AS prio
  FROM orders WHERE o_orderkey % 13 = 0
""",
    description="XPath extraction over XML payloads (Spark's xpath_string / "
    "xpath_long function family): order fields serialized into an XML "
    "document map-side — attribute + nested-element shapes — then extracted "
    "back by XPath; the oracle reads the relational original, so the hash "
    "match proves the build→extract round trip lossless (the XML twin of "
    "fn_json_table); zero shuffles, all codegen'd",
)
def fn_xml_xpath(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 13 == 0)
    xml = F.concat(
        F.lit('<order key="'), F.col("o_orderkey"), F.lit('">'),
        F.lit("<status>"), F.col("o_orderstatus"), F.lit("</status>"),
        F.lit("<cents>"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long"),
        F.lit("</cents>"),
        F.lit("<prio>"), F.col("o_orderpriority"), F.lit("</prio>"),
        F.lit("</order>"),
    )
    docs = o.select("o_orderkey", xml.alias("doc"))
    return docs.select(
        "o_orderkey",
        F.expr("xpath_string(doc, '/order/status')").alias("status"),
        F.expr("xpath_long(doc, '/order/cents')").alias("cents"),
        F.expr("xpath_string(doc, '/order/prio')").alias("prio"),
    )


# --- agg_listagg_ordered: deterministic ordered string aggregation (r5) --


@register(
    "agg_listagg_ordered",
    oracle="""
SELECT c_nationkey,
       string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY c_acctbal DESC, c_custkey) AS top_keys,
       CAST(count(*) AS BIGINT) AS n
  FROM customer
 WHERE c_custkey % 50 = 0
 GROUP BY c_nationkey
""",
    description="LISTAGG / string_agg WITHIN GROUP (ORDER BY): per-nation "
    "customer keys concatenated in (acctbal DESC, key) order — Spark has no "
    "ordered string_agg, so the op builds sort_array(collect_list(struct)) "
    "with a descending-friendly struct encoding and array_joins map-side; "
    "explicitly deterministic ordering (collect_list alone is partition-"
    "order-dependent — the trap this op documents); one agg shuffle",
)
def agg_listagg_ordered(spark, sf_dir):
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 50 == 0)
    # sort_array is ascending over the struct; negate the balance-cents to
    # express DESC while keeping the tiebreak (c_custkey) ascending
    item = F.struct(
        (-F.floor(F.col("c_acctbal") * 100.0 + 0.5).cast("long")).alias("neg_cents"),
        F.col("c_custkey").alias("k"),
    )
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(item)),
                    lambda s: s.getField("k").cast("string"),
                ),
                ",",
            ).alias("top_keys"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- fn_agg_argminmax (r6) ---------------------------------------------------


@register(
    "fn_agg_argminmax",
    oracle="""
WITH s AS (
  SELECT event_type, max(value) AS mxv, min(value) AS mnv,
         CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1
)
SELECT s.event_type,
       max(CASE WHEN e.value = s.mxv THEN e.event_id END) AS argmax_event_id,
       s.mxv AS max_value,
       min(CASE WHEN e.value = s.mnv THEN e.event_id END) AS argmin_event_id,
       s.mnv AS min_value,
       s.n
  FROM events e JOIN s USING (event_type)
 GROUP BY s.event_type, s.mxv, s.mnv, s.n
""",
    description="arg-extremum aggregate surface (max_by/min_by — T-SQL has "
    "no equivalent short of a correlated TOP 1): which event carries each "
    "type's extreme value, with the (value, event_id) STRUCT as the "
    "ordering key so double ties resolve by id — a total order, making "
    "the selected ids deterministic on any engine/partitioning (bare "
    "max_by on a tied value column is partition-order-dependent — the "
    "exact trap this op documents); single agg shuffle, map-side partials",
)
def fn_agg_argminmax(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    key = F.struct(F.col("value"), F.col("event_id"))
    return e.groupBy("event_type").agg(
        F.max_by("event_id", key).alias("argmax_event_id"),
        F.max("value").alias("max_value"),
        F.min_by("event_id", key).alias("argmin_event_id"),
        F.min("value").alias("min_value"),
        F.count(F.lit(1)).alias("n"),
    )
