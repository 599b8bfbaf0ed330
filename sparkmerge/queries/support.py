"""§2.B generator/support operators expressed as data operators, plus the
[SUP] scan/project/filter/agg/join surface (SURVEY.md §2.C)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkmerge.queries import load, register
from sparkmerge.queries.fixtures import classify_sql

# --- split_csv: the DelimitedSplit8K tally splitter (sp_SimpleMerge.sql:163-172) ---

_CSV = "o_orderkey, o_custkey ,[o_orderdate],`o_totalprice`,o_orderpriority"


@register(
    "split_csv",
    oracle=f"""
SELECT CAST(u.n AS INT) AS item_number, u.item
  FROM (SELECT unnest(string_split('{_CSV}', ',')) AS item,
               unnest(generate_series(1, len(string_split('{_CSV}', ',')))) AS n) u
""",
    description="CSV parameter splitting with item numbers (DelimitedSplit8K equivalent)",
)
def split_csv(spark, sf_dir):
    return spark.range(1).select(
        F.posexplode(F.split(F.lit(_CSV), ","))
    ).select((F.col("pos") + 1).cast("int").alias("item_number"), F.col("col").alias("item"))


# --- ident_normalize: strip whitespace + quoting (sp_SimpleMerge.sql:190-191) ---


@register(
    "ident_normalize",
    oracle=f"""
SELECT u.item, trim(trim(u.item), '[]`') AS normalized
  FROM (SELECT unnest(string_split('{_CSV}', ',')) AS item) u
""",
    description="identifier normalization: trim whitespace, strip [] / ` quoting",
)
def ident_normalize(spark, sf_dir):
    items = spark.range(1).select(F.explode(F.split(F.lit(_CSV), ",")).alias("item"))
    return items.select(
        "item", F.expr("trim(BOTH '[]`' FROM trim(item))").alias("normalized")
    )


# --- string_agg_gen: ordered string aggregation (FOR XML PATH equivalent) ---


@register(
    "string_agg_gen",
    oracle="""
SELECT r.r_name, string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
  FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
 GROUP BY r.r_name
""",
    description="build strings by aggregating rows (FOR XML PATH('') → collect_list+array_join)",
)
def string_agg_gen(spark, sf_dir):
    r, n = load(spark, sf_dir, "region"), load(spark, sf_dir, "nation")
    return (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"))
    )


# --- schema_introspect: read column catalog (sys.columns equivalent) ---


@register(
    "schema_introspect",
    oracle="SELECT column_name, CAST(ordinal AS INT) AS ordinal FROM "
    "(SELECT column_name, row_number() OVER () AS ordinal FROM (DESCRIBE SELECT * FROM lineitem))",
    description="catalog introspection: column names + ordinals from the schema",
)
def schema_introspect(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    rows = [(f.name, i + 1) for i, f in enumerate(li.schema.fields)]
    return spark.createDataFrame(rows, "column_name string, ordinal int")


# --- validate_params: the precondition checks as a decision table ---


@register(
    "validate_params",
    oracle="""
SELECT * FROM (VALUES
  ('key_in_both', true),
  ('key_missing_in_source', false),
  ('key_missing_in_target', false),
  ('source_subset_of_target', true),
  ('source_superset_of_target', false),
  ('empty_key', false)
) AS v(checked_case, valid)
""",
    description="parameter/schema validation rules (throw 50000 cases) as a truth table",
)
def validate_params(spark, sf_dir):
    from pyspark.sql.types import StructType

    from sparkmerge.errors import MergeValidationError
    from sparkmerge.plan import MergePlan

    t = StructType.fromDDL("k bigint, a string, b double")
    s_ok = StructType.fromDDL("k bigint, a string")
    s_extra = StructType.fromDDL("k bigint, a string, z int")
    s_nokey = StructType.fromDDL("x bigint, a string")
    cases = [
        ("key_in_both", t, s_ok, "k"),
        ("key_missing_in_source", t, s_nokey, "k"),
        ("key_missing_in_target", t, s_ok, "a, missing"),
        ("source_subset_of_target", t, s_ok, "k"),
        ("source_superset_of_target", t, s_extra, "k"),
        ("empty_key", t, s_ok, " "),
    ]
    rows = []
    for name, tgt, src, key in cases:
        try:
            MergePlan.build(tgt, src, key)
            rows.append((name, True))
        except MergeValidationError:
            rows.append((name, False))
    return spark.createDataFrame(rows, "checked_case string, valid boolean")


# --- dynamic_exec: generated-SQL execution (exec sp_executesql equivalent) ---


@register(
    "dynamic_exec",
    oracle="""
SELECT o_orderpriority, count(*) AS n
  FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority
""",
    description="execute a generated SQL string (spark.sql over registered views)",
)
def dynamic_exec(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_dyn")
    generated = (
        "SELECT o_orderpriority, count(*) AS n FROM orders_dyn "
        "WHERE o_orderstatus = 'F' GROUP BY o_orderpriority"
    )
    return spark.sql(generated)


# --- rowcount_agg: the pre-merge counts (sp_SimpleMerge.sql:141-150) ---


@register(
    "rowcount_agg",
    oracle="""
SELECT 'orders' AS table_name, count(*) AS n FROM orders
UNION ALL SELECT 'lineitem', count(*) FROM lineitem
UNION ALL SELECT 'customer', count(*) FROM customer
UNION ALL SELECT 'orders_filtered', count(*) FROM orders WHERE o_orderstatus = 'O'
""",
    description="count(*) per table incl. a filtered pre-count",
)
def rowcount_agg(spark, sf_dir):
    def one(name, df):
        return df.agg(F.lit(name).alias("table_name"), F.count(F.lit(1)).alias("n"))

    o = load(spark, sf_dir, "orders")
    return (
        one("orders", o)
        .unionAll(one("lineitem", load(spark, sf_dir, "lineitem")))
        .unionAll(one("customer", load(spark, sf_dir, "customer")))
        .unionAll(one("orders_filtered", o.filter(F.col("o_orderstatus") == "O")))
    )


# --- agg_action_counts: changeset action histogram (@@ROWCOUNT decomposition) ---


@register(
    "agg_action_counts",
    oracle=f"{classify_sql()}\nSELECT action, count(*) AS n FROM cls GROUP BY action",
    description="changeset groupBy(action).count() — the @@ROWCOUNT decomposition",
)
def agg_action_counts(spark, sf_dir):
    from sparkmerge.changeset import build_changeset
    from sparkmerge.queries.fixtures import orders_source

    cs = build_changeset(load(spark, sf_dir, "orders"), orders_source(spark, sf_dir), "o_orderkey")
    return cs.df.groupBy(F.col("_action").alias("action")).agg(F.count(F.lit(1)).alias("n"))


# --- [SUP] scan / project / filter ---


@register(
    "scan_parquet",
    oracle="SELECT * FROM region",
    description="parquet scan (catalog-table equivalent)",
)
def scan_parquet(spark, sf_dir):
    return load(spark, sf_dir, "region")


@register(
    "project_subset",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer",
    description="column-pruned projection (pushed to the parquet reader)",
)
def project_subset(spark, sf_dir):
    return load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")


@register(
    "filter_predicate",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
  FROM lineitem
 WHERE l_quantity > 45.0 AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
""",
    description="predicate filter (pushed to the parquet reader)",
)
def filter_predicate(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 45.0)
        & (F.col("l_shipdate") >= F.expr("TIMESTAMP '1995-01-01 00:00:00'"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


# --- [SUP] join surface beyond the merge: semi / anti / cross ---


@register(
    "join_semi",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders o
 WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49.0)
""",
    description="left-semi join (EXISTS)",
)
def join_semi(spark, sf_dir):
    o, li = load(spark, sf_dir, "orders"), load(spark, sf_dir, "lineitem")
    hot = li.filter(F.col("l_quantity") > 49.0)
    return o.join(hot, o.o_orderkey == hot.l_orderkey, "left_semi").select(
        "o_orderkey", "o_totalprice"
    )


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer c
 WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    description="left-anti join (NOT EXISTS) — the NOT MATCHED machinery standalone",
)
def join_anti(spark, sf_dir):
    c, o = load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_cross",
    oracle="""
SELECT a.r_name AS r1, b.r_name AS r2 FROM region a CROSS JOIN region b
""",
    description="cartesian product (the tally-CTE E1 a, E1 b pattern)",
)
def join_cross(spark, sf_dir):
    r = load(spark, sf_dir, "region")
    return r.select(F.col("r_name").alias("r1")).crossJoin(r.select(F.col("r_name").alias("r2")))


# --- tally_generate: the zero-read number generator (cteTally) ---


@register(
    "tally_generate",
    oracle="SELECT CAST(unnest(generate_series(1, 100)) AS BIGINT) AS n",
    description="tally/number-series generation (spark.range vs generate_series)",
)
def tally_generate(spark, sf_dir):
    return spark.range(1, 101).select(F.col("id").alias("n"))


# --- scale-pattern joins: bucketed co-location and skew salting ---


@register(
    "join_bucketed_colocated",
    oracle="""
SELECT o.o_orderkey, CAST(count(*) AS BIGINT) AS n_items
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
 GROUP BY o.o_orderkey
""",
    description="bucketed co-located join: both sides bucketBy(8, key) -> SortMergeJoin "
    "with ZERO shuffle exchanges (the 100 TB co-location pattern; no-Exchange "
    "property asserted in tests)",
)
def join_bucketed_colocated(spark, sf_dir):
    import hashlib
    import os

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    o_tbl, l_tbl = f"smb_orders_{key}", f"smb_lineitem_{key}"
    base = f"/tmp/sparkmerge_buckets/{key}"
    if not spark.catalog.tableExists(o_tbl):
        (load(spark, sf_dir, "orders")
         .write.mode("overwrite").option("path", f"{base}/orders")
         .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(o_tbl))
    if not spark.catalog.tableExists(l_tbl):
        (load(spark, sf_dir, "lineitem")
         .write.mode("overwrite").option("path", f"{base}/lineitem")
         .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(l_tbl))
    o, li = spark.table(o_tbl), spark.table(l_tbl)
    # MERGE hint: at the corpus SF the planner would broadcast the small
    # side; the pattern under demonstration is the big-big case where both
    # sides' bucket partitioning satisfies the SortMergeJoin's distribution
    # with ZERO exchanges — and the partial agg reuses it too.
    return (
        o.hint("merge")
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "join_salted_skew",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
""",
    description="skew-salted join: big side salted by deterministic hash mod 8, small side "
    "replicated x8 -> join on (key, salt) splits any hot key across 8 tasks; "
    "result identical to the plain join (oracle-checked)",
)
def join_salted_skew(spark, sf_dir):
    SALTS = 8
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(SALTS)).alias("_salt"),
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.explode(F.sequence(F.lit(0), F.lit(SALTS - 1))).alias("_salt"),
    )
    return li.join(
        o, (li.l_orderkey == o.o_orderkey) & (li._salt == o._salt)
    ).select("l_orderkey", "l_linenumber", "o_orderstatus")


@register(
    "join_fuzzy_name",
    oracle="""
SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey <> b.c_custkey
 WHERE a.c_custkey % 50 = 0
   AND levenshtein(a.c_name, b.c_name) <= 3
""",
    description="fuzzy entity matching: sampled probe customers joined to "
    "same-nation candidates within Levenshtein distance 3 — the "
    "entity-resolution shape; the edit distance only ever runs inside the "
    "blocking key (nation) against a bounded probe set, never all-pairs "
    "across the corpus",
)
def join_fuzzy_name(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    a = c.filter(F.col("c_custkey") % 50 == 0).select(
        F.col("c_custkey").alias("a_key"),
        F.col("c_name").alias("a_name"),
        F.col("c_nationkey").alias("a_nat"),
    )
    b = c.select(
        F.col("c_custkey").alias("b_key"),
        F.col("c_name").alias("b_name"),
        F.col("c_nationkey").alias("b_nat"),
    )
    dist = F.levenshtein(F.col("a_name"), F.col("b_name"))
    return (
        a.join(b, (F.col("a_nat") == F.col("b_nat")) & (F.col("a_key") != F.col("b_key")))
        .filter(dist <= 3)
        .select("a_key", "b_key", dist.cast("int").alias("dist"))
    )


# --- table_profile: one-pass column profiling (null/distinct/min/max) ---

# (name, kind): doubles excluded from min/max — their string rendering is
# engine-specific; exact types (int, string) render identically everywhere
_PROFILE_COLS = [
    ("c_custkey", "minmax"),
    ("c_name", "minmax"),
    ("c_nationkey", "minmax"),
    ("c_acctbal", "counts_only"),
    ("c_mktsegment", "minmax"),
]


@register(
    "table_profile",
    oracle="""
WITH a AS (
  SELECT count(*) AS n_rows,
         """ + ",\n         ".join(
        f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_{c}, "
        f"CAST(count(DISTINCT {c}) AS BIGINT) AS nd_{c}"
        + (
            f", CAST(min({c}) AS VARCHAR) AS mn_{c}, CAST(max({c}) AS VARCHAR) AS mx_{c}"
            if kind == "minmax"
            else ""
        )
        for c, kind in _PROFILE_COLS
    ) + """
    FROM customer)
""" + "\nUNION ALL\n".join(
        f"SELECT '{c}' AS col, nn_{c} AS n_nulls, nd_{c} AS n_distinct, "
        + (f"mn_{c} AS min_s, mx_{c} AS max_s" if kind == "minmax" else
           "CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s")
        + " FROM a"
        for c, kind in _PROFILE_COLS
    ),
    description="one-pass table profiling: per-column null count, exact "
    "distinct count, and min/max (exact-typed columns only — float-to-string "
    "rendering is engine-specific, so doubles report counts alone).  The "
    "multi-distinct aggregate is a single Expand-based pass over the table; "
    "the per-column pivot to rows is driver-free (explode of a literal "
    "struct array) — the profile-before-merge quality gate at any scale",
)
def table_profile(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    aggs = []
    for col, kind in _PROFILE_COLS:
        aggs.append(
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias(f"nn_{col}")
        )
        aggs.append(F.countDistinct(col).alias(f"nd_{col}"))
        if kind == "minmax":
            aggs.append(F.min(col).cast("string").alias(f"mn_{col}"))
            aggs.append(F.max(col).cast("string").alias(f"mx_{col}"))
    wide = c.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(col).alias("col"),
                F.col(f"nn_{col}").alias("n_nulls"),
                F.col(f"nd_{col}").alias("n_distinct"),
                (
                    F.col(f"mn_{col}") if kind == "minmax" else F.lit(None).cast("string")
                ).alias("min_s"),
                (
                    F.col(f"mx_{col}") if kind == "minmax" else F.lit(None).cast("string")
                ).alias("max_s"),
            )
            for col, kind in _PROFILE_COLS
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")


# --- validate_constraints: key/uniqueness/referential quality gates ---


@register(
    "validate_constraints",
    oracle="""
SELECT 'customer_pk_null' AS constraint, CAST((
    SELECT count(*) FROM customer WHERE c_custkey IS NULL) AS BIGINT) AS violations
UNION ALL
SELECT 'customer_pk_dup', CAST((
    SELECT coalesce(sum(n - 1), 0) FROM (
      SELECT count(*) AS n FROM customer GROUP BY c_custkey) g WHERE n > 1) AS BIGINT)
UNION ALL
SELECT 'lineitem_pk_dup', CAST((
    SELECT coalesce(sum(n - 1), 0) FROM (
      SELECT count(*) AS n FROM lineitem GROUP BY l_orderkey, l_linenumber) g
     WHERE n > 1) AS BIGINT)
UNION ALL
SELECT 'orders_fk_orphan', CAST((
    SELECT count(*) FROM orders o ANTI JOIN customer c
        ON o.o_custkey = c.c_custkey) AS BIGINT)
UNION ALL
SELECT 'lineitem_fk_orphan', CAST((
    SELECT count(*) FROM lineitem l ANTI JOIN orders o
        ON l.l_orderkey = o.o_orderkey) AS BIGINT)
""",
    description="constraint validation before a merge is trusted: PK null "
    "rate, PK duplicate surplus (sum of extra rows per key — the corpus "
    "lineitem key is genuinely ~23% non-unique, so this gate fires on real "
    "data), and FK orphan counts via broadcast anti-joins; each check is an "
    "independent aggregate unioned into one report frame",
)
def validate_constraints(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    def dup_surplus(df, keys):
        return (
            df.groupBy(*keys)
            .count()
            .filter(F.col("count") > 1)
            .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).cast("long").alias("v"))
        )

    def labeled(name, agg_df):
        return agg_df.select(F.lit(name).alias("constraint"), F.col("v").alias("violations"))

    pk_null = cust.agg(
        F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)).cast("long").alias("v")
    )
    orphans_o = (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count("*").alias("v"))
    )
    orphans_l = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count("*").alias("v"))
    )
    parts = [
        labeled("customer_pk_null", pk_null),
        labeled("customer_pk_dup", dup_surplus(cust, ["c_custkey"])),
        labeled("lineitem_pk_dup", dup_surplus(li, ["l_orderkey", "l_linenumber"])),
        labeled("orders_fk_orphan", orphans_o),
        labeled("lineitem_fk_orphan", orphans_l),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --- join_bloom_prefilter: bloom-filter semi-join reduction ---

_BLOOM_BITS = 32768  # 1024 words x 32 bits; k=2 hashes
_BLOOM_SEED2 = 2654435769


def _bloom_oracle_sql() -> str:
    from sparkmerge.ext.hashing import mix32_sql_chain

    def side(tag: str, src_cte: str) -> str:
        return f"""{mix32_sql_chain(f'{tag}h1', src_cte, 'key', 'key')},
{tag}x AS (SELECT key, h AS h1, xor(h, {_BLOOM_SEED2}) AS x FROM {tag}h1),
{mix32_sql_chain(f'{tag}h2', f'{tag}x', 'key, h1', 'x')},
{tag}wm AS (
  SELECT key,
         (h1 % {_BLOOM_BITS}) // 32 AS w1,
         (CAST(1 AS BIGINT) << ((h1 % {_BLOOM_BITS}) % 32)) AS m1,
         (h % {_BLOOM_BITS}) // 32 AS w2,
         (CAST(1 AS BIGINT) << ((h % {_BLOOM_BITS}) % 32)) AS m2
    FROM {tag}h2)"""

    return f"""
WITH bk AS (SELECT DISTINCT o_orderkey AS key FROM orders
             WHERE o_orderpriority = '1-URGENT'),
{side('b', 'bk')},
regs AS (
  SELECT w AS word, bit_or(m) AS bits FROM (
    SELECT w1 AS w, m1 AS m FROM bwm
    UNION ALL SELECT w2, m2 FROM bwm) u GROUP BY w),
pk AS (SELECT l_orderkey AS key FROM lineitem),
{side('p', 'pk')},
flags AS (
  SELECT p.key,
         CASE WHEN (coalesce(r1.bits, 0) & p.m1) = p.m1
               AND (coalesce(r2.bits, 0) & p.m2) = p.m2 THEN 1 ELSE 0 END AS pass,
         CASE WHEN b.key IS NOT NULL THEN 1 ELSE 0 END AS is_true
    FROM pwm p
    LEFT JOIN regs r1 ON p.w1 = r1.word
    LEFT JOIN regs r2 ON p.w2 = r2.word
    LEFT JOIN bk b ON p.key = b.key)
SELECT CAST(count(*) AS BIGINT) AS n_probe,
       CAST(sum(pass) AS BIGINT) AS n_pass,
       CAST(sum(is_true) AS BIGINT) AS n_true,
       CAST(sum(CASE WHEN pass = 1 AND is_true = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
       CAST(sum(CASE WHEN is_true = 1 AND pass = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg
  FROM flags
"""


@register(
    "join_bloom_prefilter",
    oracle=_bloom_oracle_sql(),
    description="bloom-filter semi-join reduction (THE big-join scan-cut at "
    "scale: ship a 4 KB bit array to every probe task instead of shuffling "
    "the probe side): build keys hashed twice (portable murmur finalizer, "
    "ext/hashing.py), 32768-bit filter as 1024 bit_or'd words, probe rows "
    "tested via two broadcast joins on word index; the report proves the "
    "contract — n_false_neg is structurally 0, n_false_pos ~2.8% at the "
    "corpus build cardinality.  Register build and probe are each one "
    "map-side pass; no shuffle touches the probe table",
)
def join_bloom_prefilter(spark, sf_dir):
    from sparkmerge.ext.hashing import mix32

    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    def with_words(df, key_col):
        d = df.select(F.col(key_col).alias("key")).withColumn("h1", mix32(F.col("key")))
        d = d.withColumn("h2", mix32(F.col("h1").bitwiseXOR(F.lit(_BLOOM_SEED2))))
        for i in (1, 2):
            pos = F.col(f"h{i}") % _BLOOM_BITS
            d = d.withColumn(f"w{i}", F.floor(pos / F.lit(32.0)).cast("long")).withColumn(
                f"b{i}", (pos % 32).cast("int")
            )
        return d.select(
            "key",
            "w1",
            F.expr("shiftleft(CAST(1 AS BIGINT), b1)").alias("m1"),
            "w2",
            F.expr("shiftleft(CAST(1 AS BIGINT), b2)").alias("m2"),
        )

    bk = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    ).distinct()
    bwm = with_words(bk, "o_orderkey")
    regs = (
        bwm.select(F.col("w1").alias("word"), F.col("m1").alias("m"))
        .unionAll(bwm.select(F.col("w2"), F.col("m2")))
        .groupBy("word")
        .agg(F.bit_or("m").alias("bits"))
    )
    pwm = with_words(li, "l_orderkey")
    r1 = F.broadcast(regs.select(F.col("word").alias("_w1"), F.col("bits").alias("bits1")))
    r2 = F.broadcast(regs.select(F.col("word").alias("_w2"), F.col("bits").alias("bits2")))
    truth = F.broadcast(bk.select(F.col("o_orderkey").alias("key"), F.lit(1).alias("is_true")))
    flags = (
        pwm.join(r1, pwm.w1 == F.col("_w1"), "left")
        .join(r2, pwm.w2 == F.col("_w2"), "left")
        .join(truth, "key", "left")
        .select(
            F.when(
                (F.coalesce(F.col("bits1"), F.lit(0)).bitwiseAND(F.col("m1")) == F.col("m1"))
                & (F.coalesce(F.col("bits2"), F.lit(0)).bitwiseAND(F.col("m2")) == F.col("m2")),
                1,
            )
            .otherwise(0)
            .alias("pass"),
            F.coalesce(F.col("is_true"), F.lit(0)).alias("is_true"),
        )
    )
    return flags.agg(
        F.count("*").alias("n_probe"),
        F.sum("pass").cast("long").alias("n_pass"),
        F.sum("is_true").cast("long").alias("n_true"),
        F.sum(F.when((F.col("pass") == 1) & (F.col("is_true") == 0), 1).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
        F.sum(F.when((F.col("is_true") == 1) & (F.col("pass") == 0), 1).otherwise(0))
        .cast("long")
        .alias("n_false_neg"),
    )


# --- join_anti_null_aware (r8b4) ---------------------------------------------
#
# NOT IN over a NULLABLE key — the third NULL-join semantic the
# relational surface pins down.  join_null_safe_eq covers <=> matching,
# join_anti covers NOT EXISTS (a NULL left key never matches, so the row
# is KEPT); ANSI NOT IN differs on exactly those rows: a NULL left key
# makes every comparison UNKNOWN, so the row is DROPPED, and one NULL in
# the subquery empties the whole result.  Here the left key is
# nullif(c_nationkey, 4) — nation 4 sits OUTSIDE the excluded regions
# at every SF, so its customers carry a NULL key and must vanish for the
# NULL rule alone (a left-anti rewrite would keep them) — while the
# subquery key
# is nullable in SCHEMA but never NULL in data (nullif against a
# sentinel no nation uses), so the result stays non-empty and the
# optimizer still cannot assume non-nullability.
#
# Scale: Spark plans this as a single-column null-aware anti join —
# BroadcastHashJoin … LeftAnti, BuildRight with the isNullAwareAntiJoin
# flag set (rendered as the trailing `true` in the plan string; asserted
# in tests): the nation⋈region subquery is dim-sized and broadcast, the
# customer side streams map-side with NO shuffle.  The naive rewrite —
# [NOT] EXISTS plus an OR-isNull disjunction — degenerates to a nested-
# loop join; the dedicated operator is why NOT IN survives at 100 TB.


@register(
    "join_anti_null_aware",
    oracle="""
SELECT c_custkey, c_name, c_nationkey
  FROM customer
 WHERE nullif(c_nationkey, 4) NOT IN (
   SELECT nullif(n.n_nationkey, -1)
     FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE'))
""",
    description="ANSI NOT IN over a nullable key (null-aware anti join): "
    "NULL left keys are DROPPED (vs kept under NOT EXISTS/left_anti) and a "
    "NULL in the subquery would empty the result — the semantic pinned "
    "with a nullif(c_nationkey, 4) left key (nation 4 is outside the "
    "excluded regions, so its rows vanish for the NULL rule alone) and "
    "a schema-nullable-but-never-NULL subquery key; Spark plans the "
    "dedicated single-column NullAwareAntiJoin over the broadcast "
    "nation⋈region dim — customer streams with NO shuffle",
)
def join_anti_null_aware(spark, sf_dir):
    load(spark, sf_dir, "customer").createOrReplaceTempView("naaj_customer")
    load(spark, sf_dir, "nation").createOrReplaceTempView("naaj_nation")
    load(spark, sf_dir, "region").createOrReplaceTempView("naaj_region")
    return spark.sql(
        """
SELECT c_custkey, c_name, c_nationkey
  FROM naaj_customer
 WHERE nullif(c_nationkey, 4) NOT IN (
   SELECT nullif(n.n_nationkey, -1)
     FROM naaj_nation n JOIN naaj_region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE'))
"""
    )


# --- audit_fk_orphans (r8b9) --------------------------------------------------
#
# Referential-integrity audit between the fact (lineitem) and its parent
# (orders) — the FK health check run before any merge that assumes the
# join key resolves: per class (matched / order_without_lines /
# line_without_order), how many keys and how many fact rows.  The fact
# side aggregates to per-key line counts FIRST (one map-side-combined
# shuffle — the full outer join then runs on |orderkeys|, not raw lines,
# and reuses the orderkey partitioning), so at 100 TB the audit costs one
# fact shuffle + one co-partitioned join, never a raw-row full outer.


@register(
    "audit_fk_orphans",
    oracle="""
WITH lk AS (
  SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem GROUP BY 1
),
ok AS (SELECT o_orderkey AS k FROM orders),
j AS (
  SELECT CASE WHEN ok.k IS NULL THEN 'line_without_order'
              WHEN lk.k IS NULL THEN 'order_without_lines'
              ELSE 'matched' END AS fk_class,
         coalesce(lk.n_lines, 0) AS n_lines
    FROM ok FULL OUTER JOIN lk ON ok.k = lk.k
)
SELECT fk_class,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(n_lines) AS BIGINT) AS n_lines
  FROM j GROUP BY fk_class
""",
    description="referential-integrity audit (fact ⟂ parent): per FK class "
    "(matched / order_without_lines / line_without_order) the key and "
    "fact-row counts; the fact aggregates to per-key counts FIRST so the "
    "full outer join runs on |keys| and reuses the key partitioning — one "
    "fact shuffle + one co-partitioned join, never a raw-row full outer",
)
def audit_fk_orphans(spark, sf_dir):
    lk = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
    ok = load(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    j = ok.alias("o").join(lk.alias("l"), F.col("o.k") == F.col("l.k"), "full_outer")
    fk_class = (
        F.when(F.col("o.k").isNull(), "line_without_order")
        .when(F.col("l.k").isNull(), "order_without_lines")
        .otherwise("matched")
    )
    return (
        j.select(fk_class.alias("fk_class"), F.coalesce("n_lines", F.lit(0)).alias("n_lines"))
        .groupBy("fk_class")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n_lines").alias("n_lines"),
        )
    )
