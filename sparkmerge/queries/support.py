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
