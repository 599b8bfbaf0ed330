"""[EXT] round-4 warehouse-pattern operators (SURVEY.md §2.E, r4 batch 5).

Three patterns every production warehouse runs that the registry didn't
yet cover as first-class ops:

- ``agg_bitmap_distinct`` — EXACT distinct counting via mergeable bitmaps
  (the Druid/ClickHouse/roaring technique): bucket the key domain into
  64-bit words, OR the bits per word (associative-commutative — safe under
  any partitioning/merge order), popcount and sum.  Exactness with sketch-
  like mergeability when the key domain is bounded — the complement of
  agg_hll_native (unbounded domain, approximate) and agg_kmv_distinct
  (overlap estimates).
- ``join_point_in_time`` — the AS-OF dimension lookup against an SCD2
  history: each fact row joins the dimension version whose validity
  interval covers the fact's timestamp.  Equi-join on the key plus a
  map-side interval mask — never a range-scan nested loop.
- ``scan_schema_merge`` — schema evolution at the SOURCE level:
  ``mergeSchema`` over parquet files written with different column sets
  (old files lack the new column → NULL).  The read-side twin of
  ``merge_schema_evolution``.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sparkmerge.queries import load, register

# --- agg_bitmap_distinct -------------------------------------------------

_WORD = 32  # not 64: bit 63 is the sign bit — DuckDB raises on 1::BIGINT<<63
# (signed overflow) while Spark wraps silently; 32-bit words keep every
# shifted value positive in both engines


@register(
    "agg_bitmap_distinct",
    oracle=f"""
WITH bits AS (
  SELECT event_type,
         user_id // {_WORD} AS word_ix,
         CAST(1 AS BIGINT) << CAST(user_id % {_WORD} AS INT) AS bit
    FROM events
),
words AS (
  SELECT event_type, word_ix, bit_or(bit) AS word
    FROM bits GROUP BY 1, 2
)
SELECT event_type,
       CAST(SUM(bit_count(word)) AS BIGINT) AS n_distinct_users
  FROM words GROUP BY 1
""",
    description=f"EXACT distinct counting via mergeable bitmaps (the "
    f"roaring/Druid technique): key domain bucketed into {_WORD}-bit "
    f"words, bits OR'd per (group, word) — bit_or is associative-"
    f"commutative so partial states merge safely under any partitioning "
    f"or incremental batch order — then popcount+sum.  Memory is "
    f"domain/{_WORD} words per group instead of a distinct hash table of "
    f"the observed keys; exactness where agg_hll_native approximates; "
    f"needs a bounded integer key domain (dictionary-encode otherwise)",
)
def agg_bitmap_distinct(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    bits = e.select(
        "event_type",
        F.expr(f"user_id DIV {_WORD}").alias("word_ix"),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(user_id % {_WORD} AS INT))").alias(
            "bit"
        ),
    )
    words = bits.groupBy("event_type", "word_ix").agg(
        F.bit_or("bit").alias("word")
    )
    return words.groupBy("event_type").agg(
        F.sum(F.bit_count("word")).cast("long").alias("n_distinct_users")
    )


# --- join_point_in_time --------------------------------------------------

# SCD2 history fixture: reuse the merge_scd2_multibatch derivation (three
# loads deep for keys %14==3) — see sparkmerge/queries/core.py.


@register(
    "join_point_in_time",
    oracle="""
WITH h0 AS (
  SELECT c_custkey, c_acctbal,
         TIMESTAMP '1995-01-01 00:00:00' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to
    FROM customer
),
closed1 AS (
  SELECT c_custkey, c_acctbal, valid_from,
         TIMESTAMP '1998-01-01 00:00:00' AS valid_to
    FROM h0 WHERE c_custkey % 7 = 3
),
open1 AS (
  SELECT c_custkey, c_acctbal + 10.0 AS c_acctbal,
         TIMESTAMP '1998-01-01 00:00:00' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to
    FROM h0 WHERE c_custkey % 7 = 3
),
hist AS (
  SELECT * FROM h0 WHERE c_custkey % 7 <> 3
  UNION ALL SELECT * FROM closed1
  UNION ALL SELECT * FROM open1
)
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
       h.c_acctbal AS acctbal_at_order, h.valid_from
  FROM orders o
  JOIN hist h
    ON o.o_custkey = h.c_custkey
   AND h.valid_from <= o.o_orderdate
   AND (h.valid_to IS NULL OR o.o_orderdate < h.valid_to)
""",
    description="point-in-time (AS-OF) dimension lookup against an SCD2 "
    "history — THE warehouse pattern for reproducible training snapshots: "
    "each fact row sees the dimension version whose validity interval "
    "covers the fact timestamp; physically an equi-join on the key with a "
    "codegen'd interval mask (history versions per key are few), never a "
    "range nested loop; facts before any version are dropped by the mask "
    "(inner join), giving an auditable as-was view",
)
def join_point_in_time(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    t0 = F.lit("1995-01-01 00:00:00").cast("timestamp")
    t1 = F.lit("1998-01-01 00:00:00").cast("timestamp")
    h0 = c.select(
        "c_custkey",
        "c_acctbal",
        t0.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    changed = F.col("c_custkey") % 7 == 3
    closed1 = h0.filter(changed).select(
        "c_custkey", "c_acctbal", "valid_from", t1.alias("valid_to")
    )
    open1 = h0.filter(changed).select(
        "c_custkey",
        (F.col("c_acctbal") + 10.0).alias("c_acctbal"),
        t1.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    hist = h0.filter(~changed).unionByName(closed1).unionByName(open1)
    o = load(spark, sf_dir, "orders")
    mask = (F.col("valid_from") <= F.col("o_orderdate")) & (
        F.col("valid_to").isNull() | (F.col("o_orderdate") < F.col("valid_to"))
    )
    return (
        o.join(hist, o["o_custkey"] == hist["c_custkey"])
        .filter(mask)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            F.col("c_acctbal").alias("acctbal_at_order"),
            "valid_from",
        )
    )


# --- scan_schema_merge ---------------------------------------------------


def _ensure_evolved_supplier(spark, sf_dir: str) -> str:
    from sparkmerge.queries.sources import _derived

    dst = _derived(sf_dir, "supplier_evolved")
    if not os.path.exists(os.path.join(dst, "_DONE")):
        s = load(spark, sf_dir, "supplier")
        # epoch 1: original schema, half the rows
        s.filter(F.col("s_suppkey") % 2 == 0).write.mode("overwrite").parquet(
            f"{dst}/epoch=1"
        )
        # epoch 2: adds a column the old files don't have
        s.filter(F.col("s_suppkey") % 2 == 1).withColumn(
            "s_tier", F.when(F.col("s_acctbal") > 0, "prime").otherwise("watch")
        ).write.mode("overwrite").parquet(f"{dst}/epoch=2")
        open(os.path.join(dst, "_DONE"), "w").close()
    return dst


@register(
    "scan_schema_merge",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
       CASE WHEN s_suppkey % 2 = 1
            THEN (CASE WHEN s_acctbal > 0 THEN 'prime' ELSE 'watch' END)
       END AS s_tier
  FROM supplier
""",
    description="source-level schema evolution: mergeSchema parquet read "
    "over epochs written with different column sets — old files surface "
    "NULL for the later-added column, no rewrite of historical data (the "
    "read-side twin of merge_schema_evolution; at 100 TB re-writing old "
    "epochs for a new column is exactly what you never do).  Footer "
    "reconciliation is a driver-side metadata operation; the data scan "
    "itself is unchanged",
)
def scan_schema_merge(spark, sf_dir):
    path = _ensure_evolved_supplier(spark, sf_dir)
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(f"{path}/epoch=1", f"{path}/epoch=2")
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal", "s_tier")
    )


# --- merge_deletion_vectors (r5) ----------------------------------------


def _ensure_dv_orders(spark, sf_dir: str) -> str:
    from sparkmerge.queries.sources import _derived

    dst = _derived(sf_dir, "orders_dv")
    if not os.path.exists(os.path.join(dst, "_DONE")):
        o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 2 == 0)
        o.repartition(4, "o_orderkey").write.mode("overwrite").parquet(f"{dst}/data")
        open(os.path.join(dst, "_DONE"), "w").close()
    return dst


@register(
    "merge_deletion_vectors",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus
  FROM orders
 WHERE o_orderkey % 2 = 0 AND NOT o_orderkey % 13 = 0
""",
    description="deletion-vector merge (the Delta/Iceberg DV pattern): a "
    "DELETE against an immutable 100 TB table records (file, row-position) "
    "tombstones instead of rewriting data files; reads subtract the DV via "
    "a BROADCAST anti-join on the parquet _metadata (file_path, row_index) "
    "columns — position-based, so it works without any key column, and the "
    "DV stays delta-sized.  The oracle recomputes the surviving rows from "
    "the delete predicate, certifying no row lost or resurrected",
)
def merge_deletion_vectors(spark, sf_dir):
    path = f"{_ensure_dv_orders(spark, sf_dir)}/data"
    scan = spark.read.parquet(path).select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.col("_metadata.file_path").alias("_file"),
        F.col("_metadata.row_index").alias("_pos"),
    )
    # the "DELETE" commit: evaluate the predicate ONCE, store only positions
    dv = scan.filter(F.col("o_orderkey") % 13 == 0).select("_file", "_pos")
    return (
        scan.join(F.broadcast(dv), ["_file", "_pos"], "left_anti")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    )
