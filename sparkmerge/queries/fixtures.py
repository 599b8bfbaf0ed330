"""Shared derived fixtures — identical derivations in both dialects.

Every merge operator needs a (target, source) pair; FIXTURES.md §B defines
the canonical recipes.  Each fixture exists twice — a PySpark builder and a
DuckDB SQL fragment — and the two MUST stay textually in sync.

FP-determinism rules used throughout (the oracle hash requires bit-equal
values from both engines):
- mutations use single IEEE ops (``x + 10.0``) — identical bits everywhere;
  never ``round()`` on arbitrary doubles (engines differ at half-way reprs);
- aggregate sums over doubles go through exact DECIMAL accumulation and are
  cast back to double at the end (order-independent, bit-equal);
- dedup/rank tiebreaks are total orders over deterministic columns — never
  ``monotonically_increasing_id`` in oracle-checked queries (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkmerge.queries import load

# ---------------------------------------------------------------------------
# orders_mut (FIXTURES.md §B): UPDATEs via %5, DELETEs via %7, INSERTs via %11
# ---------------------------------------------------------------------------

ORDERS_MUT_SQL = """
SELECT o_orderkey,
       o_custkey,
       CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
       CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice,
       o_orderdate,
       o_orderpriority
  FROM orders
 WHERE o_orderkey % 7 <> 0
UNION ALL
SELECT o_orderkey + 1000000, o_custkey, 'N', o_totalprice, o_orderdate, o_orderpriority
  FROM orders
 WHERE o_orderkey % 11 = 0
""".strip()

ORDERS_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]
ORDERS_NONKEY = ORDERS_COLS[1:]

# A SMALL delta (~1.8 % of orders: 1/97 mutations + 1/131 inserts): the
# canonical input of the broadcast
# small-source merge strategy.  Even keys in the slice are mutated, odd keys
# are byte-identical (exercises change-detection → KEEP suppression), plus a
# band of brand-new keys (INSERTs).  The insert offset (9e9) clears the
# orderkey space of every derived SF (gen_scale.py replication reaches
# ~6e6 at sf1, ~6e8 at sf100), so the band stays pure INSERTs at any scale.
ORDERS_DELTA_SQL = """
SELECT o_orderkey,
       o_custkey,
       CASE WHEN o_orderkey % 2 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
       CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice + 5.0 ELSE o_totalprice END AS o_totalprice,
       o_orderdate,
       o_orderpriority
  FROM orders
 WHERE o_orderkey % 97 = 0
UNION ALL
SELECT o_orderkey + 9000000000, o_custkey, 'N', o_totalprice, o_orderdate, o_orderpriority
  FROM orders
 WHERE o_orderkey % 131 = 0
""".strip()


def orders_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    mut = F.col("o_orderkey") % 2 == 0
    base = o.where(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.when(mut, F.lit("X")).otherwise(F.col("o_orderstatus")).alias("o_orderstatus"),
        F.when(mut, F.col("o_totalprice") + 5.0).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    extra = o.where(F.col("o_orderkey") % 131 == 0).select(
        (F.col("o_orderkey") + 9000000000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    return base.unionAll(extra)


# Sparse patch feed on orders (r6, merge_sparse_patch): each row carries
# ONLY the columns that moved — NULL means "keep the target value", the
# sparse-update warehouse shape.  Coverage: %13 slice patches status (%3),
# totalprice (%4), and a value-equal priority (%6 — non-null but unchanged,
# must stay KEEP from that column); rows hitting none of the three are
# all-NULL no-op patches (whole row KEEP); a %151 band of brand-new keys
# (offset 9e9, clear of every derived SF) inserts with NULL date/priority
# (on INSERT a hole stays NULL — no target value to keep).
ORDERS_PATCH_SQL = """
SELECT o_orderkey,
       CAST(NULL AS BIGINT) AS o_custkey,
       CASE WHEN o_orderkey % 3 = 0 THEN 'P' END AS o_orderstatus,
       CASE WHEN o_orderkey % 4 = 0 THEN o_totalprice + 1.5 END AS o_totalprice,
       CAST(NULL AS TIMESTAMP) AS o_orderdate,
       CASE WHEN o_orderkey % 6 = 0 THEN o_orderpriority END AS o_orderpriority
  FROM orders
 WHERE o_orderkey % 13 = 0
UNION ALL
SELECT o_orderkey + 9000000000, o_custkey, 'N', o_totalprice,
       CAST(NULL AS TIMESTAMP), CAST(NULL AS VARCHAR)
  FROM orders
 WHERE o_orderkey % 151 = 0
""".strip()


def orders_patch(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    base = o.where(k % 13 == 0).select(
        "o_orderkey",
        F.lit(None).cast("long").alias("o_custkey"),
        F.when(k % 3 == 0, F.lit("P")).alias("o_orderstatus"),
        F.when(k % 4 == 0, F.col("o_totalprice") + 1.5).alias("o_totalprice"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
        F.when(k % 6 == 0, F.col("o_orderpriority")).alias("o_orderpriority"),
    )
    extra = o.where(k % 151 == 0).select(
        (k + 9000000000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
        F.lit(None).cast("timestamp").alias("o_orderdate"),
        F.lit(None).cast("string").alias("o_orderpriority"),
    )
    return base.unionAll(extra)


# Multi-version upsert feed on orders (r7, merge_upsert_latest): several
# versions per key carrying a source sequence number (`src_seq` — a CDC
# LSN / source timestamp; any totally-ordered column works), where
# latest-per-key must win BEFORE the changeset join.  The reference hard-
# rejects this feed shape outright (duplicate-key source → @badKey error,
# sp_SimpleMerge.sql:63).  Coverage: %5 keys get one update version; %10
# keys a second, higher-seq version that must override it; %15 keys a
# final byte-identical version (the winner must then classify KEEP, not
# UPDATE — recency pick before change detection); %97 keys insert a brand
# new key (offset 9e9, clear of every derived SF) in two versions where
# the later one must become the insert image.
ORDERS_UPSERT_FEED_SQL = """
SELECT o_orderkey, o_custkey, 'U1' AS o_orderstatus,
       o_totalprice + 1.0 AS o_totalprice, o_orderdate, o_orderpriority,
       CAST(1 AS BIGINT) AS src_seq
  FROM orders WHERE o_orderkey % 5 = 0
UNION ALL
SELECT o_orderkey, o_custkey, 'U2', o_totalprice + 2.0,
       o_orderdate, o_orderpriority, 2
  FROM orders WHERE o_orderkey % 10 = 0
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       o_orderdate, o_orderpriority, 3
  FROM orders WHERE o_orderkey % 15 = 0
UNION ALL
SELECT o_orderkey + 9000000000, o_custkey, 'N1', o_totalprice,
       o_orderdate, o_orderpriority, 1
  FROM orders WHERE o_orderkey % 97 = 0
UNION ALL
SELECT o_orderkey + 9000000000, o_custkey, 'N2', o_totalprice + 3.0,
       o_orderdate, o_orderpriority, 2
  FROM orders WHERE o_orderkey % 97 = 0
""".strip()


def orders_upsert_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12: SQL-text branches (one selectExpr each) — this fixture's five
    # per-branch Column chains were ~0.29 s of every merge_upsert_latest
    # rep at sf0.1 (cProfile receipt; the floor_profile construct column).
    # Expressions are UNCHANGED: nD is the double literal F.lit(n.0) made,
    # 9000000000 parses as BIGINT (out of int range), CAST(n AS BIGINT)
    # mirrors F.lit(seq).cast('long').
    o = load(spark, sf_dir, "orders")

    def ver(pred, key, status, price, seq):
        return o.where(pred).selectExpr(
            f"{key} AS o_orderkey",
            "o_custkey",
            f"{status} AS o_orderstatus",
            f"{price} AS o_totalprice",
            "o_orderdate",
            "o_orderpriority",
            f"CAST({seq} AS BIGINT) AS src_seq",
        )

    k = "o_orderkey"
    return (
        ver("o_orderkey % 5 = 0", k, "'U1'", "o_totalprice + 1.0D", 1)
        .unionAll(ver("o_orderkey % 10 = 0", k, "'U2'", "o_totalprice + 2.0D", 2))
        .unionAll(ver("o_orderkey % 15 = 0", k, "o_orderstatus", "o_totalprice", 3))
        .unionAll(ver("o_orderkey % 97 = 0", f"{k} + 9000000000", "'N1'", "o_totalprice", 1))
        .unionAll(ver("o_orderkey % 97 = 0", f"{k} + 9000000000", "'N2'", "o_totalprice + 3.0D", 2))
    )


def orders_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12: assembled as SQL text (one selectExpr per branch) — this fixture
    # is constructed once per merge-family rep, and its ~40 per-node py4j
    # round-trips were ~0.1 s of every sf0.1 rep (floor_profile receipt).
    # Expressions are UNCHANGED (10.0D is the double literal F.lit(10.0)
    # produced; CASE WHEN mirrors F.when().otherwise()).
    o = load(spark, sf_dir, "orders")
    mut = "o_orderkey % 5 = 0"
    base = o.where("o_orderkey % 7 != 0").selectExpr(
        "o_orderkey",
        "o_custkey",
        f"CASE WHEN {mut} THEN 'X' ELSE o_orderstatus END AS o_orderstatus",
        f"CASE WHEN {mut} THEN o_totalprice + 10.0D ELSE o_totalprice END AS o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    extra = o.where("o_orderkey % 11 = 0").selectExpr(
        "o_orderkey + 1000000 AS o_orderkey",
        "o_custkey",
        "'N' AS o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    return base.unionAll(extra)


def classify_sql(action_alias: str = "action") -> str:
    """DuckDB fragment: the full-outer classification of orders × orders_mut
    (must mirror changeset.py's action logic exactly)."""
    diff = " OR ".join(f"t.{c} IS DISTINCT FROM s.{c}" for c in ORDERS_NONKEY)
    return f"""
WITH src AS ({ORDERS_MUT_SQL}),
cls AS (
  SELECT coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
         CASE WHEN t.o_orderkey IS NULL THEN 'INSERT'
              WHEN s.o_orderkey IS NULL THEN 'DELETE'
              WHEN {diff} THEN 'UPDATE'
              ELSE 'KEEP' END AS {action_alias},
         {', '.join(f't.{c} AS t_{c}' for c in ORDERS_COLS)},
         {', '.join(f's.{c} AS s_{c}' for c in ORDERS_COLS)}
    FROM orders t
    FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey
)
""".strip()


# ---------------------------------------------------------------------------
# customer_nullkey (FIXTURES.md §B): composite key with NULLs on both sides
# ---------------------------------------------------------------------------

CUST_NULL_TGT_SQL = """
SELECT c_custkey,
       CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_nationkey END AS c_nationkey,
       c_name, c_acctbal, c_mktsegment
  FROM customer
""".strip()

# source: same null pattern (so NULL keys MATCH null-safely), mutate acctbal
# via an exact FP op, drop %13 rows (DELETEs), no inserts.
CUST_NULL_SRC_SQL = """
SELECT c_custkey,
       CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_nationkey END AS c_nationkey,
       c_name,
       CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 5.0 ELSE c_acctbal END AS c_acctbal,
       c_mktsegment
  FROM customer
 WHERE c_custkey % 13 <> 0
""".strip()


def customer_nullkey(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    c = load(spark, sf_dir, "customer")
    nullkey = F.when(F.col("c_custkey") % 10 == 0, F.lit(None)).otherwise(F.col("c_nationkey"))
    tgt = c.select("c_custkey", nullkey.alias("c_nationkey"), "c_name", "c_acctbal", "c_mktsegment")
    src = (
        c.where(F.col("c_custkey") % 13 != 0)
        .select(
            "c_custkey",
            nullkey.alias("c_nationkey"),
            "c_name",
            F.when(F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + 5.0)
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
            "c_mktsegment",
        )
    )
    return tgt, src


# ---------------------------------------------------------------------------
# lineitem_mut: composite natural key (l_orderkey, l_linenumber)
# ---------------------------------------------------------------------------

LINEITEM_MUT_SQL = """
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
       CASE WHEN l_orderkey % 4 = 0 THEN l_quantity + 1.0 ELSE l_quantity END AS l_quantity,
       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM lineitem
 WHERE l_orderkey % 9 <> 0
""".strip()


def lineitem_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.where(F.col("l_orderkey") % 9 != 0).select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        F.when(F.col("l_orderkey") % 4 == 0, F.col("l_quantity") + 1.0)
        .otherwise(F.col("l_quantity"))
        .alias("l_quantity"),
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    )


# ---------------------------------------------------------------------------
# part_allkey (FIXTURES.md §B): every column is in the key
# ---------------------------------------------------------------------------

PART_COLS = ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"]

PART_MUT_SQL = """
SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
  FROM part
 WHERE p_partkey % 3 <> 0
UNION ALL
SELECT p_partkey + 100000, p_name, p_brand, p_type, p_size, p_retailprice
  FROM part
 WHERE p_partkey % 5 = 0
""".strip()


def part_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    base = p.where(F.col("p_partkey") % 3 != 0)
    extra = p.where(F.col("p_partkey") % 5 == 0).select(
        (F.col("p_partkey") + 100000).alias("p_partkey"), *PART_COLS[1:]
    )
    return base.unionAll(extra)
