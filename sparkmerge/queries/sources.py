"""Source/sink format surface beyond parquet (SURVEY.md §2.C scans row):
CSV and JSON readers with explicit schemas, and partitioned parquet writes.

The driver corpus is parquet-only, so the CSV/JSON fixtures are derived
once per sf_dir under /tmp (same rows, exact text serialization of int/str
columns — no FP round-trip risk); the oracle reads the ORIGINAL parquet, so
a hash match proves the format readers reproduce the source of truth."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sparkmerge.queries import fingerprint, load, prune_stale_siblings, register, table_path


def _derived(sf_dir: str, name: str) -> str:
    # content-fingerprinted key: regenerated testdata at the same path
    # invalidates the cache instead of silently serving stale derivations;
    # superseded content generations of the same sf_dir are pruned so
    # /tmp/sparkmerge_formats stays bounded across regenerations (ADVICE r6)
    key = fingerprint(sf_dir)
    base = f"/tmp/sparkmerge_formats/{key}"
    if not os.path.exists(base):
        prune_stale_siblings("/tmp/sparkmerge_formats", key)
    return f"{base}/{name}"


def _ensure_nation_csv(sf_dir: str) -> str:
    import pyarrow.parquet as pq

    dst = _derived(sf_dir, "nation_csv/part-0.csv")
    if not os.path.exists(dst):
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        rows = pq.read_table(f"{sf_dir}/nation.parquet").to_pylist()
        tmp = f"{dst}.{os.getpid()}.tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("n_nationkey,n_name,n_regionkey\n")
            for r in sorted(rows, key=lambda r: r["n_nationkey"]):
                f.write(f"{r['n_nationkey']},{r['n_name']},{r['n_regionkey']}\n")
        os.replace(tmp, dst)
    return os.path.dirname(dst)


def _ensure_region_json(sf_dir: str) -> str:
    import json

    import pyarrow.parquet as pq

    dst = _derived(sf_dir, "region_json/part-0.json")
    if not os.path.exists(dst):
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        rows = pq.read_table(f"{sf_dir}/region.parquet").to_pylist()
        tmp = f"{dst}.{os.getpid()}.tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            for r in sorted(rows, key=lambda r: r["r_regionkey"]):
                f.write(json.dumps(r) + "\n")
        os.replace(tmp, dst)
    return os.path.dirname(dst)


@register(
    "scan_csv",
    oracle="SELECT * FROM nation",
    description="CSV source with explicit schema (header, typed columns)",
)
def scan_csv(spark, sf_dir):
    path = _ensure_nation_csv(sf_dir)
    return spark.read.csv(
        path, header=True, schema="n_nationkey int, n_name string, n_regionkey int"
    )


@register(
    "scan_json",
    oracle="SELECT * FROM region",
    description="JSON-lines source with explicit schema",
)
def scan_json(spark, sf_dir):
    path = _ensure_region_json(sf_dir)
    return spark.read.schema("r_regionkey int, r_name string").json(path)


@register(
    "scan_orc",
    oracle="SELECT * FROM supplier",
    description="ORC source/sink roundtrip (columnar format surface beyond parquet)",
)
def scan_orc(spark, sf_dir):
    from sparkmerge.queries import load as _load

    dst = _derived(sf_dir, "supplier_orc")
    if not os.path.exists(os.path.join(dst, "_SUCCESS")):
        _load(spark, sf_dir, "supplier").write.mode("overwrite").orc(dst)
    return spark.read.orc(dst)


def _ensure_documents_txt(sf_dir: str) -> str:
    import pyarrow.parquet as pq

    dst = _derived(sf_dir, "documents_txt/part-0.txt")
    if not os.path.exists(dst):
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        rows = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).to_pylist()
        tmp = f"{dst}.{os.getpid()}.tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            for r in sorted(rows, key=lambda r: r["doc_id"]):
                f.write(r["text"] + "\n")
        os.replace(tmp, dst)
    return os.path.dirname(dst)


@register(
    "scan_text_lines",
    oracle="SELECT text AS value FROM documents",
    description="raw line-oriented text source (spark.read.text — the "
    "format web-crawl corpora arrive in before any schema exists); the "
    "fixture serializes each document as one line, the reader splits on "
    "newlines in parallel by byte range; hash match against the parquet "
    "source of truth proves a lossless round trip (corpus text is "
    "newline-free by construction — a real crawl uses JSONL, scan_json)",
)
def scan_text_lines(spark, sf_dir):
    path = _ensure_documents_txt(sf_dir)
    return spark.read.text(path)


def _ensure_region_jsonl_gz(sf_dir: str) -> str:
    import gzip
    import json

    import pyarrow.parquet as pq

    dst = _derived(sf_dir, "region_jsonl_gz/part-0.json.gz")
    if not os.path.exists(dst):
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        rows = pq.read_table(f"{sf_dir}/region.parquet").to_pylist()
        tmp = f"{dst}.{os.getpid()}.tmp"
        with gzip.open(tmp, "wt", encoding="utf-8") as f:
            for r in sorted(rows, key=lambda r: r["r_regionkey"]):
                f.write(json.dumps(r) + "\n")
        os.replace(tmp, dst)
    return os.path.dirname(dst)


@register(
    "scan_jsonl_gz",
    oracle="SELECT * FROM region",
    description="gzip-compressed JSONL source (the format web-crawl "
    "dumps actually ship in): spark.read.json transparently decodes by "
    "extension; note gzip is NOT splittable — one file = one task, so a "
    "100 TB corpus must arrive as many shard files (the layout "
    "sink_jsonl_shards writes) or recompress to a splittable codec",
)
def scan_jsonl_gz(spark, sf_dir):
    path = _ensure_region_jsonl_gz(sf_dir)
    return spark.read.schema("r_regionkey int, r_name string").json(path)


@register(
    "sink_partitioned_parquet",
    oracle="""
SELECT o_orderstatus, count(*) AS n
  FROM orders WHERE o_orderstatus IN ('F', 'O') GROUP BY o_orderstatus
""",
    description="partitionBy parquet sink + partition-pruned readback "
    "(the layout the 100 TB snapshot store uses)",
)
def sink_partitioned_parquet(spark, sf_dir):
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="sparkmerge_part_")
    try:
        orders = load(spark, sf_dir, "orders")
        orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
        back = spark.read.parquet(out).filter(F.col("o_orderstatus").isin("F", "O"))
        # partition pruning: only the two matching partition dirs are read
        result = back.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
        result = spark.createDataFrame(result.collect(), "o_orderstatus string, n bigint")
        return result
    finally:
        shutil.rmtree(out, ignore_errors=True)


# dedup_fuzzy moved to queries/ext_dedup.py (it is the MinHash pipeline and
# now shares its generated DuckDB oracle).


@register(
    "sink_jsonl_shards",
    oracle="""
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
  FROM documents GROUP BY lang
""",
    description="training-export sink: documents written as lang-partitioned "
    "JSON-lines shards (the hand-off format for tokenizer pipelines) and "
    "read back through the JSON source with an explicit schema — the "
    "readback aggregate must reproduce the source corpus exactly; "
    "partitionBy keeps each language its own shard directory so downstream "
    "consumers prune by path",
)
def sink_jsonl_shards(spark, sf_dir):
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="sparkmerge_jsonl_")
    try:
        docs = load(spark, sf_dir, "documents")
        docs.select("doc_id", "text", "lang").write.mode("overwrite").partitionBy(
            "lang"
        ).json(out)
        back = spark.read.schema("doc_id bigint, text string, lang string").json(out)
        result = back.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
        )
        return spark.createDataFrame(
            result.collect(), "lang string, n_docs bigint, total_chars bigint"
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register(
    "json_parse_quarantine",
    oracle="""
WITH fed AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 10 = 0 THEN 'x' || props ELSE props END AS props
    FROM events
)
SELECT event_type,
       CAST(count(*) FILTER (json_valid(props)) AS BIGINT) AS n_valid,
       CAST(count(*) FILTER (NOT json_valid(props)) AS BIGINT) AS n_quarantined,
       min(CASE WHEN NOT json_valid(props) THEN event_id END) AS first_quarantined_id
  FROM fed GROUP BY event_type
""",
    description="ingestion quarantine: malformed JSON payloads (a deterministic "
    "10% of the feed is corrupted in-fixture) are captured via "
    "columnNameOfCorruptRecord instead of silently nulling — the "
    "route-don't-drop pattern any production feed needs; single parse per "
    "row, one aggregation shuffle",
)
def json_parse_quarantine(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    fed = e.select(
        "event_id",
        "event_type",
        F.when(
            F.col("event_id") % 10 == 0, F.concat(F.lit("x"), F.col("props"))
        ).otherwise(F.col("props")).alias("props"),
    )
    parsed = fed.select(
        "event_id",
        "event_type",
        F.from_json(
            "props",
            "k INT, _corrupt STRING",
            {"columnNameOfCorruptRecord": "_corrupt"},
        ).alias("p"),
    )
    bad = F.col("p._corrupt").isNotNull()
    return parsed.groupBy("event_type").agg(
        F.count(F.when(~bad, 1)).alias("n_valid"),
        F.count(F.when(bad, 1)).alias("n_quarantined"),
        F.min(F.when(bad, F.col("event_id"))).alias("first_quarantined_id"),
    )


# --- z-order clustering + footer-stats file skipping (ext/layout.py) ---


# disjoint bit positions -> integer SUM is exactly the bitwise OR
_Z_SQL = """CAST(list_sum(list_transform(
  generate_series(0, 15),
  i -> (((x >> i) & 1) << (i * 2)) + (((y >> i) & 1) << (i * 2 + 1))
)) AS BIGINT)"""


@register(
    "table_zorder_layout",
    oracle=f"""
WITH t AS (
  SELECT o_orderkey,
         CAST(o_custkey % 65536 AS BIGINT) AS x,
         CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS y
    FROM orders)
SELECT o_orderkey, x, y, {_Z_SQL} AS zvalue FROM t
""",
    description="z-order (Morton) clustering key: native-expression bit "
    "interleave of (customer, order-date) — the Delta OPTIMIZE ZORDER BY "
    "layout lever; used as a repartitionByRange + sortWithinPartitions key "
    "so every output file covers a small (x, y) rectangle and footer "
    "min/max stats become selective on BOTH columns.  Whole-stage codegen, "
    "no shuffle in this verification projection",
)
def table_zorder_layout(spark, sf_dir):
    from sparkmerge.ext.layout import zorder_value

    o = load(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        (F.col("o_custkey") % 65536).cast("long").alias("x"),
        F.datediff("o_orderdate", F.lit("1992-01-01")).cast("long").alias("y"),
    )
    return t.select(
        "o_orderkey", "x", "y", zorder_value(F.col("x"), F.col("y")).alias("zvalue")
    )


def _ensure_zordered_orders(spark, sf_dir: str) -> str:
    """Derived fixture: orders rewritten once per sf_dir into 8 z-ordered
    parquet files (clustered on customer × order date)."""
    from sparkmerge.ext.layout import zorder_layout

    dst = _derived(sf_dir, "orders_zorder")
    done = os.path.join(dst, "_SUCCESS")
    if not os.path.exists(done):
        o = load(spark, sf_dir, "orders")
        zorder_layout(
            o,
            (F.col("o_custkey") % 65536).cast("long"),
            F.datediff("o_orderdate", F.lit("1992-01-01")).cast("long"),
            dst,
            n_files=8,
        )
    return dst


@register(
    "scan_stats_pruned",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
  FROM orders
 WHERE o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'
""",
    description="min/max footer-stats file skipping (Delta data-skipping / "
    "Iceberg-manifest shape): the scan consults parquet footers ONLY, drops "
    "files whose [min, max] o_orderdate cannot overlap the predicate, and "
    "keeps the residual filter so pruning is an optimization rather than a "
    "correctness dependency (stats-less files are conservatively read).  "
    "Oracle reads the original un-clustered table — a hash match proves "
    "skipping loses no rows",
)
def scan_stats_pruned(spark, sf_dir):
    import datetime

    from sparkmerge.ext.layout import pruned_parquet_scan

    path = _ensure_zordered_orders(spark, sf_dir)
    df, _read, _total = pruned_parquet_scan(
        spark, path, "o_orderdate",
        datetime.datetime(1996, 1, 1), datetime.datetime(1996, 3, 31),
    )
    return df.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")


# --- scan_csv_quarantine: malformed-row routing on the CSV ingest path ---
# (the CSV sibling of json_parse_quarantine: every 10th customer row is
# written with a non-numeric account balance — the classic upstream-export
# corruption — and PERMISSIVE parsing must ROUTE those rows to a corrupt
# column, not silently null or drop them)


def _ensure_corrupt_customer_csv(sf_dir: str) -> str:
    import pyarrow.parquet as pq

    dst = _derived(sf_dir, "customer_corrupt_csv/part-0.csv")
    if not os.path.exists(dst):
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        rows = pq.read_table(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_mktsegment", "c_acctbal"],
        ).to_pylist()
        tmp = f"{dst}.{os.getpid()}.tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("c_custkey,c_mktsegment,c_acctbal\n")
            for r in sorted(rows, key=lambda r: r["c_custkey"]):
                bal = "N/A" if r["c_custkey"] % 10 == 0 else repr(r["c_acctbal"])
                f.write(f"{r['c_custkey']},{r['c_mktsegment']},{bal}\n")
        os.replace(tmp, dst)
    return os.path.dirname(dst)


@register(
    "scan_csv_quarantine",
    oracle="""
SELECT c_mktsegment,
       CAST(count(*) FILTER (c_custkey % 10 <> 0) AS BIGINT) AS n_valid,
       CAST(count(*) FILTER (c_custkey % 10 = 0) AS BIGINT) AS n_quarantined,
       CAST(count(*) FILTER (c_custkey % 10 <> 0) AS BIGINT) AS n_parsed_bal,
       min(CASE WHEN c_custkey % 10 = 0 THEN c_custkey END) AS first_quarantined_key
  FROM customer GROUP BY c_mktsegment
""",
    description="CSV ingestion quarantine: a deterministic 10% of the feed "
    "carries a non-numeric acctbal ('N/A'); PERMISSIVE mode with "
    "columnNameOfCorruptRecord routes those rows to a corrupt column for "
    "quarantine instead of silently nulling or dropping them (FAILFAST "
    "would kill a 100 TB ingest on one bad upstream row; DROPMALFORMED "
    "would lose data unaudited).  The oracle recomputes the counts from "
    "the corruption rule on the clean table — a hash match proves routing "
    "is exact: no row lost, none misclassified",
)
def scan_csv_quarantine(spark, sf_dir):
    path = _ensure_corrupt_customer_csv(sf_dir)
    df = spark.read.csv(
        path,
        header=True,
        mode="PERMISSIVE",
        schema="c_custkey long, c_mktsegment string, c_acctbal double, _corrupt string",
        columnNameOfCorruptRecord="_corrupt",
    )
    bad = F.col("_corrupt").isNotNull()
    # count(c_acctbal) is load-bearing beyond the statistic: the CSV parser
    # prunes unreferenced columns, and an unparsed column can never fail
    # conversion — without a reference to c_acctbal NOTHING would be routed
    # to the corrupt column (spark.sql.csv.parser.columnPruning)
    return df.groupBy("c_mktsegment").agg(
        F.count(F.when(~bad, 1)).alias("n_valid"),
        F.count(F.when(bad, 1)).alias("n_quarantined"),
        F.count(F.col("c_acctbal")).alias("n_parsed_bal"),
        F.min(F.when(bad, F.col("c_custkey"))).alias("first_quarantined_key"),
    )


# --- scan_binary_files: raw-blob ingest source (r5) ----------------------


def _ensure_blob_dir(spark, sf_dir: str) -> str:
    dst = _derived(sf_dir, "doc_blobs")
    if not os.path.exists(os.path.join(dst, "_DONE")):
        os.makedirs(dst, exist_ok=True)
        # one .bin blob per sampled document, named by doc id — the layout
        # a multimodal ingest sees (image/audio payloads keyed by filename)
        rows = (
            load(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 5 == 0)
            .select("doc_id", "text")
            .collect()  # bounded: the sampled fixture subset, written once
        )
        for r in rows:
            with open(os.path.join(dst, f"doc_{r['doc_id']}.bin"), "wb") as fh:
                fh.write(r["text"].encode("utf-8"))
        open(os.path.join(dst, "_DONE"), "w").close()
    return dst


@register(
    "scan_binary_files",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5
  FROM documents WHERE doc_id % 5 = 0
""",
    description="raw-blob ingest source (`binaryFile`): per-file rows with "
    "path/length/content — the entry point for image/audio/video corpora "
    "before the mapInPandas decode stage (multimodal_binary); ids parsed "
    "from filenames map-side, md5 over the raw bytes proves content-"
    "lossless ingest vs the oracle's utf-8 encoding of the source text; "
    "files split across tasks by the source, no shuffle",
)
def scan_binary_files(spark, sf_dir):
    path = _ensure_blob_dir(spark, sf_dir)
    blobs = spark.read.format("binaryFile").load(f"{path}/*.bin")
    return blobs.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1).cast("long").alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )
