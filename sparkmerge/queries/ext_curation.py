"""[EXT] round-4 data-curation operators (SURVEY.md §2.D, r4 batch).

The operations a training-data pipeline runs between "raw filtered corpus"
and "tensors on the trainer": chunking documents into context windows,
quality-weighted epoch up-sampling, curriculum ordering, per-stratum
reservoir sampling, web-markup stripping, radius similarity search,
exact-integer correlation profiling, and TF-IDF keyword extraction.

Not in the reference (it has no corpus layer); test data cited instead.
Shared design rules with the rest of the registry:

- every op is native column expressions (codegen'd, no Python in the path);
- randomness is replaced by multiplicative hashes of the row key (the
  ``sample_stratified`` / ``pipeline_shard_shuffle`` convention), so reruns
  are byte-identical at any scale and the DuckDB oracle can replay them;
- floating-point outputs are either single IEEE operations on exact
  integer inputs or explicitly association-ordered folds, never
  order-dependent double sums (see agg_corr_pairs / text_keyword_tfidf
  notes), so the driver's value-hash gate passes without tolerance.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkmerge.ext.similarity import cosine
from sparkmerge.ext.text import token_count, whitespace_tokens
from sparkmerge.queries import load, register
from sparkmerge.queries.ext_similarity import _cos_sql

_WS = r"\s+"
_TOKS_RAW = f"list_filter(string_split_regex(text, '{_WS}'), x -> x <> '')"
_TOKS_LOWER = f"list_filter(string_split_regex(lower(text), '{_WS}'), x -> x <> '')"

# Knuth multiplicative hash of the doc id in [0, 1) — the registry's standard
# RNG replacement (exact dyadic rational, identical in both engines).
_U_SQL = "(((doc_id % 2147483647) * 2654435761) % 4294967296) / 4294967296.0"


def _u(col):
    return (((col % F.lit(2147483647)) * F.lit(2654435761)) % F.lit(4294967296)) / F.lit(4294967296.0)


# --- pipeline_chunk_split: documents -> overlapping context-window chunks ---

_CHUNK = 64  # tokens per chunk
_STRIDE = 48  # tokens between chunk starts (16-token overlap)


@register(
    "pipeline_chunk_split",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_TOKS_RAW} AS toks FROM documents
),
e AS (
  SELECT doc_id, toks, len(toks) AS n,
         unnest(range(0, len(toks), {_STRIDE})) AS start
    FROM t WHERE len(toks) > 0
)
SELECT doc_id,
       CAST(start // {_STRIDE} AS INT) AS chunk_id,
       array_to_string(list_slice(toks, start + 1, start + {_CHUNK}), ' ') AS chunk_text,
       CAST(least({_CHUNK}, n - start) AS INT) AS n_chunk_tokens
  FROM e
""",
    description=f"document chunking for RAG / pretraining context windows: "
    f"{_CHUNK}-token chunks every {_STRIDE} tokens (overlap preserves "
    f"boundary context); tokenize ONCE per doc, then sequence+explode+slice "
    f"— pure map-side flat-map, zero shuffles at any corpus size",
)
def pipeline_chunk_split(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        whitespace_tokens(F.col("text")).alias("toks"),
    ).withColumn("n", F.size("toks")).filter(F.col("n") > 0)
    e = t.select(
        "doc_id",
        "toks",
        "n",
        F.explode(F.sequence(F.lit(0), F.col("n") - 1, F.lit(_STRIDE))).alias("start"),
    )
    return e.select(
        "doc_id",
        F.expr(f"start DIV {_STRIDE}").cast("int").alias("chunk_id"),
        F.array_join(F.slice("toks", F.col("start") + 1, F.lit(_CHUNK)), " ").alias(
            "chunk_text"
        ),
        F.least(F.lit(_CHUNK), F.col("n") - F.col("start")).cast("int").alias(
            "n_chunk_tokens"
        ),
    )


# --- pipeline_repeat_upsample: quality-weighted epoch repeats ---

_W_SQL = (
    "CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 2.5 "
    "WHEN source IN ('src5','src6','src7','src8','src9') THEN 1.75 "
    "ELSE 1.0 END"
)


@register(
    "pipeline_repeat_upsample",
    oracle=f"""
WITH w AS (
  SELECT doc_id, source, {_W_SQL} AS wt, {_U_SQL} AS u FROM documents
),
r AS (
  SELECT doc_id, source,
         CAST(CAST(floor(wt) AS BIGINT)
              + (CASE WHEN u < wt - floor(wt) THEN 1 ELSE 0 END) AS INT) AS n_rep
    FROM w
)
SELECT doc_id, source, n_rep,
       CAST(unnest(generate_series(1, n_rep)) AS INT) AS copy_id
  FROM r
""",
    description="fractional epoch up-sampling for training mixes (high-value "
    "sources repeated ~2.5x): integer part of the weight repeats every doc, "
    "the fractional part repeats a deterministic hash-chosen subset — so the "
    "expected mix is exact, reruns are byte-identical, and the explode is "
    "map-side (no shuffle, no RNG state to coordinate across executors)",
)
def pipeline_repeat_upsample(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    wt = (
        F.when(F.col("source").isin([f"src{i}" for i in range(5)]), F.lit(2.5))
        .when(F.col("source").isin([f"src{i}" for i in range(5, 10)]), F.lit(1.75))
        .otherwise(F.lit(1.0))
    )
    u = _u(F.col("doc_id"))
    n_rep = (
        F.floor(wt) + (u < (wt - F.floor(wt))).cast("bigint")
    ).cast("int")
    r = d.select("doc_id", "source", n_rep.alias("n_rep"))
    return r.select(
        "doc_id",
        "source",
        "n_rep",
        F.explode(F.sequence(F.lit(1), F.col("n_rep"))).alias("copy_id"),
    )


# --- pipeline_curriculum_order: difficulty-staged, shard-parallel ordering ---


@register(
    "pipeline_curriculum_order",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN len({_TOKS_RAW}) < 50 THEN 0
              WHEN len({_TOKS_RAW}) < 200 THEN 1 ELSE 2 END AS stage,
         CAST((((doc_id % 2147483647) * 2654435761) % 4294967296) % 16 AS INT) AS shard,
         CAST((doc_id * 40503) % 65536 AS BIGINT) AS hkey
    FROM documents
)
SELECT doc_id, stage, shard,
       CAST(row_number() OVER (PARTITION BY stage, shard
                               ORDER BY hkey, doc_id) AS INT) AS pos
  FROM t
""",
    description="curriculum ordering: docs staged by length-difficulty "
    "(short -> long), shuffled WITHIN each stage by an independent hash so "
    "the trainer sees no length bias inside a stage; positions are per "
    "(stage, shard) windows — 16-way parallel per stage, never a global "
    "sort — consumers drain shards round-robin per stage",
)
def pipeline_curriculum_order(spark, sf_dir):
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    n = token_count(F.col("text"))
    stage = F.when(n < 50, 0).when(n < 200, 1).otherwise(2)
    shard = ((((F.col("doc_id") % 2147483647) * 2654435761) % 4294967296) % 16).cast("int")
    hkey = ((F.col("doc_id") * 40503) % 65536).cast("bigint")
    t = d.select(
        "doc_id", stage.alias("stage"), shard.alias("shard"), hkey.alias("hkey")
    )
    w = Window.partitionBy("stage", "shard").orderBy("hkey", "doc_id")
    return t.select(
        "doc_id", "stage", "shard", F.row_number().over(w).cast("int").alias("pos")
    )


# --- agg_reservoir_sample: per-stratum uniform k-sample without RNG ---


@register(
    "agg_reservoir_sample",
    oracle=f"""
SELECT lang, doc_id, CAST(rk AS INT) AS rk FROM (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY CAST(((doc_id % 2147483647) * 2654435761) % 4294967296 AS BIGINT),
                                     doc_id) AS rk
    FROM documents) t
 WHERE rk <= 20
""",
    description="distributed reservoir sampling via the order-statistic "
    "trick: the k rows with the smallest hash values ARE a uniform "
    "k-sample without replacement — per-stratum top-k windows instead of "
    "sequential reservoir state, so it parallelizes (one shuffle keyed by "
    "stratum) and reruns/backfills pick the identical sample",
)
def agg_reservoir_sample(spark, sf_dir):
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    hkey = (((F.col("doc_id") % 2147483647) * 2654435761) % 4294967296).cast("bigint")
    t = d.select("lang", "doc_id", hkey.alias("hkey"))
    w = Window.partitionBy("lang").orderBy("hkey", "doc_id")
    return (
        t.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("lang", "doc_id", F.col("rk").cast("int").alias("rk"))
    )


# --- text_markup_strip: web-corpus HTML cleaning ---

_TAG_RE = r"<[^>]+>"
_ENT_RE = r"&[a-z]+;"


@register(
    "text_markup_strip",
    oracle=f"""
WITH aug AS (
  SELECT doc_id,
         '<html><body><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>' || text
         || '</p><a href="https://data.example/doc/'
         || CAST(doc_id AS VARCHAR) || '">src &amp; more</a>&nbsp;</body></html>' AS t
    FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_TAG_RE}')) AS INT) AS n_tags,
       CAST(len(regexp_extract_all(t, '{_ENT_RE}')) AS INT) AS n_entities,
       trim(regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(t, '{_TAG_RE}', ' ', 'g'),
             '&amp;', '&', 'g'),
           '&nbsp;', ' ', 'g'),
         '{_WS}', ' ', 'g')) AS cleaned
  FROM aug
""",
    description="web-markup stripping for crawl corpora: tag removal, entity "
    "decode, whitespace normalization (the corpus has no HTML, so a "
    "deterministic per-doc wrapper is applied first — the strip machinery is "
    "what's under test); four chained codegen'd regexp passes, zero shuffles",
)
def text_markup_strip(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    aug = F.concat(
        F.lit("<html><body><h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit('</p><a href="https://data.example/doc/'),
        F.col("doc_id").cast("string"),
        F.lit('">src &amp; more</a>&nbsp;</body></html>'),
    )
    base = d.select("doc_id", aug.alias("t"))
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.col("t"), _TAG_RE, " "), "&amp;", "&"
                ),
                "&nbsp;",
                " ",
            ),
            _WS,
            " ",
        )
    )
    return base.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_TAG_RE), F.lit(0))).alias("n_tags"),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_ENT_RE), F.lit(0))).alias(
            "n_entities"
        ),
        cleaned.alias("cleaned"),
    )


# --- ann_range_search: radius neighbors (threshold, not top-k) ---

_TAU = 0.25


@register(
    "ann_range_search",
    oracle=f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS n_id, embedding AS n_vec FROM embeddings)
SELECT q.q_id, c.n_id, {_cos_sql('q.q_vec', 'c.n_vec')} AS sim
  FROM c CROSS JOIN q
 WHERE q.q_id <> c.n_id AND {_cos_sql('q.q_vec', 'c.n_vec')} >= {_TAU}
""",
    description=f"radius similarity search: ALL neighbors with cosine >= "
    f"{_TAU} per query (vector-DB range query; top-k misses dense regions, "
    f"radius search doesn't) — broadcast query set, one corpus scan, the "
    f"threshold filter runs map-side so NOTHING shuffles (unlike top-k's "
    f"rank window); cosine is the registry's left-fold, replayed "
    f"bit-exactly by the oracle",
)
def ann_range_search(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    c = emb.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_vec"))
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("sim"))
        .filter(F.col("sim") >= _TAU)
    )


# --- agg_corr_pairs: exact-integer Pearson correlation profiling ---


def _corr_sql(n, sx, sy, sxy, sxx, syy):
    """((n*sxy) - (sx*sy)) / (sqrt((n*sxx) - (sx*sx)) * sqrt((n*syy) - (sy*sy)))
    — every operand an exact integer sum cast to double, every operation a
    single IEEE op, association order fixed and mirrored in Spark."""
    return (
        f"(({n} * {sxy}) - ({sx} * {sy}))"
        f" / (sqrt(({n} * {sxx}) - ({sx} * {sx}))"
        f" * sqrt(({n} * {syy}) - ({sy} * {sy})))"
    )


@register(
    "agg_corr_pairs",
    oracle=f"""
WITH t AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(round(l_extendedprice) AS BIGINT) AS e,
         CAST(round(l_discount * 100) AS BIGINT) AS d,
         CAST(round(l_tax * 100) AS BIGINT) AS x
    FROM lineitem
),
s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(q) AS DOUBLE) AS sq, CAST(sum(e) AS DOUBLE) AS se,
         CAST(sum(d) AS DOUBLE) AS sd, CAST(sum(x) AS DOUBLE) AS sx,
         CAST(sum(q * q) AS DOUBLE) AS sqq, CAST(sum(e * e) AS DOUBLE) AS see,
         CAST(sum(d * d) AS DOUBLE) AS sdd, CAST(sum(x * x) AS DOUBLE) AS sxx,
         CAST(sum(q * e) AS DOUBLE) AS sqe, CAST(sum(q * d) AS DOUBLE) AS sqd,
         CAST(sum(e * x) AS DOUBLE) AS sex
    FROM t
)
SELECT 'quantity_extendedprice' AS pair,
       {_corr_sql('n', 'sq', 'se', 'sqe', 'sqq', 'see')} AS corr FROM s
UNION ALL
SELECT 'quantity_discount' AS pair,
       {_corr_sql('n', 'sq', 'sd', 'sqd', 'sqq', 'sdd')} AS corr FROM s
UNION ALL
SELECT 'extendedprice_tax' AS pair,
       {_corr_sql('n', 'se', 'sx', 'sex', 'see', 'sxx')} AS corr FROM s
""",
    description="Pearson correlation across measure pairs WITHOUT the "
    "order-dependent double sums of a naive corr(): measures are scaled to "
    "exact integers (dollars / basis points), all sums and cross-sums "
    "accumulate exactly in int64 (magnitudes kept under 2^53 so the final "
    "double casts are exact), and the correlation is a fixed-association "
    "chain of single IEEE ops — bit-deterministic under any partitioning, "
    "which a float sum is not; ONE map-side-combined aggregate over the "
    "fact table, output is 3 tiny rows",
)
def agg_corr_pairs(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    t = li.select(
        F.col("l_quantity").cast("bigint").alias("q"),
        F.round("l_extendedprice").cast("bigint").alias("e"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("d"),
        F.round(F.col("l_tax") * 100).cast("bigint").alias("x"),
    )
    s = t.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("q").cast("double").alias("sq"),
        F.sum("e").cast("double").alias("se"),
        F.sum("d").cast("double").alias("sd"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("q") * F.col("q")).cast("double").alias("sqq"),
        F.sum(F.col("e") * F.col("e")).cast("double").alias("see"),
        F.sum(F.col("d") * F.col("d")).cast("double").alias("sdd"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("q") * F.col("e")).cast("double").alias("sqe"),
        F.sum(F.col("q") * F.col("d")).cast("double").alias("sqd"),
        F.sum(F.col("e") * F.col("x")).cast("double").alias("sex"),
    )

    def corr(sx, sy, sxy, sxx, syy):
        n = F.col("n")
        return ((n * F.col(sxy)) - (F.col(sx) * F.col(sy))) / (
            F.sqrt((n * F.col(sxx)) - (F.col(sx) * F.col(sx)))
            * F.sqrt((n * F.col(syy)) - (F.col(sy) * F.col(sy)))
        )

    out = s.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("quantity_extendedprice").alias("pair"),
                    corr("sq", "se", "sqe", "sqq", "see").alias("corr"),
                ),
                F.struct(
                    F.lit("quantity_discount").alias("pair"),
                    corr("sq", "sd", "sqd", "sqq", "sdd").alias("corr"),
                ),
                F.struct(
                    F.lit("extendedprice_tax").alias("pair"),
                    corr("se", "sx", "sex", "see", "sxx").alias("corr"),
                ),
            )
        ).alias("r")
    )
    return out.select(F.col("r.pair").alias("pair"), F.col("r.corr").alias("corr"))


# --- text_keyword_tfidf: per-document top keywords, transcendental-free ---


@register(
    "text_keyword_tfidf",
    oracle=f"""
WITH tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, unnest({_TOKS_LOWER}) AS tok FROM documents)
   GROUP BY doc_id, tok
),
df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok,
         CAST(tf.tf AS DOUBLE)
           * ((CAST(nd.n_docs - df.df AS DOUBLE) + 0.5)
              / (CAST(df.df AS DOUBLE) + 0.5)) AS score
    FROM tf JOIN df USING (tok) CROSS JOIN nd
)
SELECT doc_id, tok AS token, score, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, tok) AS rk
    FROM scored) t
 WHERE rk <= 3
""",
    description="per-document keyword extraction: top-3 tokens by TF-IDF "
    "where idf is the BM25-style exact odds ratio (N-df+0.5)/(df+0.5) — a "
    "single division on exact integers, NO log/transcendentals, so the "
    "score is bit-deterministic across engines; tokenize+count once, the "
    "corpus-small df table joins on token, corpus stats ride a broadcast "
    "row — shuffles stay O(tokens) with full map-side combine",
)
def text_keyword_tfidf(spark, sf_dir):
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    toks = whitespace_tokens(F.lower(F.col("text")))
    tf = (
        d.select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    nd = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "tok",
            (
                F.col("tf").cast("double")
                * (
                    ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
                    / (F.col("df").cast("double") + F.lit(0.5))
                )
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", F.col("tok").alias("token"), "score", F.col("rk").cast("int").alias("rk"))
    )
