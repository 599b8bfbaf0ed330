"""[EXT] corpus-hygiene operators: segment-level dedup, per-source budgets,
corpus-LM scoring, URL parsing (SURVEY.md §2.D additions, round 2).

These extend the training-data pipeline surface with the remaining standard
web-corpus preparation passes (CCNet/RefinedWeb-style line dedup, per-domain
token budgets, unigram-LM rarity scoring).  All native-function dataflows —
no Python UDFs; every op carries a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparkmerge.queries import load, register

_WS = r"\s+"
_TOKS = f"list_filter(string_split_regex(lower(text), '{_WS}'), x -> x <> '')"

# segment width (tokens) and corpus-occurrence threshold for line dedup
_SEG_W = 4
_SEG_DUP = 3


@register(
    "text_line_dedup",
    oracle=f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
base AS (
  SELECT doc_id, CAST((len(t) + {_SEG_W - 1}) // {_SEG_W} AS INT) AS n_segments, t
    FROM toks),
segj AS (SELECT doc_id, t, unnest(generate_series(0, n_segments - 1)) AS j FROM base),
seg AS (
  SELECT doc_id, CAST(j AS INT) AS pos,
         array_to_string(t[j * {_SEG_W} + 1 : j * {_SEG_W} + {_SEG_W}], ' ') AS seg
    FROM segj),
dup AS (SELECT seg FROM seg GROUP BY seg HAVING count(*) >= {_SEG_DUP}),
kept AS (SELECT s.* FROM seg s ANTI JOIN dup d USING (seg)),
re AS (
  SELECT doc_id, CAST(count(*) AS INT) AS n_kept,
         string_agg(seg, ' ' ORDER BY pos) AS cleaned_text
    FROM kept GROUP BY doc_id)
SELECT b.doc_id, b.n_segments,
       CAST(coalesce(r.n_kept, 0) AS INT) AS n_kept,
       coalesce(r.cleaned_text, '') AS cleaned_text
  FROM base b LEFT JOIN re r USING (doc_id)
""",
    description="CCNet/RefinedWeb-style corpus-level line dedup: documents are "
    "segmented into fixed 4-token 'lines', segments occurring >=3 times "
    "ANYWHERE in the corpus (boilerplate) are removed from every document, "
    "and the survivors are reassembled in order.  The duplicate-segment set "
    "is tiny relative to the corpus, so the removal join is a BROADCAST "
    "anti-join — two shuffles total (segment count, reassembly) regardless "
    "of corpus size",
)
def text_line_dedup(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    # own projection so Generate sits on a barrier (no per-element re-split)
    tokd = d.select(
        "doc_id",
        F.filter(F.split(F.lower(F.col("text")), _WS), lambda x: x != "").alias("toks"),
    )
    toks = F.col("toks")
    nseg = F.ceil(F.size(toks) / _SEG_W).cast("int")
    base = tokd.select("doc_id", nseg.alias("n_segments"), toks.alias("toks"))
    segs = F.when(
        F.col("n_segments") >= 1,
        F.transform(
            F.sequence(F.lit(0), F.col("n_segments") - 1),
            lambda j: F.array_join(F.slice(F.col("toks"), j * _SEG_W + 1, _SEG_W), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    seg = base.select("doc_id", F.posexplode(segs).alias("pos", "seg"))
    dup = (
        seg.groupBy("seg")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= _SEG_DUP)
        .select("seg")
    )
    kept = seg.join(F.broadcast(dup), "seg", "left_anti")
    re = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("cleaned_text"),
    )
    return (
        base.select("doc_id", "n_segments")
        .join(re, "doc_id", "left")
        .select(
            "doc_id",
            "n_segments",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("int").alias("n_kept"),
            F.coalesce(F.col("cleaned_text"), F.lit("")).alias("cleaned_text"),
        )
    )


@register(
    "pipeline_source_cap",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
    FROM documents),
c AS (
  SELECT *,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY n_tokens DESC, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
    FROM t)
SELECT doc_id, source, n_tokens, cum_tokens
  FROM c
 WHERE cum_tokens <= 2000
""",
    description="per-domain token budget: within each source, keep documents "
    "(longest first, doc_id tiebreak) while the running token total stays "
    "under budget — the standard over-represented-domain cap in training "
    "mixes.  One window shuffle keyed by source; no global sort",
)
def pipeline_source_cap(spark, sf_dir):
    from sparkmerge.ext.text import whitespace_tokens

    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "source",
        F.size(whitespace_tokens(F.lower(F.col("text")))).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("n_tokens"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return c.filter(F.col("cum_tokens") <= 2000)


@register(
    "text_lm_score",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS w FROM documents),
freq AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY w),
j AS (SELECT t.doc_id, f.f FROM tok t JOIN freq f USING (w))
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(f) AS BIGINT) AS sum_tok_freq,
       CAST(min(f) AS BIGINT) AS min_tok_freq,
       CAST(sum(f) AS DOUBLE) / count(*) AS avg_tok_freq
  FROM j GROUP BY doc_id
""",
    description="corpus-unigram-LM scoring: build the corpus unigram frequency "
    "table, score each document by total/min/mean token frequency — the "
    "cheap LM-rarity signal quality filters threshold on (rare-token-heavy "
    "docs are OCR noise; common-token-only docs are boilerplate).  Exact "
    "integer aggregates + ONE IEEE division, so bit-deterministic; vocab "
    "table is corpus-small and the join key is the token",
)
def text_lm_score(spark, sf_dir):
    from sparkmerge.ext.text import whitespace_tokens

    d = load(spark, sf_dir, "documents")
    tokd = d.select(
        "doc_id", whitespace_tokens(F.lower(F.col("text"))).alias("toks")
    )
    tok = tokd.select("doc_id", F.explode("toks").alias("w"))
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    j = tok.join(freq, "w")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("f").cast("bigint").alias("sum_tok_freq"),
        F.min("f").cast("bigint").alias("min_tok_freq"),
        (F.sum("f").cast("double") / F.count(F.lit(1))).alias("avg_tok_freq"),
    )


@register(
    "merge_schema_evolution",
    oracle="""
SELECT c_custkey, c_name, c_nationkey, c_mktsegment
  FROM customer WHERE c_custkey % 5 <> 0
UNION ALL
SELECT c_custkey, c_name, c_nationkey, CAST(NULL AS VARCHAR) AS c_mktsegment
  FROM customer WHERE c_custkey % 3 <> 0 AND c_custkey % 5 = 0
""",
    description="schema evolution on merge (Delta mergeSchema behavior, "
    "relaxing sp_SimpleMerge.sql:200-201's source ⊆ target rule behind an "
    "opt-in): the source carries a column the target lacks; the target is "
    "widened with a typed NULL, matched rows take the source value, "
    "kept-unmatched rows read back NULL.  Same single full-outer-join plan "
    "as merge_full — evolution is a zero-cost projection",
)
def merge_schema_evolution(spark, sf_dir):
    from sparkmerge.merge import merge_preview

    c = load(spark, sf_dir, "customer")
    target = c.filter(F.col("c_custkey") % 3 != 0).select(
        "c_custkey", "c_name", "c_nationkey"
    )
    source = c.filter(F.col("c_custkey") % 5 != 0).select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    return merge_preview(
        target, source, "c_custkey", delete="NO", schema_evolution=True
    )


@register(
    "fn_url_ops",
    oracle="""
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
           || '?lang=' || lang || '&p=' || CAST(doc_id % 7 AS VARCHAR)
           || '#s1' AS url
    FROM documents)
SELECT doc_id,
       regexp_extract(url, '^([a-z]+)://', 1) AS proto,
       regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
       regexp_extract(url, '\\?([^#]*)', 1) AS query,
       regexp_extract(url, '[?&]p=([^&#]*)', 1) AS p_param,
       regexp_extract(url, '#(.*)$', 1) AS fragment
  FROM u
""",
    description="URL decomposition for web-corpus pipelines (host-level dedup, "
    "domain mixing, tracking-param stripping): Spark's native parse_url "
    "(java.net.URI, codegen'd) vs a regexp oracle — protocol, host, path, "
    "query, single query param, fragment.  Pure map-side",
)
def fn_url_ops(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&p="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("#s1"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.expr("parse_url(url, 'PROTOCOL')").alias("proto"),
        F.expr("parse_url(url, 'HOST')").alias("host"),
        F.expr("parse_url(url, 'PATH')").alias("path"),
        F.expr("parse_url(url, 'QUERY')").alias("query"),
        F.expr("parse_url(url, 'QUERY', 'p')").alias("p_param"),
        F.expr("parse_url(url, 'REF')").alias("fragment"),
    )


# --- pipeline_mix_temperature (r5) ---------------------------------------


@register(
    "pipeline_mix_temperature",
    oracle="""
WITH t AS (
  SELECT source,
         CAST(sum(len(list_filter(string_split_regex(text, '\\s+'),
                                  x -> x <> ''))) AS BIGINT) AS tokens
    FROM documents GROUP BY source
),
m AS (SELECT t.*, (SELECT max(tokens) FROM t) AS max_tokens FROM t)
SELECT source, tokens,
       sqrt(CAST(tokens AS DOUBLE) / CAST(max_tokens AS DOUBLE)) AS rel_weight,
       sqrt(CAST(max_tokens AS DOUBLE) / CAST(tokens AS DOUBLE)) AS upsample_rate
  FROM m
""",
    description="temperature-scaled (α=0.5) sampling mix across sources — "
    "the multilingual/multi-domain rebalancing rule (p_i ∝ T_i^α): per-"
    "domain exact integer token totals, weights RELATIVE TO THE LARGEST "
    "domain so the only FP ops are one division + one correctly-rounded "
    "IEEE sqrt (no order-dependent cross-domain float sum); one agg "
    "shuffle + a window over the domain-sized aggregate",
)
def pipeline_mix_temperature(spark, sf_dir):
    from pyspark.sql.window import Window

    from sparkmerge.ext.text import token_count

    d = load(spark, sf_dir, "documents")
    t = d.groupBy("source").agg(
        F.sum(token_count(F.col("text")).cast("long")).alias("tokens")
    )
    w = Window.partitionBy()  # domain-count rows only — never data-sized
    m = t.withColumn("max_tokens", F.max("tokens").over(w))
    ratio = F.col("tokens").cast("double") / F.col("max_tokens").cast("double")
    inv = F.col("max_tokens").cast("double") / F.col("tokens").cast("double")
    return m.select(
        "source", "tokens",
        F.sqrt(ratio).alias("rel_weight"),
        F.sqrt(inv).alias("upsample_rate"),
    )


# --- pipeline_bpe_apply (r5) ---------------------------------------------

# A fixed learned merge table (the artifact bpe_train_rounds produces),
# applied in training order.  Later merges compose over earlier ones
# ("t h" -> "th", then "th e" -> "the"), exactly like a real tokenizer's
# merges.txt replay.
_BPE_MERGES = [("t", "h"), ("th", "e"), ("e", "r"), ("i", "n"), ("a", "n")]


def _bpe_apply_word_sql() -> str:
    expr = "'|' || array_to_string(string_split(w, ''), '| |') || '|'"
    for a, b in _BPE_MERGES:
        expr = f"replace({expr}, '|{a}| |{b}|', '|{a}{b}|')"
    return expr


@register(
    "pipeline_bpe_apply",
    oracle=f"""
WITH words AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+', 0) AS ws
    FROM documents
),
sym AS (
  SELECT doc_id, ws,
         list_transform(ws, w ->
           {_bpe_apply_word_sql()}
         ) AS merged
    FROM words
)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_words,
       CAST(coalesce(list_sum(list_transform(merged,
              s -> len(string_split(s, ' ')))), 0) AS BIGINT) AS n_symbols
  FROM sym
""",
    description="tokenizer-inference twin of bpe_train_rounds: replay a "
    "fixed merge table (training order, later merges composing over "
    "earlier) against every word via chained boundary-safe pipe-wrapped "
    "replaces — identical leftmost-nonoverlapping semantics in both "
    "engines; pure map-side (ZERO shuffles), the shape of applying "
    "merges.txt to a 100 TB corpus",
)
def pipeline_bpe_apply(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    words = F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")

    def apply_merges(w):
        s = F.concat(F.lit("|"), F.array_join(F.split(w, ""), "| |"), F.lit("|"))
        for a, b in _BPE_MERGES:
            s = F.replace(s, F.lit(f"|{a}| |{b}|"), F.lit(f"|{a}{b}|"))
        return s

    merged = F.transform(words, apply_merges)
    n_symbols = F.aggregate(
        F.transform(merged, lambda s: F.size(F.split(s, " "))),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        n_symbols.alias("n_symbols"),
    )


# --- text_substring_dup_spans (r5) ---------------------------------------

_SS_W = 40   # shingle width (chars)
_SS_STRIDE = 10  # sampling stride


@register(
    "text_substring_dup_spans",
    oracle=f"""
WITH starts AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text) - {_SS_W} + 1, 1),
                                {_SS_STRIDE})) AS p
    FROM documents
),
pos AS (
  SELECT doc_id, substr(text, CAST(p AS INT), {_SS_W}) AS sh FROM starts
),
rep AS (
  SELECT sh FROM pos GROUP BY sh HAVING count(DISTINCT doc_id) >= 2
)
SELECT p.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(count(*) FILTER (r.sh IS NOT NULL) AS BIGINT) AS n_dup_shingles
  FROM pos p LEFT JOIN rep r ON r.sh = p.sh
 GROUP BY p.doc_id
""",
    description="cross-document SUBSTRING duplication (the suffix-array "
    "exact-substring dedup signal, shingle-approximated): 40-char shingles "
    "sampled every 10 chars, shingles appearing in ≥2 docs flagged, per-doc "
    "duplicated-shingle fraction — catches copied passages line-boundary-"
    "free (text_line_dedup's complement); one explode + count shuffle + "
    "co-partitioned join-back, cost linear in corpus chars / stride",
)
def text_substring_dup_spans(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.length("text") - F.lit(_SS_W - 1), F.lit(1)),
        F.lit(_SS_STRIDE),
    )
    pos = d.select(
        "doc_id",
        F.explode(starts).alias("p"),
        "text",
    ).select("doc_id", F.expr(f"substr(text, p, {_SS_W})").alias("sh"))
    rep = (
        pos.groupBy("sh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("sh")
    )
    return (
        pos.join(rep.withColumn("hit", F.lit(1)), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("hit").isNotNull(), 1).otherwise(0)).cast("long").alias("n_dup_shingles"),
        )
    )
