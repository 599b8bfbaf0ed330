"""[EXT] text-analysis operators over documents/events (SURVEY.md §2.D)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkmerge.ext.text import (
    LANG_MARKERS,
    TOKEN_REGEX,
    fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    regex_token_count,
    stopword_ratio,
    text_stats,
    token_count,
)
from sparkmerge.queries import load, register

_WS = r"\s+"
_TOKS = f"list_filter(string_split_regex(lower(text), '{_WS}'), x -> x <> '')"
_TOKS_RAW = f"list_filter(string_split_regex(text, '{_WS}'), x -> x <> '')"


@register(
    "text_stats",
    oracle=f"""
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(sum(len({_TOKS_RAW})) AS BIGINT) AS total_tokens,
       CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) AS total_lexer_tokens,
       min(CAST(length(text) AS INT)) AS min_chars,
       max(CAST(length(text) AS INT)) AS max_chars
  FROM documents
 GROUP BY lang
""",
    description="per-language corpus stats: docs, chars, whitespace + lexer token counts",
)
def q_text_stats(spark, sf_dir):
    return text_stats(load(spark, sf_dir, "documents"))


@register(
    "text_tokens",
    oracle=f"""
SELECT doc_id,
       CAST(len({_TOKS_RAW}) AS INT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_lexer_tokens
  FROM documents
""",
    description="per-document token counting: whitespace + BPE-ish lexer regex",
)
def text_tokens(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        token_count(t).alias("n_ws_tokens"),
        regex_token_count(t).alias("n_lexer_tokens"),
    )


@register(
    "text_quality",
    oracle=f"""
SELECT doc_id,
       CAST(length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{{}}-]', '', 'g')) AS DOUBLE)
         / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
       CAST(len(list_filter({_TOKS}, t -> t IN ('the','and','of','to','in'))) AS DOUBLE)
         / CAST(greatest(len({_TOKS}), 1) AS DOUBLE) AS en_stopword_ratio,
       (CASE WHEN len({_TOKS_RAW}) BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END * 0.4
        + CASE WHEN CAST(length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{{}}-]', '', 'g')) AS DOUBLE)
                    / CAST(greatest(length(text), 1) AS DOUBLE) <= 0.2 THEN 1.0 ELSE 0.0 END * 0.3
        + CASE WHEN len(list_filter({_TOKS}, t -> t IN ('the','and','of','to','in'))) > 0
               THEN 1.0 ELSE 0.0 END * 0.3) AS quality
  FROM documents
""",
    description="per-document quality scoring: punctuation/stopword ratios + composite score",
)
def text_quality(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        punct_ratio(t).alias("punct_ratio"),
        stopword_ratio(t, LANG_MARKERS["en"]).alias("en_stopword_ratio"),
        quality_score(t).alias("quality"),
    )


def _langid_sql() -> str:
    score = {
        lang: f"len(list_filter({_TOKS}, t -> t IN ({', '.join(repr(m) for m in LANG_MARKERS[lang])})))"
        for lang in sorted(LANG_MARKERS)
    }
    best = f"greatest({', '.join(score.values())})"
    pick = "'und'"
    for lang in sorted(LANG_MARKERS, reverse=True):
        pick = f"CASE WHEN {score[lang]} = {best} AND {best} > 0 THEN '{lang}' ELSE {pick} END"
    return f"SELECT doc_id, lang, {pick} AS predicted_lang FROM documents"


@register(
    "text_langid",
    oracle=_langid_sql(),
    description="language-ID heuristic: stopword-marker hit argmax with deterministic tiebreak",
)
def text_langid(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", lang_id(F.col("text")).alias("predicted_lang"))


@register(
    "text_fingerprint",
    oracle="""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
         (acc, c) -> (acc * 31 + c) % 1000000007) AS fp
  FROM documents
""",
    description="document fingerprint: polynomial rolling hash over char codes (mod 1e9+7)",
)
def text_fingerprint(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint(F.col("text")).alias("fp"))


@register(
    "json_extract_props",
    oracle="""
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
       (json_extract_string(props, '$.missing') IS NULL) AS missing_is_null
  FROM events
""",
    description="typed field extraction from JSON event payloads via from_json "
    "(ONE parse per row regardless of field count — get_json_object re-parses "
    "the document per field, the wrong shape at scale)",
)
def json_extract_props(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k INT, missing STRING")
    return e.select(
        "event_id",
        "event_type",
        parsed.getField("k").alias("k_value"),
        parsed.getField("missing").isNull().alias("missing_is_null"),
    )


@register(
    "sample_stratified",
    oracle="""
SELECT doc_id, lang
  FROM documents
 WHERE ((doc_id * 2654435761) % 4294967296) / 4294967296.0
       < (CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25 ELSE 0.1 END)
""",
    description="deterministic stratified sampling for training-data mixes: "
    "per-language rates via a Knuth multiplicative hash of the doc id — "
    "reproducible across engines and runs (no RNG), prunable, shuffle-free",
)
def sample_stratified(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    u = ((F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)) / F.lit(4294967296.0)
    rate = (
        F.when(F.col("lang") == "en", 0.5)
        .when(F.col("lang") == "de", 0.25)
        .otherwise(0.1)
    )
    return d.filter(u < rate).select("doc_id", "lang")


_FP_SQL = """list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
         (acc, c) -> (acc * 31 + c) % 1000000007)"""

_PR_SQL = """CAST(length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE)
         / CAST(greatest(length(text), 1) AS DOUBLE)"""


@register(
    "pipeline_training_mix",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang,
         CAST(len({_TOKS_RAW}) AS INT) AS n_tokens,
         {_PR_SQL} AS pr,
         {_FP_SQL} AS fp
    FROM documents
),
filtered AS (SELECT * FROM scored WHERE n_tokens >= 10 AND pr <= 0.2),
deduped AS (
  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM filtered
)
SELECT doc_id, lang, n_tokens
  FROM deduped
 WHERE rn = 1
   AND ((doc_id * 2654435761) % 4294967296) / 4294967296.0
       < (CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25 ELSE 0.1 END)
""",
    description="end-to-end training-data mix as ONE declarative plan: quality "
    "filter (tokens>=10, punct<=0.2) -> exact dedup by rolling-hash fingerprint "
    "(keep lowest doc_id) -> per-language stratified sample; one shuffle total "
    "(the dedup window), everything else map-side",
)
def pipeline_training_mix(spark, sf_dir):
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    scored = d.select(
        "doc_id",
        "lang",
        token_count(t).alias("n_tokens"),
        punct_ratio(t).alias("pr"),
        fingerprint(t).alias("fp"),
    )
    filtered = scored.filter((F.col("n_tokens") >= 10) & (F.col("pr") <= 0.2))
    w = Window.partitionBy("fp").orderBy("doc_id")
    deduped = filtered.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    u = ((F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)) / F.lit(4294967296.0)
    rate = (
        F.when(F.col("lang") == "en", 0.5)
        .when(F.col("lang") == "de", 0.25)
        .otherwise(0.1)
    )
    return deduped.filter(u < rate).select("doc_id", "lang", "n_tokens")


@register(
    "text_ngram_profile",
    oracle="""
WITH sh AS (
  SELECT lang,
         unnest(list_transform(generate_series(1, greatest(length(lower(text)) - 2, 0)),
                               i -> substring(lower(text), i, 3))) AS g
    FROM documents
),
counted AS (
  SELECT lang, g, count(*) AS n FROM sh GROUP BY lang, g
)
SELECT lang, g, n FROM (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n DESC, g) AS rk
    FROM counted) t
 WHERE rk <= 5
""",
    description="character-trigram language profile: top-5 trigrams per language "
    "(the n-gram statistics language-ID models are built from); map-side "
    "shingling + one agg shuffle + per-group top-k",
)
def text_ngram_profile(spark, sf_dir):
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    norm = d.select("lang", low.alias("_low"))
    grams = norm.select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length("_low") - 2, F.lit(0))),
                lambda i: F.substring(F.col("_low"), i, 3),
            )
        ).alias("g"),
    )
    counted = grams.groupBy("lang", "g").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("g"))
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", "g", "n")
    )
