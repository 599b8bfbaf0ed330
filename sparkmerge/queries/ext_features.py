"""[EXT] round-4 featurization operators (SURVEY.md §2.D, r4 batch 2).

The hashing-trick / vocabulary / projection layer between a curated corpus
and a trainer: fixed-width feature hashing of tokens, tokenizer-vocabulary
OOV profiling, sign-random-projection of embeddings, a syllable-based
readability profile, and deterministic multi-source interleaving for the
final training order.

Not in the reference; shared design rules:

- token identity is the registry's portable polynomial rolling hash
  (ext/text.py ``fingerprint`` math) finished with the murmur3 fmix32
  avalanche (ext/hashing.py ``mix32``) — both replayed bit-exactly by the
  DuckDB oracle, so feature buckets hash-match across engines;
- all float outputs are single IEEE ops over exactly-computed integers, or
  left-to-right folds over a per-row array (deterministic order in both
  engines) — never cross-row double accumulation;
- "random" projection signs and interleave order come from inline Knuth
  multiplicative hashes of integer keys, the registry's standard RNG
  replacement (reproducible at any scale, replayable in SQL).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from sparkmerge.ext.hashing import mix32, mix32_sql_chain
from sparkmerge.ext.text import FP_BASE, FP_MOD, whitespace_tokens
from sparkmerge.queries import load, register

_WS = r"\s+"
_TOKS_RAW = f"list_filter(string_split_regex(text, '{_WS}'), x -> x <> '')"

_TOK_FP_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split(tok, ''), c -> CAST(ascii(c) AS BIGINT))), "
    f"(acc, c) -> (acc * {FP_BASE} + c) % {FP_MOD})"
)

_N_BUCKETS = 256


def _token_fp(tok):
    """Polynomial rolling hash of one token (portable; ext/text.py:112)."""
    codes = F.transform(F.split(tok, ""), lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, c: (acc * FP_BASE + c) % FP_MOD
    )


@register(
    "feature_hash_bucket",
    oracle=f"""
WITH t AS (
  SELECT doc_id, unnest({_TOKS_RAW}) AS tok FROM documents
),
p AS (
  SELECT doc_id, {_TOK_FP_SQL} AS ph FROM t
),
{mix32_sql_chain('hh', 'p', 'doc_id', 'ph')}
SELECT doc_id, CAST(h % {_N_BUCKETS} AS INT) AS bucket, COUNT(*) AS n
  FROM hh GROUP BY 1, 2
""",
    description=f"hashing-trick featurization: token -> rolling-hash -> "
    f"fmix32 avalanche -> {_N_BUCKETS} buckets, per-doc sparse counts; "
    f"map-side explode+hash then ONE agg shuffle on (doc_id, bucket) — "
    f"fixed feature width regardless of vocabulary size, which is the "
    f"whole point of the trick at 100 TB (no vocab build, no broadcast)",
)
def feature_hash_bucket(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.explode(whitespace_tokens(F.col("text"))).alias("tok")
    )
    h = t.select("doc_id", mix32(_token_fp(F.col("tok"))).alias("h"))
    return h.groupBy(
        "doc_id", (F.col("h") % _N_BUCKETS).cast("int").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))


_VOCAB_K = 256


@register(
    "tokenizer_vocab_coverage",
    oracle=f"""
WITH t AS (
  SELECT doc_id, unnest({_TOKS_RAW}) AS tok FROM documents
),
c AS (SELECT tok, COUNT(*) AS n FROM t GROUP BY 1),
v AS (SELECT tok FROM c ORDER BY n DESC, tok LIMIT {_VOCAB_K}),
d AS (
  SELECT t.doc_id,
         COUNT(*) AS n_tokens,
         CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov
    FROM t LEFT JOIN v ON t.tok = v.tok
   GROUP BY 1
)
SELECT doc_id, n_tokens, n_oov,
       CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_frac
  FROM d
""",
    description=f"tokenizer-vocabulary coverage audit: build the top-"
    f"{_VOCAB_K} corpus vocabulary (count desc, token asc — total order, "
    f"so the cut is deterministic under ties), broadcast it against the "
    f"exploded token stream, report per-doc OOV rate; the vocab side is "
    f"tiny by construction so the probe is a broadcast hash join — no "
    f"shuffle of the big side beyond the final per-doc agg",
)
def tokenizer_vocab_coverage(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.explode(whitespace_tokens(F.col("text"))).alias("tok")
    )
    cnt = t.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        cnt.orderBy(F.desc("n"), F.asc("tok"))
        .limit(_VOCAB_K)
        .select("tok", F.lit(1).alias("in_v"))
    )
    probe = t.join(F.broadcast(vocab), "tok", "left")
    agg = probe.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("in_v").isNull(), 1).otherwise(0)).alias("n_oov"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        (F.col("n_oov").cast("double") / F.col("n_tokens").cast("double")).alias(
            "oov_frac"
        ),
    )


_PROJ_K = 8  # output dimensions
_KNUTH = 2654435761
_MIXP = 2147483647  # pre-reduce prime: bounds doc_id * _KNUTH below 2^63 (ADVICE r6)
_M32 = 4294967296
_HALF32 = 2147483648


def _sign_sql(j: int) -> str:
    return (
        f"(CASE WHEN ((i * {_PROJ_K} + {j}) * {_KNUTH}) % {_M32} >= {_HALF32} "
        f"THEN -1.0 ELSE 1.0 END)"
    )


def _proj_sql(j: int) -> str:
    return (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(generate_series(0, len(embedding) - 1), "
        f"i -> CAST(embedding[i + 1] AS DOUBLE) * {_sign_sql(j)})), "
        "(a, b) -> a + b)"
    )


@register(
    "embedding_normalize_project",
    oracle=f"""
WITH n AS (
  SELECT vec_id,
         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
           (a, b) -> a + b)) AS norm,
         {', '.join(f'{_proj_sql(j)} AS r{j}' for j in range(_PROJ_K))}
    FROM embeddings
)
SELECT vec_id, norm,
       {', '.join(f'CASE WHEN norm > 0 THEN r{j} / norm ELSE NULL END AS p{j}' for j in range(_PROJ_K))}
  FROM n
""",
    description=f"L2-normalized sign-random-projection of 64-dim "
    f"embeddings to {_PROJ_K} dims (Knuth-hash signs — seedable, "
    f"reproducible, replayed by the oracle); entirely map-side per-row "
    f"array folds in fixed left-to-right order (bit-deterministic on both "
    f"engines), zero shuffles at any corpus size; the scalar projection "
    f"columns keep the output comparator-safe (no bare arrays — the "
    f"embedding_quantize lesson)",
)
def embedding_normalize_project(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    sq = F.transform(emb, lambda x: x.cast("double") * x.cast("double"))
    norm = F.sqrt(
        F.aggregate(sq, F.lit(0.0), lambda a, b: a + b)
    )

    def proj(j):
        # two-arg transform gets (element, index) — no sequence(), so an
        # empty embedding folds to 0.0 instead of a descending-range trap
        sign = lambda i: F.when(
            ((i * _PROJ_K + j) * _KNUTH) % _M32 >= _HALF32, F.lit(-1.0)
        ).otherwise(F.lit(1.0))
        terms = F.transform(emb, lambda x, i: x.cast("double") * sign(i))
        return F.aggregate(terms, F.lit(0.0), lambda a, b: a + b)

    n = e.select(
        "vec_id",
        norm.alias("norm"),
        *[proj(j).alias(f"r{j}") for j in range(_PROJ_K)],
    )
    return n.select(
        "vec_id",
        "norm",
        *[
            F.when(F.col("norm") > 0, F.col(f"r{j}") / F.col("norm"))
            .otherwise(F.lit(None))
            .alias(f"p{j}")
            for j in range(_PROJ_K)
        ],
    )


_VOWELS = "[aeiouy]+"


@register(
    "text_syllable_profile",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_TOKS_RAW} AS toks,
         len(regexp_extract_all(text, '{_VOWELS}')) AS n_syllables
    FROM documents
),
s AS (
  SELECT doc_id,
         len(toks) AS n_words,
         n_syllables,
         len(list_filter(toks,
             w -> len(regexp_extract_all(w, '{_VOWELS}')) >= 3)) AS n_complex
    FROM t
)
SELECT doc_id, n_words, n_syllables, n_complex,
       CASE WHEN n_words > 0
            THEN CAST(n_complex AS DOUBLE) / CAST(n_words AS DOUBLE) END
         AS complex_frac,
       CASE WHEN n_words > 0
            THEN CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE) END
         AS syll_per_word
  FROM s
""",
    description="readability profile via vowel-group syllable counting "
    "(Flesch-style complex-word fraction and syllables-per-word); pure "
    "map-side regex counts over exact integers, one IEEE division per "
    "ratio — zero shuffles",
)
def text_syllable_profile(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = whitespace_tokens(F.col("text"))
    n_syll = F.size(F.regexp_extract_all(F.col("text"), F.lit(_VOWELS), F.lit(0)))
    n_complex = F.size(
        F.filter(
            toks,
            lambda w: F.size(F.regexp_extract_all(w, F.lit(_VOWELS), F.lit(0))) >= 3,
        )
    )
    s = d.select(
        "doc_id",
        F.size(toks).alias("n_words"),
        n_syll.alias("n_syllables"),
        n_complex.alias("n_complex"),
    )
    guard = F.col("n_words") > 0
    return s.select(
        "doc_id",
        "n_words",
        "n_syllables",
        "n_complex",
        F.when(
            guard, F.col("n_complex").cast("double") / F.col("n_words").cast("double")
        ).alias("complex_frac"),
        F.when(
            guard, F.col("n_syllables").cast("double") / F.col("n_words").cast("double")
        ).alias("syll_per_word"),
    )


@register(
    "pipeline_interleave_sources",
    oracle=f"""
WITH s AS (
  SELECT source,
         ROW_NUMBER() OVER (ORDER BY source) - 1 AS src_rank,
         COUNT(*) OVER () AS n_src
    FROM (SELECT DISTINCT source FROM documents)
),
p AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY ((doc_id % {_MIXP}) * {_KNUTH}) % {_M32}, doc_id) - 1 AS pos
    FROM documents
)
SELECT p.doc_id, p.source,
       p.pos * s.n_src + s.src_rank AS global_pos
  FROM p JOIN s USING (source)
""",
    description="deterministic round-robin source interleave for the final "
    "training order: docs hash-shuffle within each source (Knuth "
    "multiplicative position, the registry's RNG replacement), then strided "
    "into one global sequence so every window of N consecutive examples "
    "sees every source once; one window shuffle on source + a broadcast "
    "join against the tiny ranked-source table",
)
def pipeline_interleave_sources(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    # ONE distinct pass builds the (tiny) ranked-source table; rank and
    # count share the same single-partition window shuffle of ~dozens of
    # rows rather than re-scanning documents
    w_all = Window.partitionBy(F.lit(1))
    srcs = d.select("source").distinct().select(
        "source",
        (F.row_number().over(w_all.orderBy("source")) - 1).alias("src_rank"),
        F.count(F.lit(1)).over(w_all).alias("n_src"),
    )
    w_pos = Window.partitionBy("source").orderBy(
        ((F.col("doc_id") % _MIXP) * _KNUTH) % _M32, F.col("doc_id")
    )
    p = d.select(
        "doc_id", "source", (F.row_number().over(w_pos) - 1).alias("pos")
    )
    return p.join(F.broadcast(srcs), "source").select(
        "doc_id",
        "source",
        (F.col("pos") * F.col("n_src") + F.col("src_rank")).alias("global_pos"),
    )


# --- text_readability_fk (r6) -----------------------------------------------


@register(
    "text_readability_fk",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         CAST(len({_TOKS_RAW}) AS BIGINT) AS n_words,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
           AS n_sentences,
         CAST(len(regexp_extract_all(text, '{_VOWELS}')) AS BIGINT)
           AS n_syllables
    FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CASE WHEN n_words > 0
            THEN ((0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)))
                  + (11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))))
                 - 15.59 END AS fk_grade
  FROM t
""",
    description="Flesch-Kincaid grade level per document (the classic "
    "readability score quality filters bucket on): whitespace words, "
    "sentence count from terminal-punctuation runs (min 1), vowel-group "
    "syllables — all exact integer counts, then the FK polynomial as a "
    "FIXED-association chain (two divisions, two multiplies, two adds — "
    "every op correctly-rounded IEEE on exact-integer inputs, so the "
    "double is engine-portable with no tolerance); pure map-side, zero "
    "shuffles, plans as one WholeStageCodegen scan",
)
def text_readability_fk(spark, sf_dir):
    from sparkmerge.ext.text import whitespace_tokens

    d = load(spark, sf_dir, "documents")
    words = F.size(whitespace_tokens(F.col("text"))).cast("long")
    sents = F.greatest(
        F.size(F.expr(r"regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
    ).cast("long")
    sylls = F.size(F.expr(r"regexp_extract_all(text, '[aeiouy]+', 0)")).cast("long")
    t = d.select(
        "doc_id",
        words.alias("n_words"),
        sents.alias("n_sentences"),
        sylls.alias("n_syllables"),
    )
    fk = (
        (
            F.lit(0.39)
            * (F.col("n_words").cast("double") / F.col("n_sentences").cast("double"))
        )
        + (
            F.lit(11.8)
            * (F.col("n_syllables").cast("double") / F.col("n_words").cast("double"))
        )
    ) - F.lit(15.59)
    return t.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.when(F.col("n_words") > 0, fk).alias("fk_grade"),
    )
