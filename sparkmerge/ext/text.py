"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.  All native column expressions (codegen'd, no UDFs).
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A BPE-ish lexer: words, numbers, or single non-space symbols.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language stopword marker sets for the n-gram/stopword language-ID
# heuristic.  (The driver corpus labels are synthetic; the algorithm — score
# per language by marker hits, argmax with deterministic tiebreak — is the
# deliverable.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "des", "est"],
    "zh": ["de", "shi", "bu", "le", "wo"],
}


def whitespace_tokens(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    """Whitespace token count (codegen'd size-of-split)."""
    return F.size(whitespace_tokens(text))


def word_bigrams(tokens: Column) -> Column:
    """Adjacent word-pair array over a token array; empty below two tokens.
    The guard matters: Spark's ``sequence(1, 0)`` is a DESCENDING ``[1, 0]``,
    not an empty range."""
    return F.when(
        F.size(tokens) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(tokens, i), F.element_at(tokens, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def regex_token_count(text: Column) -> Column:
    """BPE-ish token count via the lexer regex."""
    return F.regexp_count(text, F.lit(TOKEN_REGEX))


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return n_punct.cast("double") / F.greatest(F.length(text), F.lit(1)).cast("double")


def stopword_ratio(text: Column, stopwords: list[str]) -> Column:
    toks = whitespace_tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(stopwords)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: penalize extreme length, high
    punctuation density, low stopword share (exact integer/single-FP math)."""
    toks = token_count(text)
    len_ok = (toks >= 5) & (toks <= 100000)
    punct_ok = punct_ratio(text) <= 0.2
    stop_share = stopword_ratio(text, LANG_MARKERS["en"])
    return (
        len_ok.cast("double") * 0.4
        + punct_ok.cast("double") * 0.3
        + (stop_share > 0.0).cast("double") * 0.3
    )


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    toks = whitespace_tokens(F.lower(text))
    out = []
    for lang in sorted(LANG_MARKERS):
        markers = LANG_MARKERS[lang]
        out.append((lang, F.size(F.filter(toks, lambda t: t.isin(markers)))))
    return out


def lang_id(text: Column) -> Column:
    """argmax over per-language marker-hit counts; deterministic tiebreak by
    language code ('und' when no marker hits at all)."""
    scores = lang_scores(text)
    best = functools.reduce(F.greatest, [s for _, s in scores])
    pick = F.lit("und")
    # reversed so earlier alphabetical languages win ties
    for lang, s in reversed(scores):
        pick = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(pick)
    return pick


FP_MOD = 1_000_000_007  # polynomial rolling hash modulus (Karp-Rabin style)
FP_BASE = 31


def char_codes(text: Column) -> Column:
    return F.transform(F.split(text, ""), lambda ch: F.ascii(ch).cast("long"))


def fingerprint(text: Column) -> Column:
    """Polynomial rolling hash over character codes, mod 1e9+7 — pure modular
    integer arithmetic (no 64-bit overflow, so it is safe under ANSI mode and
    portable: the DuckDB oracle replays the identical left fold)."""
    return F.aggregate(
        char_codes(text),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FP_BASE + c) % FP_MOD,
    )


def text_stats(df: DataFrame, text_col: str = "text", lang_col: str = "lang") -> DataFrame:
    """Per-language corpus statistics (exact integer aggregates)."""
    t = F.col(text_col)
    per_doc = df.select(
        F.col(lang_col).alias("lang"),
        F.length(t).alias("_chars"),
        token_count(t).alias("_toks"),
        regex_token_count(t).alias("_lex"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("_chars").cast("long")).alias("total_chars"),
        F.sum(F.col("_toks").cast("long")).alias("total_tokens"),
        F.sum(F.col("_lex").cast("long")).alias("total_lexer_tokens"),
        F.min("_chars").alias("min_chars"),
        F.max("_chars").alias("max_chars"),
    )
