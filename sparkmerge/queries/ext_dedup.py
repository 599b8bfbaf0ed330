"""[EXT] dedup operators over the documents/embeddings corpus (SURVEY.md §2.D)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkmerge.ext.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from sparkmerge.queries import load, register

# --- dedup_exact: documents ∪ documents → one survivor per content row ---


@register(
    "dedup_exact",
    oracle="""
WITH doubled AS (SELECT * FROM documents UNION ALL SELECT * FROM documents)
SELECT doc_id, text, lang, source, n_chars FROM (
  SELECT *, row_number() OVER (PARTITION BY text, lang, source, n_chars
                               ORDER BY doc_id) AS rn
    FROM doubled) t
 WHERE rn = 1
""",
    description="exact dedup: hash-groupBy ranking with deterministic survivor",
)
def dedup_exact(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    doubled = d.unionAll(d)
    return exact_dedup(doubled, ["text", "lang", "source", "n_chars"], ["doc_id"])


# --- dedup_minhash: MinHash+LSH candidate pairs (rows-only: xxhash64 is Spark-specific) ---


@register(
    "dedup_minhash",
    oracle=None,
    description="MinHash(32 hashes)+LSH(8 bands) near-dup candidate pairs; est. Jaccard >= 0.5",
)
def dedup_minhash(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    sigs = minhash_signatures(d, "doc_id", "text", num_hashes=32, shingle_n=5)
    pairs = minhash_lsh_pairs(sigs, "doc_id", num_hashes=32, bands=8)
    return pairs.filter(F.col("est_jaccard") >= 0.5)


# --- dedup_simhash: SimHash hamming<=3 pairs (rows-only: xxhash64) ---


@register(
    "dedup_simhash",
    oracle=None,
    description="64-bit SimHash near-dup pairs within hamming distance 3 (4x16-bit banding)",
)
def dedup_simhash(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return simhash_pairs(simhash(d, "doc_id", "text"), "doc_id", max_hamming=3)


# --- dedup_ngram_jaccard: exact token-set Jaccard, blocked by language ---


@register(
    "dedup_ngram_jaccard",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang,
         list_sort(list_distinct(list_filter(
           string_split_regex(lower(text), '\\s+'), x -> x <> ''))) AS t
    FROM documents
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
         / CAST(len(list_distinct(a.t || b.t)) AS DOUBLE) AS jaccard
  FROM toks a JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id
 WHERE a.doc_id % 20 = 0
   AND CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
         / CAST(len(list_distinct(a.t || b.t)) AS DOUBLE) >= 0.6
""",
    description="exact n-gram/token-set Jaccard near-dups for sampled query docs, blocked by lang",
)
def dedup_ngram_jaccard(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", "lang", threshold=0.6)
    return pairs.filter(F.col("a_id") % 20 == 0)
