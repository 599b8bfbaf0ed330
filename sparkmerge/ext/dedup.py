"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

All four are built from native Spark functions (xxhash64, explode, windowed
ranking, array ops) — no Python UDFs — so they whole-stage-codegen and scale
linearly.  Pairwise comparisons only ever happen inside LSH/banding buckets,
never across the full corpus.

Scale notes:
- ``exact_dedup`` is one shuffle on the dedup key (same machinery as the
  reference's @badKey ranking, sp_SimpleMerge.sql:209-241).
- ``minhash_signatures`` is shingle-explode (map-side) + one groupBy(doc);
  banding joins shuffle on (band_id, band_hash) — small, uniform keys.
- SimHash candidates use the 4×16-bit block trick: hamming(a,b) ≤ 3 ⟹ at
  least one of 4 blocks equal, so a 4-way band join finds all close pairs.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_dedup(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """Keep exactly one row per key, preferring the lowest ``order_cols``
    (deterministic — usable under the DuckDB oracle, unlike dropDuplicates
    whose survivor is partition-order-dependent)."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def shingles(text: Column, n: int = 5) -> Column:
    """Character n-gram shingle array (lowercased, whitespace-normalized)."""
    norm = F.regexp_replace(F.lower(text), r"\s+", " ")
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.substring(norm, i, n))


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, *, num_hashes: int = 32, shingle_n: int = 5
) -> DataFrame:
    """doc → MinHash signature: min over shingles of xxhash64(shingle, seed_i)
    for each of ``num_hashes`` seeds.  One explode + one groupBy(doc)."""
    sh = df.select(id_col, F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias("_sh"))
    aggs = [
        F.min(F.xxhash64(F.col("_sh"), F.lit(i))).alias(f"mh_{i}") for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    sig_df: DataFrame, id_col: str, *, num_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """LSH banding: hash each band of the signature into a bucket; docs
    sharing any (band, bucket) become a candidate pair (a_id < b_id).
    Returns candidates with their estimated Jaccard (fraction of matching
    minhash components)."""
    rows_per_band = num_hashes // bands
    band_cols = [
        F.xxhash64(*[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(
            f"band_{b}"
        )
        for b in range(bands)
    ]
    banded = sig_df.select(id_col, *[F.col(f"mh_{i}") for i in range(num_hashes)], *band_cols)
    pair_frames = []
    for b in range(bands):
        left = banded.select(
            F.col(f"band_{b}").alias("_bucket"),
            F.col(id_col).alias("a_id"),
            *[F.col(f"mh_{i}").alias(f"a_mh_{i}") for i in range(num_hashes)],
        )
        right = banded.select(
            F.col(f"band_{b}").alias("_bucket"),
            F.col(id_col).alias("b_id"),
            *[F.col(f"mh_{i}").alias(f"b_mh_{i}") for i in range(num_hashes)],
        )
        pair_frames.append(
            left.join(right, "_bucket").filter(F.col("a_id") < F.col("b_id")).drop("_bucket")
        )
    pairs = functools.reduce(DataFrame.unionAll, pair_frames).dropDuplicates(["a_id", "b_id"])
    matches = functools.reduce(
        operator.add,
        [(F.col(f"a_mh_{i}") == F.col(f"b_mh_{i}")).cast("int") for i in range(num_hashes)],
    )
    return pairs.select("a_id", "b_id", (matches / float(num_hashes)).alias("est_jaccard"))


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over word tokens: per bit b, sum ±1 weighted by token
    hash bit b; sign → bit.  Emitted as four 16-bit blocks (for the
    hamming≤3 ⟹ one-block-equal candidate join)."""
    toks = df.select(
        id_col, F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("_tok")
    ).filter(F.col("_tok") != "")
    h = F.xxhash64(F.col("_tok"))
    bit_aggs = [
        # unsigned shift + mask (1<<63 would overflow a signed-64 literal)
        F.sum(
            F.when(F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s_{b}")
        for b in range(64)
    ]
    sums = toks.groupBy(id_col).agg(*bit_aggs)
    block_cols = []
    for blk in range(4):
        expr = functools.reduce(
            operator.add,
            [
                F.when(F.col(f"s_{blk * 16 + i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
                for i in range(16)
            ],
        )
        block_cols.append(expr.cast("long").alias(f"blk_{blk}"))
    return sums.select(id_col, *block_cols)


def simhash_pairs(sim_df: DataFrame, id_col: str, *, max_hamming: int = 3) -> DataFrame:
    """Candidate pairs whose SimHashes differ in ≤ max_hamming bits (exact
    post-filter after the 4-block band join)."""
    frames = []
    for blk in range(4):
        left = sim_df.select(
            F.col(f"blk_{blk}").alias("_bucket"),
            F.col(id_col).alias("a_id"),
            *[F.col(f"blk_{i}").alias(f"a_blk_{i}") for i in range(4)],
        )
        right = sim_df.select(
            F.col(f"blk_{blk}").alias("_bucket"),
            F.col(id_col).alias("b_id"),
            *[F.col(f"blk_{i}").alias(f"b_blk_{i}") for i in range(4)],
        )
        frames.append(left.join(right, "_bucket").filter(F.col("a_id") < F.col("b_id")).drop("_bucket"))
    pairs = functools.reduce(DataFrame.unionAll, frames).dropDuplicates(["a_id", "b_id"])
    hamming = functools.reduce(
        operator.add,
        [F.bit_count(F.col(f"a_blk_{i}").bitwiseXOR(F.col(f"b_blk_{i}"))) for i in range(4)],
    )
    return pairs.select("a_id", "b_id", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def token_set(text: Column) -> Column:
    """Sorted distinct word-token array (deterministic set representation)."""
    return F.array_sort(
        F.array_distinct(F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != ""))
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, group_col: str, *, threshold: float
) -> DataFrame:
    """Exact token-set Jaccard over candidate pairs blocked by ``group_col``
    (e.g. language).  |A∩B| and |A∪B| are integer cardinalities, so the
    similarity is an exact single FP division — oracle-safe."""
    base = df.select(
        F.col(id_col), F.col(group_col).alias("_grp"), token_set(F.col(text_col)).alias("_toks")
    )
    a = base.select(F.col("_grp"), F.col(id_col).alias("a_id"), F.col("_toks").alias("_a_toks"))
    b = base.select(F.col("_grp"), F.col(id_col).alias("b_id"), F.col("_toks").alias("_b_toks"))
    inter = F.size(F.array_intersect(F.col("_a_toks"), F.col("_b_toks")))
    union = F.size(F.array_union(F.col("_a_toks"), F.col("_b_toks")))
    jac = inter.cast("double") / union.cast("double")
    return (
        a.join(b, "_grp")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
