"""Similarity search over embedding columns (array<float>).

``cosine`` is a left-fold of double products in array order — an exactly
specified FP evaluation that the DuckDB oracle mirrors term-by-term, so
results are bit-identical (no tolerance needed).

Scale path: brute-force top-k is O(|queries|·|corpus|) with the query set
BROADCAST — correct baseline at any corpus size when |queries| is modest.
``lsh_topk`` adds random-hyperplane LSH bucketing so each query only scores
its bucket's candidates; hyperplanes are derived deterministically from
xxhash64 so runs are reproducible without a stored model.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Left-fold double dot product in array order (bit-deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    The query set is broadcast (small side), so the corpus is scanned once
    with no shuffle until the final per-query top-k (rank window keyed on the
    query id — as many groups as queries, AQE-friendly).  Ties broken by
    neighbor id for determinism.
    """
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "sim", F.col("rank").cast("int").alias("rank"))
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane components in [-1, 1), derived
    from a splitmix-style integer mix of (plane, dim index) — reproducible
    across runs with no stored model."""
    comps = []
    for j in range(dim):
        x = (plane * 0x9E3779B97F4A7C15 + j * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
        x = (x * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 29
        comps.append((x / 2**63) - 1.0)
    return comps


def lsh_bucket(vec: Column, dim: int, *, planes: int = 12, table: int = 0) -> Column:
    """Random-hyperplane LSH: sign bit per plane → integer bucket id.
    ``table`` selects an independent plane set (multi-table LSH).

    Implementation note (r6): the aggregate-fold formulation is kept
    DELIBERATELY.  An A/B that unrolled the constant-plane dot into a
    6144-node scalar expression chain (hoping for whole-stage codegen)
    regressed 8 s → 55 s at sf0.1 — trees that large fall out of codegen
    into per-node interpreted eval, which is far slower than the
    higher-order-function fold they replaced."""
    bits = []
    for p in range(planes):
        plane = F.array(*[F.lit(c) for c in _hyperplane(dim, table * 1009 + p)])
        bits.append(F.when(dot(vec, plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    return functools.reduce(lambda a, b: a + b, bits).cast("long")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    planes: int = 6,
    tables: int = 8,
) -> DataFrame:
    """Approximate top-k: score only candidates that share an LSH bucket with
    the query in ANY of ``tables`` independent hash tables (multi-table LSH —
    the standard recall lever; single-probe recall is poor on unclustered
    data).  At scale each table's lookup is a bucket-keyed equi-join (one
    shuffle per table on small uniform keys); candidates are unioned and
    deduped before scoring, so each pair's cosine is computed once."""
    cand_frames = []
    for t in range(tables):
        c = corpus.select(
            F.col(id_col).alias("n_id"),
            F.col(vec_col).alias("n_vec"),
            lsh_bucket(F.col(vec_col), dim, planes=planes, table=t).alias("_bucket"),
        )
        q = queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            lsh_bucket(F.col(vec_col), dim, planes=planes, table=t).alias("_bucket"),
        )
        cand_frames.append(
            c.join(F.broadcast(q), "_bucket")
            .filter(F.col("q_id") != F.col("n_id"))
            .select("q_id", "q_vec", "n_id", "n_vec")
        )
    cands = functools.reduce(DataFrame.unionAll, cand_frames).dropDuplicates(["q_id", "n_id"])
    scored = cands.select("q_id", "n_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("sim"))
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "sim", F.col("rank").cast("int").alias("rank"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    ``nlist`` cells around coarse centroids; each query scores only the
    ``nprobe`` nearest cells.

    The coarse quantizer is deterministic (no stored model, no iterative
    fit): centroids are the ``nlist`` lowest-id corpus vectors — one Lloyd
    assignment pass over sampled seeds, the standard cheap IVF bootstrap.
    At scale: centroids are tiny and broadcast; cell assignment is a
    map-side argmin (no shuffle); the probe join shuffles on cell id — at
    most ``nprobe``× the query count, independent of corpus size.  Recall
    is tuned by ``nprobe`` (``nprobe = nlist`` degrades to brute force).
    """
    centroids = [
        (r[0], r[1])
        for r in corpus.select(id_col, vec_col).orderBy(id_col).limit(nlist).collect()
    ]

    def nearest_cells(vec: Column, n: int) -> Column:
        """Array of the n nearest centroid indexes (by cosine, descending)."""
        scored = F.array(
            *[
                F.struct(
                    cosine(vec, F.array(*[F.lit(float(x)) for x in cvec])).alias("sim"),
                    F.lit(i).alias("cell"),
                )
                for i, (_, cvec) in enumerate(centroids)
            ]
        )
        top = F.slice(F.reverse(F.array_sort(scored)), 1, n)
        return F.transform(top, lambda s: s["cell"])

    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        F.element_at(nearest_cells(F.col(vec_col), 1), 1).alias("_cell"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(nearest_cells(F.col(vec_col), nprobe)).alias("_cell"),
    )
    scored = (
        c.join(F.broadcast(q), "_cell")
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "sim", F.col("rank").cast("int").alias("rank"))
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Product-quantization approximate top-k (ADC scoring).

    The vector space is split into ``m`` subspaces of ``dim/m`` components;
    each subspace gets a ``ksub``-entry codebook (deterministic bootstrap:
    the subvectors of the ``ksub`` lowest-id corpus vectors — same no-stored-
    model convention as ``ivf_topk``).  Corpus vectors are ENCODED map-side
    into ``m`` small codes (the 100 TB memory story: 64 floats → 8 codes);
    queries score candidates with Asymmetric Distance Computation — a
    per-query lookup table of exact subspace distances to every codebook
    entry, so the approximate L2 distance is a sum of ``m`` table lookups,
    never a full-vector scan of the corpus.

    At scale: codebooks are tiny literals baked into the plan (broadcast by
    construction), encoding is a map-side argmin with no shuffle, and the
    only shuffle is the final per-query top-k window.  All arithmetic is
    explicit left-fold double math so the DuckDB oracle replays it
    bit-exactly.  Ties (equal subspace distance, equal ADC) break on
    codebook index / neighbor id.
    """
    sub = dim // m
    cents = [
        list(r[1])
        for r in corpus.select(id_col, vec_col).orderBy(id_col).limit(ksub).collect()
    ]

    def subdist_lit(vec: Column, cvec: list[float], s: int) -> Column:
        """Exact squared L2 between vec's subspace s and a literal codeword."""
        acc: Column = F.lit(0.0)
        for d in range(sub):
            i = s * sub + d + 1  # 1-based
            diff = F.element_at(vec, i).cast("double") - F.lit(float(cvec[i - 1]))
            acc = acc + diff * diff
        return acc

    def code_for(vec: Column, s: int) -> Column:
        scored = F.array(
            *[
                F.struct(subdist_lit(vec, cv, s).alias("d"), F.lit(j).alias("j"))
                for j, cv in enumerate(cents)
            ]
        )
        return F.element_at(F.array_sort(scored), 1)["j"]

    coded = corpus.select(
        F.col(id_col).alias("n_id"),
        *[code_for(F.col(vec_col), s).alias(f"code{s}") for s in range(m)],
    )
    # per-query ADC lookup tables: lut{s}[j+1] = subdist(q, codeword j, s)
    q = queries.select(
        F.col(id_col).alias("q_id"),
        *[
            F.array(*[subdist_lit(F.col(vec_col), cv, s) for cv in cents]).alias(f"lut{s}")
            for s in range(m)
        ],
    )
    adc: Column = F.lit(0.0)
    for s in range(m):
        adc = adc + F.element_at(F.col(f"lut{s}"), F.col(f"code{s}") + 1)
    scored = (
        coded.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", adc.alias("dist"))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("dist"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "dist", F.col("rank").cast("int").alias("rank"))
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str | None = None,
    threshold: float = 0.99,
    dim: int = 64,
    planes: int = 10,
    tables: int = 16,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a_id < b_id) above threshold.

    Candidates come from multi-table random-hyperplane LSH — two vectors are
    compared only if they share a (table, bucket), optionally within the
    ``group_col`` block — then the exact cosine verifies each candidate, so
    no all-pairs join exists anywhere.  Like ``minhash_lsh_pairs``, the
    per-table joins are folded into ONE self-join via ``posexplode`` over the
    per-table bucket array: one shuffle total regardless of table count.

    Recall is probabilistic but overwhelming for near-dup thresholds: a pair
    at cos θ collides in one table with prob (1−θ/π)^planes, so
    P(miss) = (1−(1−θ/π)^planes)^tables — at threshold 0.99 (θ/π ≈ 0.045),
    10 planes × 16 tables give P(miss) ≈ 1e-7 per pair, while the candidate
    space shrinks by ~2^planes/tables ≈ 64× versus all-pairs.  Exactness of
    *reported* similarities is unaffected (exact cosine on every candidate).
    """
    grp = [F.col(group_col).alias("_grp")] if group_col else []
    buckets = F.array(
        *[lsh_bucket(F.col(vec_col), dim, planes=planes, table=t) for t in range(tables)]
    )
    banded = df.select(
        *grp,
        F.col(id_col),
        F.col(vec_col),
        F.posexplode(buckets).alias("_t", "_bkt"),
    )
    keys = (["_grp"] if group_col else []) + ["_t", "_bkt"]
    a = banded.select(
        *keys, F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec")
    )
    b = banded.select(
        *keys, F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec")
    )
    return (
        a.join(b, keys)
        .filter(F.col("a_id") < F.col("b_id"))
        .dropDuplicates(["a_id", "b_id"])
        .select("a_id", "b_id", cosine(F.col("a_vec"), F.col("b_vec")).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def bitext_margin_pairs(
    a_df: DataFrame,
    b_df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    planes: int = 6,
    tables: int = 8,
    min_gap: float = 0.0,
) -> DataFrame:
    """Margin-based bitext mining (the CCMatrix/LASER alignment shape):
    pair each vector in ``a_df`` with its best match in ``b_df`` when the
    match is MUTUAL (each is the other's top-1) and wins by a margin
    (``gap`` = top-1 cosine − top-2 cosine, a single IEEE subtraction, so
    bit-deterministic).

    Candidates come from the same multi-table hyperplane LSH the ANN path
    uses, folded into ONE equi-join via ``posexplode`` over the per-table
    bucket array — no A×B cross product anywhere, so the pair space stays
    bounded at corpus scale.  Ranking is two windows (per a_id, per b_id)
    over the candidate set; ties break on partner id.
    """
    def bucketed(df: DataFrame, side: str) -> DataFrame:
        buckets = F.array(
            *[lsh_bucket(F.col(vec_col), dim, planes=planes, table=t) for t in range(tables)]
        )
        return df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.posexplode(buckets).alias("_t", "_bkt"),
        )

    def vecs(df: DataFrame, side: str) -> DataFrame:
        # r12: the vector NORM is computed here, once per row, instead of
        # being folded per candidate pair inside cosine; sim stays
        # bit-identical (dot/(norm_a·norm_b) is the same IEEE expression
        # tree over the same operands).
        return df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(vec_col).alias(f"{side}_vec"),
            norm(F.col(vec_col)).alias(f"{side}_nrm"),
        )

    # r12 (guide §2.3 — shuffle keys, not payloads): the band join and the
    # pair dedup used to carry BOTH 64-double vectors through their
    # exchanges (the dedup alone shipped ~2×512 B of payload per candidate
    # row to compare 16 B of ids); candidates now travel as bare id pairs
    # and the vectors re-attach via two row-count-bounded joins before
    # scoring — the same decide-small/move-heavy-once discipline as the
    # optimization guide's worked example.
    cand = (
        bucketed(a_df, "a")
        .join(bucketed(b_df, "b"), ["_t", "_bkt"])
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    scored = (
        cand.join(vecs(a_df, "a"), "a_id")
        .join(vecs(b_df, "b"), "b_id")
        .select(
            "a_id",
            "b_id",
            (dot(F.col("a_vec"), F.col("b_vec")) / (F.col("a_nrm") * F.col("b_nrm"))).alias("sim"),
        )
    )
    wa = Window.partitionBy("a_id").orderBy(F.desc("sim"), F.asc("b_id"))
    wb = Window.partitionBy("b_id").orderBy(F.desc("sim"), F.asc("a_id"))
    # the ranked candidate set feeds THREE consumers below (top1 / runner /
    # reverse-top1); without truncation each one re-executes the whole LSH
    # join + both window sorts — measured 3× the wall-clock at sf0.1.  The
    # checkpointed state is the candidate pair list, bounded by the LSH
    # banding (never A×B), so this is the same bounded-reuse discipline as
    # the triangle and PageRank ops.
    r = (
        scored.withColumn("rank_a", F.row_number().over(wa))
        .withColumn("rank_b", F.row_number().over(wb))
        .filter((F.col("rank_a") <= 2) | (F.col("rank_b") == 1))
        .localCheckpoint(eager=True)
    )
    top1 = r.filter(F.col("rank_a") == 1).select("a_id", "b_id", "sim")
    runner = r.filter(F.col("rank_a") == 2).select(
        "a_id", F.col("sim").alias("_sim2")
    )
    rev = r.filter(F.col("rank_b") == 1).select(
        "b_id", F.col("a_id").alias("_rev_a")
    )
    return (
        top1.join(runner, "a_id", "left")
        .join(rev, "b_id", "left")
        .select(
            "a_id",
            "b_id",
            "sim",
            (F.col("sim") - F.coalesce(F.col("_sim2"), F.lit(-1.0))).alias("gap"),
        )
        .filter((F.col("_rev_a") == F.col("a_id")) & (F.col("gap") >= min_gap))
        .select("a_id", "b_id", "sim", "gap")
    )
