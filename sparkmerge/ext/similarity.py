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

from sparkmerge.ext.consts import const_array, session_memo


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


def _norm_py(vec: list[float]) -> float:
    """Python replay of :func:`norm`'s exact left-fold (binary64 adds and
    multiplies in array order, correctly-rounded sqrt) — bit-identical to
    evaluating ``norm`` on the same values in the JVM, so literal centroid
    norms can be precomputed once at plan-build time instead of per row."""
    import math

    acc = 0.0
    for x in vec:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


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
    # r12: norms are computed ONCE per row (map-side, before the cross join)
    # instead of per (query, neighbor) pair inside cosine — |q|× fewer norm
    # folds on the corpus side.  sim stays bit-identical: dot/(q_nrm·n_nrm)
    # is the same IEEE expression tree over the same operands.
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_nrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        norm(F.col(vec_col)).alias("n_nrm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            (dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_nrm") * F.col("n_nrm"))).alias("sim"),
        )
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
    higher-order-function fold they replaced.

    r12 extends the same lesson to the PLAN itself: the per-plane
    ``create_array`` of ``dim`` literal nodes (planes × dim ≈ thousands of
    expression nodes per bucket column, ~100k for a 16-table band array)
    made plan construction/analysis the dominant cost on small inputs.
    The plane matrix is now ONE nested-array literal and the bit-pack a
    fold over it — same dots over the same double values in the same
    order, same bit sum (integer adds in plane order), so bucket ids are
    bit-identical (the DuckDB oracle replays this exact math)."""
    # r12 (second pass): F.lit(list) builds the literal element-by-element
    # over py4j (one round-trip per double — 7.6 s of bitext's 9.9 s
    # construction, cProfiled); const_array builds it with the SAME F.lit
    # call once per session and memoizes the Column (content-addressed), so
    # the expression tree, folds and bucket ids are identical by
    # construction — pinned in tests/test_r12_opt.py.
    planes_lit = const_array([_hyperplane(dim, table * 1009 + p) for p in range(planes)])
    pow2 = const_array([1 << p for p in range(planes)])
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(planes - 1)),
        F.lit(0).cast("long"),
        lambda acc, p: acc
        + F.when(
            dot(vec, F.element_at(planes_lit, p + 1)) >= 0,
            F.element_at(pow2, p + 1),
        ).otherwise(F.lit(0)),
    )


def bucket_array(vec_col: str, dim: int, *, planes: int, tables: int) -> Column:
    """All ``tables`` per-table bucket ids of ``F.col(vec_col)`` as ONE
    array column, memoized on the session.

    r12 (second pass, guide §1): even with the plane matrices batched into
    single literals, each ``lsh_bucket`` call still creates its
    aggregate-fold lambdas over py4j (~60 ms/call; 16 calls ≈ 1 s of every
    bitext/ann_lsh construction).  The whole bucket-array expression is a
    pure function of (vec_col, dim, planes, tables) — an UNRESOLVED column
    tree, bound to a relation only at analysis — so it is built once per
    session and reused; every query that embeds it resolves and executes
    it independently (expression reuse, not result reuse)."""
    return session_memo(
        ("bucket_array", vec_col, dim, planes, tables),
        lambda: F.array(
            *[lsh_bucket(F.col(vec_col), dim, planes=planes, table=t) for t in range(tables)]
        ),
    )


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
    data).  Candidates are unioned and deduped before scoring, so each
    pair's cosine is computed once.

    r12 (guide §2.3/§2.4): all ``tables`` lookups fold into ONE bucket-keyed
    equi-join via ``posexplode`` over the per-table bucket array — one
    corpus scan and one join instead of ``tables`` scans + ``tables``
    branch joins (same candidate set: a pair collides iff it shares a
    (table, bucket)).  Candidates travel as bare id pairs through the
    dedup exchange; vectors and per-row precomputed norms re-attach via
    row-count-bounded joins before scoring (the bitext discipline) — sim
    stays bit-identical (dot/(q_nrm·n_nrm) is the same IEEE tree)."""
    buckets = bucket_array(vec_col, dim, planes=planes, tables=tables)
    c_b = corpus.select(
        F.col(id_col).alias("n_id"),
        F.posexplode(buckets).alias("_t", "_bkt"),
    )
    q_b = queries.select(
        F.col(id_col).alias("q_id"),
        F.posexplode(buckets).alias("_t", "_bkt"),
    )
    cands = (
        c_b.join(F.broadcast(q_b), ["_t", "_bkt"])
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id")
        .dropDuplicates(["q_id", "n_id"])
    )
    cv = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        norm(F.col(vec_col)).alias("n_nrm"),
    )
    qv = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_nrm"),
    )
    scored = (
        cands.join(cv, "n_id")
        .join(F.broadcast(qv), "q_id")
        .select(
            "q_id",
            "n_id",
            (dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_nrm") * F.col("n_nrm"))).alias("sim"),
        )
    )
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
    # r12 (the lsh_bucket r6 lesson): the unrolled per-centroid cosine chain
    # (nlist × full dot+norm scalar trees) was a multi-thousand-node
    # projection that fell out of whole-stage codegen into interpreted eval.
    # The centroid matrix is now ONE nested-array literal and cell scoring a
    # transform() fold over it; the row vector's norm is hoisted to a single
    # per-row column and each centroid's norm is precomputed at plan-build
    # time by replaying norm()'s exact fold in Python (_norm_py — binary64
    # ops in the same order, so the doubles are bit-identical).  sim per
    # cell = dot/(vnrm·cnrm): the same IEEE tree as cosine() over the same
    # operand values, so cell assignment and scores are unchanged.
    # (r12 second pass: const_array — the same F.lit, built once per session
    # and memoized by content; identical tree, zero py4j on reuse — consts.py)
    cents_arr = const_array([[float(x) for x in cvec] for _, cvec in centroids])
    cnorms_arr = const_array([_norm_py(cvec) for _, cvec in centroids])

    def nearest_cells(vec: Column, vnrm: Column, n: int) -> Column:
        """Array of the n nearest centroid indexes (by cosine, descending)."""
        scored = F.transform(
            F.sequence(F.lit(0), F.lit(nlist - 1)),
            lambda i: F.struct(
                (
                    dot(vec, F.element_at(cents_arr, i + 1))
                    / (vnrm * F.element_at(cnorms_arr, i + 1))
                ).alias("sim"),
                i.alias("cell"),
            ),
        )
        top = F.slice(F.reverse(F.array_sort(scored)), 1, n)
        return F.transform(top, lambda s: s["cell"])

    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        norm(F.col(vec_col)).alias("n_nrm"),
    ).select(
        "n_id",
        "n_vec",
        "n_nrm",
        F.element_at(nearest_cells(F.col("n_vec"), F.col("n_nrm"), 1), 1).alias("_cell"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_nrm"),
    ).select(
        "q_id",
        "q_vec",
        "q_nrm",
        F.explode(nearest_cells(F.col("q_vec"), F.col("q_nrm"), nprobe)).alias("_cell"),
    )
    scored = (
        c.join(F.broadcast(q), "_cell")
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            (dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_nrm") * F.col("n_nrm"))).alias("sim"),
        )
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
    # r12 (the lsh_bucket r6 lesson): the fully-unrolled encoder —
    # m × ksub × sub scalar diff² terms per row, ~10k expression nodes —
    # fell out of whole-stage codegen into interpreted eval (the `coded`
    # Project carried no codegen star in the before-plan).  The codebook is
    # now ONE nested-array literal; subspace distances are aggregate()
    # folds over the SAME index range accumulating acc + diff·diff in the
    # same order, so every distance, code and LUT entry is bit-identical.
    # (r12 second pass: const_array — the same F.lit, built once per session
    # and memoized by content; see consts.py)
    cents_arr = const_array([[float(x) for x in cv] for cv in cents])

    def subdist(vec: Column, cvec: Column, s: int) -> Column:
        """Exact squared L2 between vec's subspace s and a codeword column."""
        return F.aggregate(
            F.sequence(F.lit(s * sub + 1), F.lit(s * sub + sub)),  # 1-based
            F.lit(0.0),
            lambda acc, i: acc
            + (F.element_at(vec, i).cast("double") - F.element_at(cvec, i))
            * (F.element_at(vec, i).cast("double") - F.element_at(cvec, i)),
        )

    def code_for(vec: Column, s: int) -> Column:
        scored = F.transform(
            F.sequence(F.lit(0), F.lit(ksub - 1)),
            lambda j: F.struct(
                subdist(vec, F.element_at(cents_arr, j + 1), s).alias("d"),
                j.alias("j"),
            ),
        )
        return F.element_at(F.array_sort(scored), 1)["j"]

    coded = corpus.select(
        F.col(id_col).alias("n_id"),
        *[code_for(F.col(vec_col), s).alias(f"code{s}") for s in range(m)],
    )
    # per-query ADC lookup tables: lut{s}[j+1] = subdist(q, codeword j, s)
    def lut_for(s: int) -> Column:
        # NB: a plain `lambda cv, s=s` would be treated by transform() as a
        # TWO-argument (element, index) lambda, silently binding the array
        # index to s — hence the closure.
        return F.transform(cents_arr, lambda cv: subdist(F.col(vec_col), cv, s))

    q = queries.select(
        F.col(id_col).alias("q_id"),
        *[lut_for(s).alias(f"lut{s}") for s in range(m)],
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
    # r12 (guide §2.3 — shuffle keys, not payloads): the band self-join and
    # the pair dedup used to carry the 64-float vector through every
    # exchange — ``tables``× replicated on each join side (~tables·512 B
    # per doc where 16 B of id + band key decide everything).  Band rows
    # now carry ids only; vectors and per-row precomputed norms re-attach
    # via two row-count-bounded joins before the exact verify (the bitext
    # discipline).  sim stays bit-identical: dot/(a_nrm·b_nrm) is the same
    # IEEE expression tree as cosine() over the same operands.
    grp = [F.col(group_col).alias("_grp")] if group_col else []
    buckets = bucket_array(vec_col, dim, planes=planes, tables=tables)
    # Eager checkpoint: the self-join below references the banded stream on
    # BOTH sides, and each reference re-evaluates the tables×planes
    # hyperplane dots per row (measured: the banding pass is the dominant
    # cost of the whole op).  The checkpointed state is (group, id, band,
    # bucket) — a few dozen bytes × tables per doc, the same bounded-reuse
    # discipline as connected_components' per-round truncation.
    banded = df.select(
        *grp,
        F.col(id_col),
        F.posexplode(buckets).alias("_t", "_bkt"),
    ).localCheckpoint(eager=True)
    keys = (["_grp"] if group_col else []) + ["_t", "_bkt"]
    a = banded.select(*keys, F.col(id_col).alias("a_id"))
    b = banded.select(*keys, F.col(id_col).alias("b_id"))
    cand = (
        a.join(b, keys)
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    vn_a = df.select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("a_vec"),
        norm(F.col(vec_col)).alias("a_nrm"),
    )
    vn_b = df.select(
        F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("b_vec"),
        norm(F.col(vec_col)).alias("b_nrm"),
    )
    return (
        cand.join(vn_a, "a_id")
        .join(vn_b, "b_id")
        .select(
            "a_id",
            "b_id",
            (dot(F.col("a_vec"), F.col("b_vec")) / (F.col("a_nrm") * F.col("b_nrm"))).alias("sim"),
        )
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
        buckets = bucket_array(vec_col, dim, planes=planes, tables=tables)
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
