"""[EXT] similarity search over embeddings (SURVEY.md §2.D).

Oracle FP note: Spark computes cosine as a LEFT-FOLD of double products in
array order (ext/similarity.py).  The DuckDB oracle replays the *identical*
expression — explicit 64-term left-associated sums with per-element double
casts — so both engines produce bit-identical doubles and the value-hash
matches without any tolerance.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkmerge.ext.similarity import (
    brute_force_topk,
    cosine,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_topk,
)
from sparkmerge.queries import load, register

DIM = 64


def _fold_sql(terms: list[str]) -> str:
    """((0.0 + t1) + t2) + ... — matches F.aggregate's left fold exactly."""
    out = "0.0"
    for t in terms:
        out = f"({out} + {t})"
    return out


def _dot_sql(a: str, b: str) -> str:
    return _fold_sql(
        [f"(CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE))" for i in range(1, DIM + 1)]
    )


def _norm_sql(a: str) -> str:
    sq = _fold_sql(
        [f"(CAST({a}[{i}] AS DOUBLE) * CAST({a}[{i}] AS DOUBLE))" for i in range(1, DIM + 1)]
    )
    return f"sqrt({sq})"


def _cos_sql(a: str, b: str) -> str:
    return f"({_dot_sql(a, b)} / ({_norm_sql(a)} * {_norm_sql(b)}))"


@register(
    "topk_similarity",
    oracle=f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS n_id, embedding AS n_vec FROM embeddings),
scored AS (
  SELECT q.q_id, c.n_id, {_cos_sql('q.q_vec', 'c.n_vec')} AS sim
    FROM c CROSS JOIN q WHERE q.q_id <> c.n_id
)
SELECT q_id, n_id, sim, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
    FROM scored) t
 WHERE rank <= 10
""",
    description="exact top-10 cosine neighbors for 5 query vectors (broadcast brute force)",
)
def topk_similarity(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)


@register(
    "ann_lsh",
    oracle=None,
    description="approximate top-10 via random-hyperplane LSH buckets (recall checked in tests)",
)
def ann_lsh(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return lsh_topk(emb, emb.filter(F.col("vec_id") < 5), k=10, dim=DIM, planes=6, tables=8)


@register(
    "ann_ivf",
    oracle=None,
    description="approximate top-10 via IVF coarse quantization (nlist=16, nprobe=4; "
    "recall vs brute force checked in tests)",
)
def ann_ivf(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 5), k=10, nlist=16, nprobe=4)


@register(
    "dedup_embedding",
    oracle=f"""
WITH e AS (SELECT vec_id, label, embedding FROM embeddings)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       {_cos_sql('a.embedding', 'b.embedding')} AS sim
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
 WHERE a.vec_id % 25 = 0
   AND {_cos_sql('a.embedding', 'b.embedding')} >= 0.8
""",
    description="embedding-cosine near-dup pairs above 0.8, blocked by label, sampled queries",
)
def dedup_embedding(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(emb, group_col="label", threshold=0.8)
    return pairs.filter(F.col("a_id") % 25 == 0)


@register(
    "multimodal_array_sim",
    oracle=f"""
SELECT vec_id, label, {_cos_sql('embedding', 'embedding')} AS self_sim,
       CAST(len(embedding) AS INT) AS dim
  FROM embeddings WHERE vec_id < 100
""",
    description="array-column expression surface: per-row cosine/norm arithmetic on array<float>",
)
def multimodal_array_sim(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    e = F.col("embedding")
    return emb.select(
        "vec_id", "label", cosine(e, e).alias("self_sim"), F.size(e).alias("dim")
    )
