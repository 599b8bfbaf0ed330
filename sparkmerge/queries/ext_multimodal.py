"""[EXT] multimodal columns: arrays/binary through the merge + feature
extraction plumbing (SURVEY.md §2.D)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkmerge.changeset import build_changeset
from sparkmerge.ext.multimodal import (
    attach_binary_payload,
    extract_features,
    frame_sample,
    resize_media,
)
from sparkmerge.queries import load, register

# deterministic embedding-table mutation: exercises array-valued change
# detection (null-safe <=> on array<float> is native in both engines)
_EMB_MUT_SQL = """
SELECT vec_id,
       CASE WHEN vec_id % 9 = 0 THEN [CAST(0.0 AS FLOAT)] || embedding[2:]
            ELSE embedding END AS embedding,
       CASE WHEN vec_id % 6 = 0 THEN label + 1 ELSE label END AS label
  FROM embeddings
 WHERE vec_id % 13 <> 0
""".strip()


def _emb_source(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    mutated = F.concat(
        F.array(F.lit(0.0).cast("float")), F.slice(F.col("embedding"), 2, 1_000_000)
    )
    return e.where(F.col("vec_id") % 13 != 0).select(
        "vec_id",
        F.when(F.col("vec_id") % 9 == 0, mutated).otherwise(F.col("embedding")).alias("embedding"),
        F.when(F.col("vec_id") % 6 == 0, F.col("label") + 1).otherwise(F.col("label")).alias("label"),
    )


@register(
    "multimodal_columns",
    oracle=f"""
WITH src AS ({_EMB_MUT_SQL})
SELECT coalesce(t.vec_id, s.vec_id) AS vec_id,
       CASE WHEN t.vec_id IS NULL THEN 'INSERT'
            WHEN s.vec_id IS NULL THEN 'DELETE'
            WHEN t.embedding IS DISTINCT FROM s.embedding
              OR t.label IS DISTINCT FROM s.label THEN 'UPDATE'
            ELSE 'KEEP' END AS action
  FROM embeddings t FULL OUTER JOIN src s ON t.vec_id = s.vec_id
""",
    description="merge change-detection over array<float> columns (null-safe array compare)",
)
def multimodal_columns(spark, sf_dir):
    cs = build_changeset(load(spark, sf_dir, "embeddings"), _emb_source(spark, sf_dir), "vec_id")
    return cs.df.select("vec_id", F.col("_action").alias("action"))


@register(
    "multimodal_binary",
    oracle="""
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
       CAST(length(text) AS BIGINT) AS n_bytes,
       CAST(16 + length(text) % 64 AS INT) AS width,
       CAST(16 + (length(text) // 64) % 64 AS INT) AS height,
       CAST(list_sum(list_transform(string_split(substring(text, 1, 32), ''),
                                    c -> ascii(c))) % 256 AS DOUBLE) / 255.0 AS mean_luma
  FROM documents
""",
    description="binary payload plumbing: mapInPandas feature extraction (decode stubbed)",
)
def multimodal_binary(spark, sf_dir):
    d = attach_binary_payload(load(spark, sf_dir, "documents"))
    return extract_features(d)


@register(
    "multimodal_resize",
    oracle="""
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
       CAST(256 AS BIGINT) AS n_bytes
  FROM documents
""",
    description="binary resize/transcode plumbing: mapInPandas payload transform "
    "(resample stubbed; output sizes oracle-checked)",
)
def multimodal_resize(spark, sf_dir):
    d = attach_binary_payload(load(spark, sf_dir, "documents"))
    return resize_media(d, target_bytes=256).select("doc_id", "media_type", "n_bytes")


@register(
    "multimodal_frame_sample",
    oracle="""
SELECT doc_id, CAST(f AS INT) AS frame_idx,
       CAST(greatest(length(text) // 4, 1) AS BIGINT) AS n_bytes
  FROM documents, generate_series(0, 3) AS t(f)
 WHERE length(text) >= 4
""",
    description="video frame-sampling plumbing: 1 row -> n frame rows via mapInPandas "
    "flat-map (keyframe decode stubbed; fan-out + sizes oracle-checked)",
)
def multimodal_frame_sample(spark, sf_dir):
    d = attach_binary_payload(load(spark, sf_dir, "documents")).filter(
        F.length("text") >= 4
    )
    return frame_sample(d, n_frames=4).select("doc_id", "frame_idx", "n_bytes")
