"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the DECODE step is a stub
(deterministic fake features behind ``decode_stub``, clearly marked) — but
the Spark-side plumbing is real and tested: binary columns flow through
parquet scans, merges (null-safe change detection works on binary/array
natively), and an Arrow-batched ``mapInPandas`` feature-extraction stage
with an explicit output schema, which is exactly the shape a real decoder
(PIL/ffmpeg on the executors) plugs into.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive an opaque binary payload + metadata from text (stands in for
    image/audio bytes in the synthetic corpus)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type", F.when(F.col("doc_id") % 2 == 0, "image/png").otherwise("audio/wav")
    )


def decode_stub(payload: bytes) -> tuple[int, int, float]:
    """STUB — deterministic fake decode. A real deployment replaces this with
    PIL.Image.open / soundfile.read on the executor; the surrounding Spark
    plumbing (schema, batching, partitioning) is unchanged."""
    n = len(payload)
    width = 16 + n % 64
    height = 16 + (n // 64) % 64
    mean_luma = (sum(payload[:32]) % 256) / 255.0 if n else 0.0
    return width, height, mean_luma


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas
    (the scale-correct shape: executors stream record batches, nothing is
    collected; partitioning is preserved)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "mean_luma": [f[2] for f in feats],
                }
            )

    return df.select("doc_id", "media_type", "payload").mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


def resize_stub(payload: bytes, target_bytes: int) -> bytes:
    """STUB — deterministic fake resize (truncate/cycle-pad to target size).
    A real deployment decodes, resamples (PIL ``Image.resize`` / librosa
    ``resample``) and re-encodes; the Spark plumbing is unchanged."""
    if not payload:
        return b"\x00" * target_bytes
    reps = (target_bytes // len(payload)) + 1
    return (payload * reps)[:target_bytes]


def resize_media(df: DataFrame, *, target_bytes: int = 256) -> DataFrame:
    """Arrow-batched payload transform (resize/transcode shape): binary in →
    binary out, schema explicit, executed streaming per record batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [resize_stub(p, target_bytes) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": out,
                    "n_bytes": [len(p) for p in out],
                }
            )

    return df.select("doc_id", "media_type", "payload").mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


def frame_sample(df: DataFrame, *, n_frames: int = 4) -> DataFrame:
    """Frame sampling (video → n frames): ONE input row fans out to
    ``n_frames`` output rows — the flat-map shape ``mapInPandas`` supports
    natively (output row count is independent of input row count).  The
    frame extraction is a STUB (fixed-stride byte slices standing in for
    ffmpeg keyframe decode); partitioning and the 1→n row contract are the
    real, tested plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                stride = max(1, len(payload) // n_frames)
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(payload[i * stride : i * stride + stride]))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame": frames,
                    "n_bytes": [len(f) for f in frames],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)


__all__ = [
    "FEATURE_SCHEMA",
    "FRAME_SCHEMA",
    "RESIZE_SCHEMA",
    "attach_binary_payload",
    "decode_stub",
    "extract_features",
    "frame_sample",
    "resize_media",
    "resize_stub",
    "BinaryType",
]
