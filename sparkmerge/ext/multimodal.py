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


__all__ = ["FEATURE_SCHEMA", "attach_binary_payload", "decode_stub", "extract_features", "BinaryType"]
