"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched pandas via mapInPandas.

The real pipelines carry image/audio/video bytes; this container has no
decode libraries, so the DECODE step is stubbed two ways (clearly
marked), while everything Spark-side — schema, batching, partitioning,
UDF signatures — is real and tested:

- `featurize_blobs`: a REAL deterministic feature extractor (16-bin byte
  histogram + mean byte) computed with numpy over each Arrow batch.
  This is exactly the shape of an image-embedding pass: binary in,
  fixed-width float vector out, one vectorized call per batch.
- `sample_frames`: splits each blob into fixed-size "frames" (the
  video-frame-sampling access pattern: one input row -> N output rows).
- `decode_image`: the genuine library-gated decode, raising
  NotImplementedError until an image codec is available.

Blobs are synthesized from the documents table (utf-8 bytes of text)
so every SF has a binary corpus without touching the read-only testdata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import load

FRAME_BYTES = 256
HIST_BINS = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_bytes", T.LongType()),
    ]
)


def blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary corpus: blob payload + typed metadata struct."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("blob"),
        F.struct(
            F.col("source").alias("uri"),
            F.lit("text/plain").alias("mime"),
            F.col("n_chars").alias("declared_size"),
        ).alias("meta"),
    )


def decode_image(blob: bytes) -> object:
    """STUB: genuine image decode requires a codec library not present in
    this container. The Spark-side plumbing (schema, batching) is real;
    swap this function for PIL/cv2 when available."""
    raise NotImplementedError("image decode requires an image codec library")


def _featurize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            arr = np.frombuffer(blob, dtype=np.uint8)
            hist = np.bincount(arr >> 4, minlength=HIST_BINS).astype(np.float64)
            total = float(arr.size) if arr.size else 1.0
            rows.append(
                {
                    "doc_id": int(doc_id),
                    "n_bytes": int(arr.size),
                    "n_frames": int(-(-arr.size // FRAME_BYTES)),
                    # raw double; rounding happens in the Spark column so
                    # HALF_UP semantics match the oracle (python round is
                    # banker's rounding)
                    "mean_byte": float(arr.mean()) if arr.size else 0.0,
                    "features": [round(x, 6) for x in (hist / total).tolist()],
                }
            )
        yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])


def featurize_blobs(df: DataFrame) -> DataFrame:
    """Vectorized binary feature extraction via mapInPandas (Arrow batch
    transfer, no per-row Python). At 100 TB this is the decode/embed
    pass: partition-parallel, constant memory per batch."""
    return df.select("doc_id", "blob").mapInPandas(_featurize_batches, FEATURE_SCHEMA)


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            n = len(blob)
            idx = 0
            for start in range(0, n, FRAME_BYTES):
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "frame_idx": idx,
                        "frame_bytes": min(FRAME_BYTES, n - start),
                    }
                )
                idx += 1
        yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])


def sample_frames(df: DataFrame) -> DataFrame:
    """Frame sampling: one row in, n_frames rows out (flatMap shape)."""
    return df.select("doc_id", "blob").mapInPandas(_frame_batches, FRAME_SCHEMA)


def blob_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() surface: featurize the binary corpus; scalar parts are
    SQL-checkable (n_bytes/n_frames/mean_byte from utf-8 text bytes)."""
    return featurize_blobs(blobs(spark, sf_dir)).select(
        "doc_id", "n_bytes", "n_frames", F.round("mean_byte", 6).alias("mean_byte")
    )


def frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() surface: frames per doc + tail-frame size."""
    frames = sample_frames(blobs(spark, sf_dir))
    return frames.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.min("frame_bytes").alias("tail_bytes"),
    )
