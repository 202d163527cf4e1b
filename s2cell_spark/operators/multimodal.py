"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-
batched ``mapInPandas`` stages. The decode step itself is STUBBED in this
container (no image/audio libs — clearly marked below); everything
Spark-side — schema, batch shape, partitioning, UDF signatures, the
deterministic fallback featurizer — is real and tested.

Pattern at 100 TB: payload tables are wide; always project (key, media,
meta) only, repartition by size-balanced key ranges before the Python
stage so Arrow batches are uniform, and keep decoded features narrow.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),   # image|audio|video
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("codec", StringType()),
    ]
)


def attach_fake_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic media column: payload = utf-8 text bytes,
    metadata derived from doc_id (pure SQL). Stands in for a real WARC
    media sidecar so the pipeline shape is exercised end-to-end."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col("text"), "utf-8").alias("media"),
        F.struct(
            F.when(F.col(id_col) % 3 == 0, "image")
            .when(F.col(id_col) % 3 == 1, "audio")
            .otherwise("video")
            .alias("media_type"),
            (F.col(id_col) % 1920 + 16).cast("int").alias("width"),
            (F.col(id_col) % 1080 + 16).cast("int").alias("height"),
            (F.col(id_col) % 90000).cast("long").alias("duration_ms"),
            F.lit("synthetic/v1").alias("codec"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, media_type: str) -> np.ndarray:
    """REAL DECODER STUB — this container ships no image/audio libraries.

    On a production cluster this dispatches to PIL/torchaudio/pyav. Here
    it raises so nothing silently fakes decode; use
    :func:`deterministic_feature` for tested plumbing.
    """
    raise NotImplementedError(
        "media decode requires PIL/torchaudio/pyav — not available in this "
        "container; wire the real decoder here on a production image"
    )


def deterministic_feature(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic fake featurizer: sha256 -> dim float64 in [0, 1).
    Stable across runs/partitions — used to test the full distributed
    plumbing with byte-identical outputs."""
    h = hashlib.sha256(payload).digest()
    reps = (dim * 8 + len(h) - 1) // len(h)
    raw = (h * reps)[: dim * 8]
    ints = np.frombuffer(raw, dtype=np.uint64)[:dim]
    return (ints >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def extract_features(media_df: DataFrame, dim: int = 16) -> DataFrame:
    """(doc_id, media_type, n_bytes, feature[dim]) via mapInPandas.

    Tries the real decoder per batch, falls back to the deterministic
    featurizer when the decode stack is absent (flagged in `decoded`)."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media_type", StringType()),
            StructField("n_bytes", LongType()),
            StructField("decoded", StringType()),
            StructField("feature", ArrayType(DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats, modes = [], []
            for payload, meta in zip(pdf["media"], pdf["meta"]):
                mt = meta["media_type"] if meta is not None else "unknown"
                try:
                    vec = decode_media(bytes(payload), mt)
                    modes.append("real")
                except NotImplementedError:
                    vec = deterministic_feature(bytes(payload))
                    modes.append("stub")
                feats.append([float(x) for x in vec])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": [m["media_type"] for m in pdf["meta"]],
                    "n_bytes": [len(bytes(p)) for p in pdf["media"]],
                    "decoded": modes,
                    "feature": feats,
                }
            )

    return media_df.select("doc_id", "media", "meta").mapInPandas(run, schema)


def frame_sample_plan(media_df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one row per (doc_id, frame_ts_ms) —
    the explode is native; actual frame decode goes through
    :func:`decode_media` on a real stack."""
    vids = media_df.filter(F.col("meta.media_type") == "video")
    return vids.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("meta.duration_ms"), F.lit(every_ms).cast("long"))
        ).alias("frame_ts_ms"),
    )
