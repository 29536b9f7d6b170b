"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a `meta` map; decode /
feature-extract / resize / frame-sample are Arrow-batched mapInPandas stages.
The *Spark-side* contract — schemas, batch shapes, partitioning, UDF
signatures — is real and tested; the codec step itself is stubbed because no
image/audio libraries ship in this environment: `deterministic_fake=True`
derives features from a SHA-256 of the payload (stable across runs/executors),
and `deterministic_fake=False` raises NotImplementedError where a real
decoder (PIL / torchaudio / pyav) would slot in.

Scale notes: payload bytes never leave the executor; every stage is a narrow
map (no shuffle). Feature extraction cost is bounded per Arrow batch, so
`spark.sql.execution.arrow.maxRecordsPerBatch` (set small for large blobs)
is the memory knob.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               MapType, StringType, StructField, StructType)

ASSET_SCHEMA = StructType([
    StructField("asset_id", StringType()),
    StructField("kind", StringType()),          # image | audio | video
    StructField("payload", BinaryType()),       # opaque encoded bytes
    StructField("meta", MapType(StringType(), StringType())),
])

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType([
    StructField("asset_id", StringType()),
    StructField("kind", StringType()),
    StructField("n_bytes", IntegerType()),
    StructField("features", ArrayType(FloatType())),
])

FRAMES_SCHEMA = StructType([
    StructField("asset_id", StringType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_payload", BinaryType()),
])


def synthesize_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake assets for tests/bench (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        kind = kinds[i % 3]
        rows.append((f"asset-{i:06d}", kind, h * (4 + i % 4),
                     {"codec": "fake", "duration_ms": str(100 * (i % 7))}))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic pseudo-embedding: SHA-256 -> 16 floats in [-1, 1)."""
    d = hashlib.sha256(payload).digest() + hashlib.sha256(payload + b"x").digest()
    arr = np.frombuffer(d[: FEATURE_DIM * 4], dtype="<u4").astype(np.float64)
    return list(((arr / 2**32) * 2 - 1).astype(np.float32))


def extract_features(df: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """binary payload -> feature vector, batched via mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real multimodal decode requires an image/audio codec library; "
                    "install one and plug it in here")
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "features": pdf["payload"].map(_fake_features),
            })

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 2, max_frames: int = 4,
                  deterministic_fake: bool = True) -> DataFrame:
    """video assets -> sampled frame rows (1 row per sampled frame).

    Real frame decode is stubbed; the fake slices the payload so frame counts,
    ordering, and batch fan-out are exercised for real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError("real frame sampling requires a video decoder")
            out_ids, out_idx, out_payloads = [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                n_frames = min(max_frames, max(1, len(payload) // 32))
                for fi in range(0, n_frames, every_n):
                    out_ids.append(aid)
                    out_idx.append(fi)
                    out_payloads.append(bytes(payload[fi * 32:(fi + 1) * 32]))
            yield pd.DataFrame({"asset_id": out_ids,
                                "frame_idx": pd.array(out_idx, dtype="int32"),
                                "frame_payload": out_payloads})

    return df.where(F.col("kind") == "video").mapInPandas(run, schema=FRAMES_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Records the intended resize in metadata (the real pixel op is a codec
    concern); keeps the payload column flowing through the plan untouched."""
    return df.withColumn(
        "meta",
        F.map_concat(F.col("meta"), F.create_map(
            F.lit("resize"), F.lit(f"{width}x{height}"))))
