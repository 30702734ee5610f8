"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

The decode step is STUBBED (no image/audio libraries in this container):
``fake=True`` produces deterministic hash-derived features so the Spark-side
plumbing — schema, partitioning, Arrow batch shape, UDF signatures — is real
and tested; ``fake=False`` raises NotImplementedError at the exact point a
real decoder (PIL / torchaudio / pyav) would plug in.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("media", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)


def synthetic_assets(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table exercising the binary column path."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        mt = ["image", "audio", "video"][i % 3]
        payload = rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                mt,
                bytearray(payload),
                (64, 48, 1000 + i, "fake") if mt != "image" else (64, 48, None, "png"),
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    h = hashlib.sha256(payload).digest()
    seed = int.from_bytes(h[:8], "little")
    return np.random.default_rng(seed).standard_normal(dim)


def extract_features(
    assets: DataFrame, *, dim: int = 16, fake: bool = True, batch_size: int = 256
) -> DataFrame:
    """Decode + feature-extract over the binary column (mapInPandas, Arrow
    batches). Returns (asset_id, media_type, features array<double>)."""

    def batch(it):
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real decoders (PIL/torchaudio/pyav) are not available in "
                    "this container; pass fake=True for the deterministic stub"
                )
            feats = [
                _fake_features(bytes(b), dim).tolist() for b in pdf["media"].values
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "media_type": pdf["media_type"].values,
                    "features": feats,
                }
            )

    return assets.select("asset_id", "media_type", "media").mapInPandas(
        batch, "asset_id long, media_type string, features array<double>"
    )


def frame_sample(assets: DataFrame, *, every_ms: int = 500, fake: bool = True) -> DataFrame:
    """Video frame sampling stub: one row per sampled frame with the frame
    timestamp; payload decode stubbed as above."""

    def batch(it):
        for pdf in it:
            if not fake:
                raise NotImplementedError("no video decoder in this container")
            ids, ts = [], []
            for aid, meta in zip(pdf["asset_id"].values, pdf["meta"].values):
                dur = (meta["duration_ms"] or 0) if meta is not None else 0
                stamps = list(range(0, int(dur), every_ms))
                ids.extend([aid] * len(stamps))
                ts.extend(stamps)
            yield pd.DataFrame({"asset_id": ids, "frame_ms": ts})

    return (
        assets.where(F.col("media_type") == "video")
        .select("asset_id", "meta")
        .mapInPandas(batch, "asset_id long, frame_ms int")
    )
