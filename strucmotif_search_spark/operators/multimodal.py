"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, decoded/feature-extracted via Arrow-batched pandas UDFs.

The decode kernels themselves are STUBBED (the image/audio libraries are not
in this container): ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (seeded from the
payload digest) stands in so the Spark-side plumbing — schema, partitioning,
UDF signature, Arrow batch shape — is real and tested end-to-end.

Scale shape: media rows are wide (MBs); ``mapInPandas`` with a bounded Arrow
batch size keeps executor memory flat, and feature extraction emits only the
fixed-width feature columns so downstream shuffles never carry payload bytes.
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
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("digest", StringType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)

FEATURE_DIM = 16


def synthesize_media(spark, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (opaque payload bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                rng = np.random.default_rng(seed * 7919 + int(i))
                kind = kinds[int(i) % 3]
                payload = rng.integers(0, 256, int(rng.integers(64, 4096))).astype(
                    np.uint8
                ).tobytes()
                rows.append(
                    (
                        int(i),
                        kind,
                        mimes[kind],
                        payload,
                        int(rng.integers(16, 1024)) if kind == "image" else None,
                        int(rng.integers(16, 1024)) if kind == "image" else None,
                        int(rng.integers(1000, 600000)) if kind != "image" else None,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_SCHEMA.fields]
            )

    return spark.range(n_rows).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 array.

    STUB: real decoding needs an image library not present in this container.
    With ``fake=True`` a deterministic pseudo-image (seeded from the payload
    digest) is returned so downstream plumbing is testable.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library not available here; "
            "pass fake=True for the deterministic test decoder"
        )
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)


def extract_features(
    media: DataFrame, fake_decode: bool = True, batch_rows: int = 64
) -> DataFrame:
    """media table -> fixed-width feature rows via mapInPandas.

    The feature kernel is deterministic (digest-seeded) when fake_decode;
    swapping in a real model is a one-function change with the same schema.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, digests, sizes = [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                digest = hashlib.sha256(raw).hexdigest()
                digests.append(digest)
                sizes.append(len(raw))
                arr = decode_image(raw, fake=fake_decode).astype(np.float64)
                rng = np.random.default_rng(int(digest[:8], 16))
                proj = rng.standard_normal((arr.size, FEATURE_DIM))
                feats.append((arr.reshape(-1) @ proj).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "digest": digests,
                    "feature": [f.tolist() for f in feats],
                }
            )

    slim = media.select("media_id", "kind", "payload")
    return slim.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: (media_id, frame_ts_ms) rows derived from
    duration metadata — pure Catalyst (sequence + explode); the decode of each
    planned frame is the stubbed kernel above."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
