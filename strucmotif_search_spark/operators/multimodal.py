"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, decoded/feature-extracted via Arrow-batched pandas UDFs.

``decode_image`` REALLY decodes two dependency-free formats in pure numpy —
binary PPM (P6) and uncompressed 24-bit BMP — so the decode path is exercised
on real pixel data end-to-end.  Formats that need an external codec library
(PNG/JPEG/...) remain stubbed: they raise ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (seeded from the
payload digest) stands in so the Spark-side plumbing — schema, partitioning,
UDF signature, Arrow batch shape — stays testable for any payload.

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


def encode_ppm(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 array -> binary PPM (P6) payload."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("PPM P6 encodes exactly 3 channels")
    header = f"P6\n{w} {h}\n255\n".encode("ascii")
    return header + np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6): ASCII header `P6 <w> <h> <maxval>` with arbitrary
    whitespace and `#` comments, then w*h*3 raw bytes."""
    pos = 2  # past magic
    fields: list[int] = []
    n = len(payload)
    while len(fields) < 3:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < n and payload[pos : pos + 1] == b"#":  # comment to EOL
            while pos < n and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raster
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM (maxval 255) supported")
    need = w * h * 3
    raster = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    return raster.reshape(h, w, 3).copy()


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER), bottom-up or top-down
    rows, 4-byte row padding; returns HxWx3 RGB."""
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 array.

    Real pure-numpy decoders for binary PPM (P6) and uncompressed 24-bit
    BMP; other formats need codec libraries not present in this container
    and raise ``NotImplementedError`` unless ``fake=True``, in which case a
    deterministic pseudo-image (seeded from the payload digest) stands in so
    downstream plumbing is testable for any payload.
    """
    if fake:
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    head = bytes(payload[:2])
    if head == b"P6":
        return _decode_ppm(bytes(payload))
    if head == b"BM":
        return _decode_bmp(bytes(payload))
    raise NotImplementedError(
        "only PPM(P6)/BMP(24-bit) decode natively; other formats require an "
        "image library not available here — pass fake=True for the "
        "deterministic test decoder"
    )


DECODED_IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("pixel_sha256", StringType(), False),
    ]
)


def decode_image_dims(media: DataFrame) -> DataFrame:
    """Really decode each payload and emit (media_id, width, height,
    sha256(decoded pixel bytes)) — the digest proves the decoder inverted
    the encoder bit-exactly, and the output is replayable by any engine that
    can slice the raster bytes back out of the payload."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, digs = [], [], []
            for payload in pdf["payload"]:
                arr = decode_image(bytes(payload))
                hs.append(arr.shape[0])
                ws.append(arr.shape[1])
                digs.append(hashlib.sha256(arr.tobytes()).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "pixel_sha256": digs,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema=DECODED_IMAGE_SCHEMA
    )


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
                # chunked projection: generating the full (arr.size x DIM)
                # Gaussian matrix at once costs ~1.2 GB for one 2048x1536
                # image.  Chunked row generation draws the SAME Gaussian
                # stream in the same order (row-major), so the projection is
                # deterministic for a given payload with flat memory; the
                # chunked float64 accumulation is fixed-order and reproducible
                flat = arr.reshape(-1)
                acc = np.zeros(FEATURE_DIM, dtype=np.float64)
                chunk = 1 << 18
                for lo in range(0, flat.size, chunk):
                    hi = min(lo + chunk, flat.size)
                    proj = rng.standard_normal((hi - lo, FEATURE_DIM))
                    acc += flat[lo:hi] @ proj
                feats.append(acc.astype(np.float32))
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
