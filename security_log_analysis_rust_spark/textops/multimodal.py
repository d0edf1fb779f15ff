"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages. The
actual codec work is STUBBED (image/audio libraries are not available in
this container — see ``_decode_image_real``): the deterministic fake decoder
keeps the Spark-side contract (schemas, batch shapes, partitioning,
null/corrupt handling) real and fully tested, so swapping in PIL/ffmpeg is a
one-function change.
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
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("ok", StringType()),  # 'ok' | 'corrupt' | 'null'
        StructField("features", ArrayType(FloatType())),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame_fingerprint", StringType()),
    ]
)

N_FEATURES = 16


def _decode_image_real(payload: bytes):  # pragma: no cover - no codecs here
    """Real decode hook. Swap in PIL/libvips when available."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "the pipeline uses the deterministic fake decoder instead"
    )


def _fake_decode(payload: bytes):
    """Deterministic stand-in decoder: dimensions and features derive from
    the payload bytes alone, so results are stable across runs/executors."""
    digest = hashlib.md5(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    channels = 3
    rng = np.random.default_rng(int.from_bytes(digest[2:10], "little"))
    features = rng.standard_normal(N_FEATURES).astype(np.float32)
    return width, height, channels, features


def decode_media(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """binary payloads -> typed decode results (Arrow-batched)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((mid, None, None, None, "null", None))
                    continue
                payload = bytes(payload)
                if len(payload) < 8:  # corrupt-input contract
                    rows.append((mid, None, None, None, "corrupt", None))
                    continue
                w, h, c, feats = _fake_decode(payload)
                rows.append((mid, w, h, c, "ok", feats.tolist()))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_channels", "ok", "features"],
            )

    return media.select("media_id", "payload").mapInPandas(gen, DECODED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10, max_frames: int = 5) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame.

    The fake 'frames' are fingerprints of payload slices — the schema and
    fan-out shape (1 row in, <=max_frames rows out) match a real ffmpeg
    sampler.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                n = min(max_frames, max(1, len(payload) // max(every_n, 1)))
                for i in range(n):
                    chunk = payload[i * every_n : (i + 1) * every_n]
                    rows.append(
                        (mid, i, hashlib.md5(chunk).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_no", "frame_fingerprint"]
            )

    return media.filter(F.col("kind") == "video").select(
        "media_id", "payload"
    ).mapInPandas(gen, FRAMES_SCHEMA)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        if i % 13 == 0:
            payload = None
        elif i % 11 == 0:
            payload = bytes([1, 2, 3])  # corrupt (<8 bytes)
        else:
            payload = rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8).tobytes()
        rows.append((i, kind, payload, f"{kind}/x-fake"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
