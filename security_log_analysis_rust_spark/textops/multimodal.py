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
    """Real PIXEL decode hook. Swap in PIL/libvips when available.

    (Container-format HEADERS are parsed for real — see
    :func:`parse_png_header` / :func:`parse_wav_header`; only the pixel/PCM
    payload decode is stubbed.)"""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "the pipeline uses the deterministic fake decoder instead"
    )


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: PNG color type -> channel count (PNG spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def parse_png_header(payload: bytes):
    """Pure-Python PNG IHDR parse -> (width, height, n_channels) or None.

    Real container parsing (signature + IHDR layout per the PNG spec); no
    codec library needed. Returns None for anything that isn't a
    well-formed PNG header."""
    if len(payload) < 33 or not payload.startswith(PNG_SIGNATURE):
        return None
    if payload[12:16] != b"IHDR":
        return None
    width = int.from_bytes(payload[16:20], "big")
    height = int.from_bytes(payload[20:24], "big")
    channels = _PNG_CHANNELS.get(payload[25])
    if channels is None or width == 0 or height == 0:
        return None
    return width, height, channels


def parse_wav_header(payload: bytes):
    """Pure-Python RIFF/WAVE fmt-chunk parse ->
    (n_channels, sample_rate, bits_per_sample) or None."""
    if len(payload) < 36 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    if payload[12:16] != b"fmt ":
        return None
    n_channels = int.from_bytes(payload[22:24], "little")
    sample_rate = int.from_bytes(payload[24:28], "little")
    bits = int.from_bytes(payload[34:36], "little")
    if n_channels == 0 or sample_rate == 0:
        return None
    return n_channels, sample_rate, bits


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
                png = parse_png_header(payload)
                if png is not None:  # real container metadata when present
                    w, h, c = png
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
