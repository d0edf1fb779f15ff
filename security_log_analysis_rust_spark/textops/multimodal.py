"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages.

Decode support (all stdlib — no codec library in this container):

* **PNG**: full pixel decode for the non-interlaced 8-bit-depth formats
  (gray / RGB / gray+alpha / RGBA) — chunk walk, zlib IDAT inflate, and
  per-scanline unfiltering incl. the Paeth predictor (:func:`decode_png`).
* **WAV**: PCM sample decode for 8/16-bit integer formats
  (:func:`decode_wav`).
* anything else falls back to the deterministic fake decoder, keeping the
  Spark-side contract (schemas, batch shapes, partitioning, null/corrupt
  handling) uniform; exotic codecs (JPEG, MP3, video) would slot in at
  :func:`decode_png`'s position as one-function changes.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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


def _decode_image_real(payload: bytes):
    """Real PIXEL decode hook — PNG handled natively (:func:`decode_png`);
    returns None for formats that would need an external codec (JPEG &c),
    which callers route to the deterministic fake decoder."""
    return decode_png(payload)


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


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes):
    """Full stdlib PNG pixel decode -> uint8 ndarray (h, w, channels), or
    None if the payload isn't a PNG this decoder handles (8-bit depth,
    non-interlaced, gray/RGB/gray+alpha/RGBA).

    Chunk walk per the PNG spec, zlib inflate of the concatenated IDAT
    stream, then scanline unfiltering (filters 0-4). Pure Python per
    scanline — these run inside Arrow-batched workers on thumbnail-sized
    payloads; a vectorized library would slot in here unchanged.
    """
    if len(payload) < 45 or not payload.startswith(PNG_SIGNATURE):
        return None
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            return None  # truncated chunk
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # len + type + data + crc
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    width = int.from_bytes(ihdr[0:4], "big")
    height = int.from_bytes(ihdr[4:8], "big")
    depth, color, interlace = ihdr[8], ihdr[9], ihdr[12]
    channels = _PNG_CHANNELS.get(color)
    if depth != 8 or interlace != 0 or channels is None or color == 3:
        return None  # palette / sub-byte / interlaced: out of scope
    if width == 0 or height == 0:
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = width * channels
    if len(raw) != height * (stride + 1):
        return None
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = channels
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw[row_start + 1 : row_start + 1 + stride], dtype=np.uint8
        ).astype(np.int32)
        if ftype == 0:  # None
            recon = line
        elif ftype == 1:  # Sub
            recon = line.copy()
            for x in range(bpp, stride):
                recon[x] = (recon[x] + recon[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            recon = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            recon = line.copy()
            for x in range(stride):
                left = recon[x - bpp] if x >= bpp else 0
                recon[x] = (recon[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            recon = line.copy()
            for x in range(stride):
                left = recon[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                recon[x] = (recon[x] + _paeth(int(left), int(prev[x]), int(ul))) & 0xFF
        else:
            return None
        out[y] = recon.astype(np.uint8)
        prev = recon
    return out.reshape(height, width, channels)


def decode_wav(payload: bytes):
    """Stdlib WAV PCM decode -> (sample_rate, int16 ndarray (n, channels)),
    or None for anything that isn't integer-PCM RIFF/WAVE. Walks the RIFF
    chunks to the 'data' chunk; handles 16-bit signed and 8-bit unsigned."""
    hdr = parse_wav_header(payload)
    if hdr is None:
        return None
    n_channels, sample_rate, bits = hdr
    audio_format = int.from_bytes(payload[20:22], "little")
    if audio_format != 1 or bits not in (8, 16):
        return None
    pos = 12
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        ln = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if cid == b"data":
            data = payload[pos + 8 : pos + 8 + ln]
            break
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if data is None:
        return None
    if bits == 16:
        samples = np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2")
    else:
        samples = (
            np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128
        ) * 256
    n = (len(samples) // n_channels) * n_channels
    return sample_rate, samples[:n].reshape(-1, n_channels)


def image_features(pixels: np.ndarray) -> np.ndarray:
    """Deterministic 16-dim feature vector from real pixels: 4x4 grid of
    mean luminance over the channel-averaged image (values 0-255)."""
    lum = pixels.astype(np.float64).mean(axis=2)
    h, w = lum.shape
    ys = np.linspace(0, h, 5).astype(int)
    xs = np.linspace(0, w, 5).astype(int)
    feats = [
        lum[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
        for i in range(4)
        for j in range(4)
    ]
    return np.asarray(feats, dtype=np.float32)


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
                pixels = decode_png(payload)
                if pixels is not None:  # real pixel decode
                    h, w, c = pixels.shape
                    feats = image_features(pixels)
                else:
                    w, h, c, feats = _fake_decode(payload)
                    png = parse_png_header(payload)
                    if png is not None:  # header-only (palette/interlaced)
                        w, h, c = png
                rows.append((mid, w, h, c, "ok", feats.tolist()))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_channels", "ok", "features"],
            )

    return media.select("media_id", "payload").mapInPandas(gen, DECODED_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("ok", StringType()),  # 'ok' | 'corrupt' | 'null'
        StructField("features", ArrayType(FloatType())),
    ]
)


def decode_audio(media: DataFrame) -> DataFrame:
    """audio binary payloads -> PCM metadata + windowed-RMS features.

    Real WAV decode (:func:`decode_wav`); non-WAV payloads report
    'corrupt'. Features: RMS amplitude over N_FEATURES equal time windows
    of the channel-mean signal, normalized to [0, 1]."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((mid, None, None, None, "null", None))
                    continue
                decoded = decode_wav(bytes(payload))
                if decoded is None:
                    rows.append((mid, None, None, None, "corrupt", None))
                    continue
                rate, samples = decoded
                mono = samples.astype(np.float64).mean(axis=1)
                bounds = np.linspace(0, len(mono), N_FEATURES + 1).astype(int)
                feats = [
                    float(np.sqrt(np.mean(mono[a:b] ** 2)) / 32768.0)
                    if b > a
                    else 0.0
                    for a, b in zip(bounds[:-1], bounds[1:])
                ]
                rows.append(
                    (
                        mid,
                        int(rate),
                        int(samples.shape[1]),
                        int(samples.shape[0]),
                        "ok",
                        np.asarray(feats, dtype=np.float32).tolist(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_channels", "n_samples",
                    "ok", "features",
                ],
            )

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "payload"
    ).mapInPandas(gen, AUDIO_SCHEMA)


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
