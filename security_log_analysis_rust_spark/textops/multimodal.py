"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages.

Decode support (all stdlib — no codec library in this container):

* **PNG**: full pixel decode for the non-interlaced 8-bit-depth formats
  (gray / RGB / gray+alpha / RGBA) — chunk walk, zlib IDAT inflate, and
  per-scanline unfiltering incl. the Paeth predictor (:func:`decode_png`).
* **JPEG**: baseline-sequential AND progressive (SOF2) pixel decode
  (huffman + dequant + IDCT + chroma upsampling + YCbCr transform; T.81
  annex G multi-scan accumulation for progressive) in :mod:`.jpeg` — the
  dominant web image format.
* **GIF**: 87a/89a first-frame decode (variable-width LZW, palettes,
  interlace, transparency) in :mod:`.gif`.
* **BMP**: uncompressed 24/32-bit (:func:`decode_bmp`).
* **WAV**: PCM sample decode for 8/16-bit integer formats
  (:func:`decode_wav`).
* **MP3**: MPEG-1/2/2.5 frame-header walk in :mod:`.mp3` — real sample
  rate / channels / duration / bitrate profile, no PCM synthesis
  (``ok='headers'``).
* **MP4**: ISO-BMFF box-structure walk in :mod:`.mp4` — brand, duration,
  per-track codec/dimensions, and stsc/stco/stsz-resolved sample byte
  ranges, so :func:`sample_frames` fingerprints REAL video samples
  (``ok='headers'``; no frame decode).
* **AAC**: ADTS frame-header walk in :mod:`.adts` — real profile /
  sample rate / channels / duration / bitrate shape (``ok='headers'``).
* **WebM/MKV**: EBML/Matroska structure walk in :mod:`.webm` — doctype,
  duration, per-track codec/dimensions/audio params, and Cluster
  SimpleBlock/Block frame byte ranges, so :func:`sample_frames`
  fingerprints REAL WebM frame data too (``ok='headers'``).
* **FLAC**: STREAMINFO parse in :mod:`.flac` — sample rate / channels /
  bit depth / duration (``ok='headers'``).
* **Ogg**: RFC 3533 page walk + Vorbis/Opus/Theora identification
  headers in :mod:`.ogg` — channels/rate/duration for audio,
  dimensions/fps for Theora video (``ok='headers'``).
* **WebP**: RIFF chunk walk (:func:`parse_webp_header`) — real
  dimensions + alpha flag from VP8 /VP8L/VP8X headers (pixels need a
  VP8 entropy decoder; header-only by design).
* **AVIF/HEIF**: ISO-BMFF meta/iprp/ipco walk
  (:func:`.mp4.parse_avif_header`) — real dimensions from ``ispe`` and
  channels from ``pixi`` (pixels need AV1/HEVC; header-only).
* anything else falls back to the deterministic fake decoder, keeping the
  Spark-side contract (schemas, batch shapes, partitioning, null/corrupt
  handling) uniform; remaining pixel decoders (webp/AVIF/HEIC)
  would slot in beside :func:`decode_png` as one-function changes.
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
    """Real PIXEL decode hook — PNG (:func:`decode_png`), baseline JPEG
    (:mod:`.jpeg`) and GIF (:mod:`.gif`) handled natively; returns None for
    formats that would need an external codec (webp, AVIF &c), which
    callers route to the deterministic fake decoder."""
    pixels = decode_png(payload)
    if pixels is None:
        from .jpeg import decode_jpeg

        pixels = decode_jpeg(payload)
    if pixels is None:
        from .gif import decode_gif

        pixels = decode_gif(payload)
    if pixels is None:
        pixels = decode_bmp(payload)
    return pixels


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


def _find_riff_chunk(payload: bytes, chunk_id: bytes):
    """Walk RIFF sub-chunks (word-aligned) -> (offset, length) of the first
    ``chunk_id`` chunk's data, or None. Real encoders put LIST/INFO chunks
    before 'fmt ', so fixed offsets are wrong on valid files."""
    pos = 12
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        ln = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if cid == chunk_id:
            return pos + 8, ln
        pos += 8 + ln + (ln & 1)
    return None


def _parse_wav_fmt(payload: bytes):
    """-> (audio_format, n_channels, sample_rate, bits) from the 'fmt '
    chunk found by chunk walk, or None."""
    if len(payload) < 36 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    loc = _find_riff_chunk(payload, b"fmt ")
    if loc is None or loc[1] < 16 or loc[0] + 16 > len(payload):
        return None
    off = loc[0]
    audio_format = int.from_bytes(payload[off : off + 2], "little")
    n_channels = int.from_bytes(payload[off + 2 : off + 4], "little")
    sample_rate = int.from_bytes(payload[off + 4 : off + 8], "little")
    bits = int.from_bytes(payload[off + 14 : off + 16], "little")
    if n_channels == 0 or sample_rate == 0:
        return None
    return audio_format, n_channels, sample_rate, bits


def parse_wav_header(payload: bytes):
    """Pure-Python RIFF/WAVE fmt-chunk parse ->
    (n_channels, sample_rate, bits_per_sample) or None. The 'fmt ' chunk is
    located by the same chunk walk as 'data' (it need not sit at offset 12)."""
    fmt = _parse_wav_fmt(payload)
    if fmt is None:
        return None
    return fmt[1], fmt[2], fmt[3]


def parse_bmp_header(payload: bytes):
    """-> (width, height, n_channels) for an uncompressed 24/32-bit BMP."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bits = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if width <= 0 or height == 0 or compression != 0 or bits not in (24, 32):
        return None
    return width, abs(height), 3 if bits == 24 else 4


def parse_webp_header(payload: bytes):
    """-> (width, height, n_channels) for a WebP container, else None.

    Real RIFF chunk walk over the public WebP layout: lossy "VP8 "
    keyframes (0x9D012A start code, 14-bit dims), lossless "VP8L"
    (0x2F signature, packed 14-bit dims + alpha bit), and extended
    "VP8X" (24-bit canvas dims + alpha flag). Pixel decode needs a VP8
    entropy decoder, so this is header-only by design."""
    if len(payload) < 20 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    pos = 12
    n = len(payload)
    while pos + 8 <= n:
        fourcc = payload[pos : pos + 4]
        ln = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = pos + 8
        if fourcc == b"VP8 " and body + 10 <= n:
            if payload[body + 3 : body + 6] != b"\x9d\x01\x2a":
                return None  # not a keyframe: dims unavailable
            w = int.from_bytes(payload[body + 6 : body + 8], "little") & 0x3FFF
            h = int.from_bytes(payload[body + 8 : body + 10], "little") & 0x3FFF
            return (w, h, 3) if w and h else None
        if fourcc == b"VP8L" and body + 5 <= n:
            if payload[body] != 0x2F:
                return None
            bits = int.from_bytes(payload[body + 1 : body + 5], "little")
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            alpha = (bits >> 28) & 1
            return (w, h, 4 if alpha else 3)
        if fourcc == b"VP8X" and body + 10 <= n:
            alpha = payload[body] & 0x10
            w = int.from_bytes(payload[body + 4 : body + 7], "little") + 1
            h = int.from_bytes(payload[body + 7 : body + 10], "little") + 1
            return (w, h, 4 if alpha else 3)
        pos = body + ln + (ln & 1)
    return None


def decode_bmp(payload: bytes):
    """Uncompressed 24/32-bit BMP -> uint8 ndarray (h, w, c), RGB(A) order.

    Rows are 4-byte aligned and stored bottom-up unless height is negative
    (top-down); channel order in the file is BGR(A)."""
    hdr = parse_bmp_header(payload)
    if hdr is None:
        return None
    width, height, channels = hdr
    raw_height = int.from_bytes(payload[22:26], "little", signed=True)
    offset = int.from_bytes(payload[10:14], "little")
    stride = (width * channels + 3) & ~3  # 4-byte row alignment
    if offset + stride * height > len(payload):
        return None
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=offset
    ).reshape(height, stride)[:, : width * channels]
    img = rows.reshape(height, width, channels)
    if raw_height > 0:  # bottom-up storage
        img = img[::-1]
    # BGR(A) -> RGB(A)
    return np.ascontiguousarray(img[:, :, [2, 1, 0] + ([3] if channels == 4 else [])])


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


#: decode_png declines images above this many SAMPLES (width*height*channels)
#: — bounds worst-case CPU of the sequential Average/Paeth unfilter loops
#: inside a worker task (a 16 MP RGBA image is ~67M samples; tune per
#: deployment). The cap is a contract, not a truncation: oversize images
#: return None and route to the header-only/fake path.
PNG_MAX_SAMPLES = 1 << 26


def decode_png(payload: bytes, max_samples: int = PNG_MAX_SAMPLES):
    """Full stdlib PNG pixel decode -> uint8 ndarray (h, w, channels), or
    None if the payload isn't a PNG this decoder handles (8-bit depth,
    non-interlaced, gray/RGB/gray+alpha/RGBA, <= ``max_samples`` samples).

    Chunk walk per the PNG spec, zlib inflate of the concatenated IDAT
    stream, then scanline unfiltering (filters 0-4). Filters 0/2 are pure
    numpy; Sub (1) is a per-lane byte cumsum (vectorized — the additive
    recurrence mod 256 is a prefix sum over each bpp-strided lane); Average
    (3) and Paeth (4) carry a genuine nonlinear sequential dependency along
    the scanline and run as native-int list loops (measured ~8x faster than
    numpy scalar indexing), bounded by ``max_samples``.
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
    if width * height * channels > max_samples:
        return None  # documented size contract (see PNG_MAX_SAMPLES)
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = width * channels
    if len(raw) != height * (stride + 1):
        return None
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    bpp = channels
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw[row_start + 1 : row_start + 1 + stride], dtype=np.uint8
        ).astype(np.int64)
        if ftype == 0:  # None
            recon = line
        elif ftype == 1:  # Sub: per-lane prefix sum mod 256
            recon = (line.reshape(-1, bpp).cumsum(axis=0) & 0xFF).reshape(-1)
        elif ftype == 2:  # Up
            recon = (line + prev) & 0xFF
        elif ftype == 3:  # Average — sequential; native-int loop
            rl = line.tolist()
            pv = prev.tolist()
            for x in range(stride):
                left = rl[x - bpp] if x >= bpp else 0
                rl[x] = (rl[x] + ((left + pv[x]) >> 1)) & 0xFF
            recon = np.asarray(rl, dtype=np.int64)
        elif ftype == 4:  # Paeth — sequential; native-int loop
            rl = line.tolist()
            pv = prev.tolist()
            for x in range(stride):
                left = rl[x - bpp] if x >= bpp else 0
                ul = pv[x - bpp] if x >= bpp else 0
                up = pv[x]
                p = left + up - ul
                pa = p - left if p >= left else left - p
                pb = p - up if p >= up else up - p
                pc = p - ul if p >= ul else ul - p
                if pa <= pb and pa <= pc:
                    pred = left
                elif pb <= pc:
                    pred = up
                else:
                    pred = ul
                rl[x] = (rl[x] + pred) & 0xFF
            recon = np.asarray(rl, dtype=np.int64)
        else:
            return None
        out[y] = recon.astype(np.uint8)
        prev = recon
    return out.reshape(height, width, channels)


_G711_CACHE: dict = {}


def _mulaw_lut() -> np.ndarray:
    """G.711 mu-law byte -> linear int16 lookup (ITU-T G.711 decoding)."""
    if "mu" not in _G711_CACHE:
        u = ~np.arange(256, dtype=np.int32) & 0xFF
        sign = u & 0x80
        exp = (u >> 4) & 0x07
        mant = u & 0x0F
        mag = (((mant << 3) + 0x84) << exp) - 0x84
        _G711_CACHE["mu"] = np.where(sign, -mag, mag).astype(np.int16)
    return _G711_CACHE["mu"]


def _alaw_lut() -> np.ndarray:
    """G.711 A-law byte -> linear int16 lookup."""
    if "a" not in _G711_CACHE:
        a = np.arange(256, dtype=np.int32) ^ 0x55
        sign = a & 0x80
        exp = (a >> 4) & 0x07
        mant = a & 0x0F
        mag = np.where(
            exp > 0, ((mant << 4) + 0x108) << (exp - 1), (mant << 4) + 8
        )
        # A-law sign sense is inverted vs mu-law: xored sign bit SET = positive
        _G711_CACHE["a"] = np.where(sign, mag, -mag).astype(np.int16)
    return _G711_CACHE["a"]


def decode_wav(payload: bytes):
    """Stdlib WAV decode -> (sample_rate, int16 ndarray (n, channels)), or
    None for formats outside scope. Walks the RIFF chunks to the 'data'
    chunk; handles integer PCM (16-bit signed / 8-bit unsigned), G.711
    A-law / mu-law companded telephony audio (format tags 6/7, LUT
    expansion to linear int16), and IEEE float32 (tag 3, scaled and
    clipped to int16)."""
    fmt = _parse_wav_fmt(payload)
    if fmt is None:
        return None
    audio_format, n_channels, sample_rate, bits = fmt
    if audio_format == 1 and bits in (8, 16):
        pass
    elif audio_format in (6, 7) and bits == 8:  # G.711 A-law / mu-law
        pass
    elif audio_format == 3 and bits == 32:  # IEEE float
        pass
    else:
        return None
    loc = _find_riff_chunk(payload, b"data")
    if loc is None:
        return None
    data = payload[loc[0] : loc[0] + loc[1]]
    if audio_format in (6, 7):
        lut = _alaw_lut() if audio_format == 6 else _mulaw_lut()
        samples = lut[np.frombuffer(data, dtype=np.uint8)]
        n = (len(samples) // n_channels) * n_channels
        return sample_rate, samples[:n].reshape(-1, n_channels)
    if audio_format == 3:
        f = np.frombuffer(data[: len(data) - (len(data) % 4)], dtype="<f4")
        samples = np.clip(
            np.round(f.astype(np.float64) * 32767.0), -32768, 32767
        ).astype(np.int16)
        n = (len(samples) // n_channels) * n_channels
        return sample_rate, samples[:n].reshape(-1, n_channels)
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


def _size_profile_features(sample_sizes: list) -> np.ndarray:
    """N_FEATURES-dim stream profile: mean sample/frame byte size over
    equal windows, normalized by the stream's max — the header-derived
    bitrate-shape analog of :func:`_mp3_bitrate_features`, shared by the
    MP4 video and ADTS audio paths."""
    sz = np.asarray(sample_sizes, dtype=np.float64)
    peak = sz.max() if len(sz) else 1.0
    bounds = np.linspace(0, len(sz), N_FEATURES + 1).astype(int)
    feats = [
        float(sz[a:b].mean()) / peak if b > a else 0.0
        for a, b in zip(bounds[:-1], bounds[1:])
    ]
    return np.asarray(feats, dtype=np.float32)


def decode_media(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """binary payloads -> typed decode results (Arrow-batched)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .gif import parse_gif_header
        from .jpeg import parse_jpeg_header
        from .mp4 import parse_avif_header, parse_mp4
        from .ogg import parse_ogg
        from .webm import parse_webm

        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if payload is None:
                    rows.append((mid, None, None, None, "null", None))
                    continue
                payload = bytes(payload)
                if len(payload) < 8:  # corrupt-input contract
                    rows.append((mid, None, None, None, "corrupt", None))
                    continue
                if kind == "video":
                    info = parse_mp4(payload)
                    vt = next(
                        (t for t in info.tracks if t.handler == "vide"),
                        None,
                    ) if info is not None else None
                    if vt is not None:
                        sizes = [s for _, s in vt.sample_ranges]
                        feats = _size_profile_features(sizes)
                        rows.append(
                            (
                                mid,
                                vt.width,
                                vt.height,
                                (vt.depth or 24) // 8,
                                "headers",
                                feats.tolist(),
                            )
                        )
                        continue
                    winfo = parse_webm(payload)
                    wt = next(
                        (t for t in winfo.tracks if t.kind == "video"),
                        None,
                    ) if winfo is not None else None
                    if wt is not None:
                        sizes = [s for _, s in wt.block_ranges]
                        feats = _size_profile_features(sizes)
                        rows.append(
                            (
                                mid,
                                wt.width,
                                wt.height,
                                None,  # channel count unknowable pre-decode
                                "headers",
                                feats.tolist(),
                            )
                        )
                        continue
                    oinfo = parse_ogg(payload)
                    ot = next(
                        (t for t in oinfo.streams if t.kind == "video"),
                        None,
                    ) if oinfo is not None else None
                    if ot is not None:
                        feats = _size_profile_features(ot.page_sizes)
                        rows.append(
                            (
                                mid,
                                ot.width,
                                ot.height,
                                None,
                                "headers",
                                feats.tolist(),
                            )
                        )
                        continue
                # image decoders run only on image rows (audio/video payloads
                # can't be PNG/JPEG; skipping them saves the signature walks)
                pixels = _decode_image_real(payload) if kind == "image" else None
                if pixels is not None:  # real pixel decode
                    h, w, c = pixels.shape
                    feats = image_features(pixels)
                else:
                    w, h, c, feats = _fake_decode(payload)
                    if kind == "image":
                        hdr = (
                            parse_png_header(payload)
                            or parse_jpeg_header(payload)
                            or parse_gif_header(payload)
                            or parse_bmp_header(payload)
                            or parse_webp_header(payload)
                            or parse_avif_header(payload)
                        )
                        if hdr is not None:  # header-only (odd PNG palettes)
                            w, h, c = hdr
                rows.append((mid, w, h, c, "ok", feats.tolist()))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_channels", "ok", "features"],
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        gen, DECODED_SCHEMA
    )


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


def _mp3_bitrate_features(frame_bitrates: list) -> np.ndarray:
    """N_FEATURES-dim VBR profile: mean frame bitrate over equal frame
    windows, normalized by the 320 kbps format ceiling — the honest
    header-derived stand-in for RMS when no PCM is synthesized."""
    br = np.asarray(frame_bitrates, dtype=np.float64)
    bounds = np.linspace(0, len(br), N_FEATURES + 1).astype(int)
    feats = [
        float(br[a:b].mean()) / 320.0 if b > a else 0.0
        for a, b in zip(bounds[:-1], bounds[1:])
    ]
    return np.asarray(feats, dtype=np.float32)


def decode_audio(media: DataFrame) -> DataFrame:
    """audio binary payloads -> PCM metadata + windowed-RMS features.

    Real WAV decode (:func:`decode_wav`). MP3 (:func:`.mp3.parse_mp3`),
    ADTS AAC (:func:`.adts.parse_adts`), FLAC (:func:`.flac.parse_flac`)
    and Ogg Vorbis/Opus (:func:`.ogg.parse_ogg`) route through their
    header walks — no audio synthesis, so those rows report
    ``ok='headers'`` with real sample_rate / channel / sample counts and
    a bitrate-shape feature vector instead of RMS (zeros for FLAC, whose
    frame sizes would need a frame walk). Everything else reports
    'corrupt'. WAV features: RMS amplitude over
    N_FEATURES equal time windows of the channel-mean signal, normalized
    to [0, 1]."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .adts import parse_adts
        from .flac import parse_flac
        from .mp3 import parse_mp3
        from .ogg import parse_ogg

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((mid, None, None, None, "null", None))
                    continue
                decoded = decode_wav(bytes(payload))
                if decoded is None:
                    info = parse_mp3(bytes(payload))
                    if info is not None:
                        rows.append(
                            (
                                mid,
                                int(info.sample_rate),
                                int(info.n_channels),
                                int(info.n_samples),
                                "headers",
                                _mp3_bitrate_features(info.frame_bitrates).tolist(),
                            )
                        )
                        continue
                    aac = parse_adts(bytes(payload))
                    if aac is not None:
                        rows.append(
                            (
                                mid,
                                int(aac.sample_rate),
                                int(aac.n_channels),
                                int(aac.n_samples),
                                "headers",
                                _size_profile_features(aac.frame_sizes).tolist(),
                            )
                        )
                        continue
                    flac = parse_flac(bytes(payload))
                    if flac is not None:
                        rows.append(
                            (
                                mid,
                                int(flac.sample_rate),
                                int(flac.n_channels),
                                int(flac.n_samples),
                                "headers",
                                # frame sizes need a frame walk: honest zeros
                                [0.0] * N_FEATURES,
                            )
                        )
                        continue
                    ogg = parse_ogg(bytes(payload))
                    oa = next(
                        (t for t in ogg.streams if t.kind == "audio"), None
                    ) if ogg is not None else None
                    if oa is not None:
                        n_samp = max(0, oa.last_granule - oa.pre_skip)
                        rows.append(
                            (
                                mid,
                                int(oa.sample_rate),
                                int(oa.n_channels),
                                int(n_samp),
                                "headers",
                                _size_profile_features(oa.page_sizes).tolist(),
                            )
                        )
                        continue
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

    MP4 and WebM payloads sample REAL video frame data: the ISO-BMFF
    walk (:func:`.mp4.parse_mp4`) resolves stsc/stco/stsz to per-sample
    byte ranges and the EBML walk (:func:`.webm.parse_webm`) resolves
    Cluster SimpleBlock/Block ranges; every ``every_n``-th range's actual
    bytes are fingerprinted, with ``frame_no`` the stream index — exactly
    the rows an ffmpeg-backed sampler would emit (minus pixel decode).
    Everything else keeps the deterministic fake fingerprints of payload
    slices, so the schema and fan-out shape (1 row in, <=max_frames rows
    out) stay uniform.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .mp4 import parse_mp4
        from .ogg import parse_ogg
        from .webm import parse_webm

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                info = parse_mp4(payload) if len(payload) >= 16 else None
                vt = next(
                    (t for t in info.tracks if t.handler == "vide"), None
                ) if info is not None else None
                ranges = vt.sample_ranges if vt is not None else []
                if not ranges and len(payload) >= 16:
                    winfo = parse_webm(payload)
                    wt = next(
                        (t for t in winfo.tracks if t.kind == "video"),
                        None,
                    ) if winfo is not None else None
                    if wt is not None:
                        ranges = wt.block_ranges
                if ranges:
                    picked = ranges[:: max(every_n, 1)][:max_frames]
                    for i, (off, size) in zip(
                        range(0, len(ranges), max(every_n, 1)), picked
                    ):
                        chunk = payload[off : off + size]
                        rows.append((mid, i, hashlib.md5(chunk).hexdigest()))
                    continue
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
