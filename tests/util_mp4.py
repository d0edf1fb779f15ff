"""Minimal ISO-BMFF (MP4) forward encoder for round-trip tests.

Independent of the decoder under test (`textops/mp4.py`): boxes are
constructed straight from the ISO/IEC 14496-12 layouts, so agreement is
evidence, not self-confirmation. Produces a ftyp + mdat + moov file with
one video (avc1) and optionally one audio (mp4a) track; video samples are
caller-supplied byte strings laid out across two chunks to exercise
stsc run handling.
"""

from __future__ import annotations

import struct


def box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def fullbox(btype: bytes, payload: bytes, version: int = 0) -> bytes:
    return box(btype, bytes([version, 0, 0, 0]) + payload)


def _matrix() -> bytes:
    # identity: 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
    return struct.pack(
        ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
    )


def mvhd(timescale: int, duration: int) -> bytes:
    body = struct.pack(">IIII", 0, 0, timescale, duration)
    body += struct.pack(">IHH", 0x10000, 0x0100, 0)  # rate, volume, reserved
    body += b"\x00" * 8 + _matrix() + b"\x00" * 24
    body += struct.pack(">I", 0xFFFFFFFF)  # next_track_ID
    return fullbox(b"mvhd", body)


def tkhd(track_id: int, duration: int, width: int, height: int) -> bytes:
    body = struct.pack(">IIIII", 0, 0, track_id, 0, duration)
    body += b"\x00" * 8
    body += struct.pack(">HHHH", 0, 0, 0, 0)  # layer, alt, volume, reserved
    body += _matrix()
    body += struct.pack(">II", width << 16, height << 16)
    return fullbox(b"tkhd", body)


def mdhd(timescale: int, duration: int, lang: str = "und") -> bytes:
    packed = 0
    for c in lang:
        packed = (packed << 5) | (ord(c) - 0x60)
    body = struct.pack(">IIII", 0, 0, timescale, duration)
    body += struct.pack(">HH", packed, 0)
    return fullbox(b"mdhd", body)


def hdlr(handler: bytes, name: bytes = b"h\x00") -> bytes:
    return fullbox(b"hdlr", b"\x00" * 4 + handler + b"\x00" * 12 + name)


def visual_sample_entry(
    codec: bytes, width: int, height: int, depth: int = 24
) -> bytes:
    body = b"\x00" * 6 + struct.pack(">H", 1)  # reserved, data_ref_index
    body += b"\x00" * 16  # predefined/reserved block
    body += struct.pack(">HH", width, height)
    body += struct.pack(">IIIH", 0x480000, 0x480000, 0, 1)  # res, frames
    body += b"\x00" * 32  # compressorname
    body += struct.pack(">Hh", depth, -1)
    return box(codec, body)


def audio_sample_entry(
    codec: bytes, channels: int, sample_rate: int
) -> bytes:
    body = b"\x00" * 6 + struct.pack(">H", 1)
    body += b"\x00" * 8  # reserved
    body += struct.pack(">HHI", channels, 16, 0)
    body += struct.pack(">I", sample_rate << 16)
    return box(codec, body)


def stsd(entry: bytes) -> bytes:
    return fullbox(b"stsd", struct.pack(">I", 1) + entry)


def stts(n_samples: int, delta: int) -> bytes:
    return fullbox(b"stts", struct.pack(">III", 1, n_samples, delta))


def stsc(runs) -> bytes:
    body = struct.pack(">I", len(runs))
    for first_chunk, per_chunk in runs:
        body += struct.pack(">III", first_chunk, per_chunk, 1)
    return fullbox(b"stsc", body)


def stsz(sizes) -> bytes:
    body = struct.pack(">II", 0, len(sizes))
    body += struct.pack(">%dI" % len(sizes), *sizes)
    return fullbox(b"stsz", body)


def stco(offsets, wide: bool = False) -> bytes:
    fmt = "Q" if wide else "I"
    body = struct.pack(">I", len(offsets))
    body += struct.pack(">%d%s" % (len(offsets), fmt), *offsets)
    return fullbox(b"co64" if wide else b"stco", body)


def build_mp4(
    samples,
    width: int = 320,
    height: int = 240,
    timescale: int = 1000,
    sample_delta: int = 40,
    audio: bool = False,
    lang: str = "eng",
    wide_offsets: bool = False,
    brand: bytes = b"isom",
) -> tuple:
    """Returns (payload, [(offset, size)] of the video samples).

    Video samples land in two chunks (ceil(n/2) then the rest) so the
    stsc run table has two entries with different samples_per_chunk.
    """
    samples = [bytes(s) for s in samples]
    n = len(samples)
    ftyp = box(b"ftyp", brand + struct.pack(">I", 0) + b"isomiso2")
    mdat_body = b"".join(samples)
    mdat = box(b"mdat", mdat_body)
    base = len(ftyp) + 8  # offset of mdat body in the file
    sizes = [len(s) for s in samples]
    n1 = (n + 1) // 2
    offsets = []
    off = base
    for s in sizes:
        offsets.append(off)
        off += s
    chunk_offsets = [offsets[0]] + ([offsets[n1]] if n > n1 else [])
    runs = [(1, n1)] + ([(2, n - n1)] if n > n1 else [])
    duration = n * sample_delta

    vstbl = box(
        b"stbl",
        stsd(visual_sample_entry(b"avc1", width, height))
        + stts(n, sample_delta)
        + stsc(runs)
        + stsz(sizes)
        + stco(chunk_offsets, wide=wide_offsets),
    )
    vminf = box(b"minf", vstbl)
    vmdia = box(
        b"mdia", mdhd(timescale, duration, lang) + hdlr(b"vide") + vminf
    )
    vtrak = box(b"trak", tkhd(1, duration, width, height) + vmdia)

    traks = vtrak
    if audio:
        astbl = box(
            b"stbl",
            stsd(audio_sample_entry(b"mp4a", 2, 44100))
            + stts(0, 0)
            + stsc([])
            + stsz([])
            + stco([]),
        )
        aminf = box(b"minf", astbl)
        amdia = box(
            b"mdia", mdhd(44100, 44100 * 2, lang) + hdlr(b"soun") + aminf
        )
        traks += box(b"trak", tkhd(2, duration, 0, 0) + amdia)

    moov = box(b"moov", mvhd(timescale, duration) + traks)
    return ftyp + mdat + moov, list(zip(offsets, sizes))
