"""FLAC STREAMINFO parse — metadata without audio synthesis.

Scope contract mirrors :func:`.mp3.parse_mp3`: parses the public FLAC
stream layout (the ``fLaC`` magic + METADATA_BLOCK chain, RFC 9639) and
reports the STREAMINFO fields — sample rate, channels, bit depth, total
samples, duration. Rice/LPC frame decode is out of scope.
"""

from __future__ import annotations

from typing import NamedTuple, Optional


class FlacInfo(NamedTuple):
    sample_rate: int
    n_channels: int
    bits_per_sample: int
    n_samples: int          # total inter-channel samples (0 = unknown)
    duration_s: float       # 0.0 when total samples unknown
    min_block: int
    max_block: int


def parse_flac(payload: bytes) -> Optional[FlacInfo]:
    data = bytes(payload)
    if len(data) < 4 + 4 + 34 or data[:4] != b"fLaC":
        return None
    pos = 4
    # STREAMINFO must be the first metadata block (spec requirement)
    header = data[pos]
    block_type = header & 0x7F
    length = int.from_bytes(data[pos + 1 : pos + 4], "big")
    if block_type != 0 or length < 34 or pos + 4 + length > len(data):
        return None
    b = data[pos + 4 : pos + 4 + 34]
    min_block = int.from_bytes(b[0:2], "big")
    max_block = int.from_bytes(b[2:4], "big")
    # bits 80..99 sample rate, 100..102 channels-1, 103..107 bps-1,
    # 108..143 total samples (big-endian bit packing)
    word = int.from_bytes(b[10:18], "big")
    sample_rate = (word >> 44) & 0xFFFFF
    channels = ((word >> 41) & 0x07) + 1
    bps = ((word >> 36) & 0x1F) + 1
    total = word & 0xFFFFFFFFF
    if sample_rate == 0 or min_block < 16:
        return None  # invalid per spec
    return FlacInfo(
        sample_rate=sample_rate,
        n_channels=channels,
        bits_per_sample=bps,
        n_samples=total,
        duration_s=round(total / sample_rate, 6) if total else 0.0,
        min_block=min_block,
        max_block=max_block,
    )
