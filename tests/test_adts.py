"""AAC ADTS header-walk round-trips against forward-constructed streams.

The builder packs headers straight from the ISO/IEC 14496-3 bit layout —
independent of the parser under test."""

import numpy as np
import pytest

from security_log_analysis_rust_spark.textops.adts import parse_adts


def build_adts(
    payload_sizes,
    sr_idx=4,
    channels=2,
    profile=1,
    mpeg2=0,
    id3=False,
    crc=False,
    junk_prefix=b"",
):
    out = bytearray(junk_prefix)
    if id3:
        out += b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"\x00" * 10
    for sz in payload_sizes:
        hdr_len = 9 if crc else 7
        flen = hdr_len + sz
        out += bytes(
            [
                0xFF,
                0xF0 | (mpeg2 << 3) | (0 if crc else 1),
                (profile << 6) | (sr_idx << 2) | (channels >> 2),
                ((channels & 3) << 6) | ((flen >> 11) & 3),
                (flen >> 3) & 0xFF,
                ((flen & 7) << 5) | 0x1F,
                0xFC,  # buffer fullness tail + (blocks-1) = 0
            ]
        )
        if crc:
            out += b"\x00\x00"
        out += bytes(sz)  # zeroed raw data (no false syncs)
    return bytes(out)


def test_roundtrip_basic():
    sizes = [100, 150, 80, 200, 120]
    info = parse_adts(build_adts(sizes))
    assert info is not None
    assert info.profile == "AAC LC"
    assert info.mpeg_version == 4
    assert info.sample_rate == 44100
    assert info.n_channels == 2
    assert info.n_frames == 5
    assert info.n_samples == 5 * 1024
    assert info.duration_s == pytest.approx(5 * 1024 / 44100, rel=1e-4)
    assert info.frame_sizes == [s + 7 for s in sizes]
    total = sum(info.frame_sizes)
    assert info.bitrate_kbps == pytest.approx(
        total * 8 / info.duration_s / 1000, rel=1e-3
    )


def test_id3_and_junk_prefix_skipped():
    stream = build_adts([64] * 3, id3=True, junk_prefix=b"\x00\x12junk!")
    info = parse_adts(stream)
    assert info is not None and info.n_frames == 3


def test_crc_protected_frames():
    info = parse_adts(build_adts([90] * 4, crc=True))
    assert info is not None
    assert info.n_frames == 4
    assert info.frame_sizes == [99] * 4  # 9-byte header + payload


def test_mpeg2_and_other_rates():
    info = parse_adts(build_adts([50] * 3, sr_idx=8, channels=1, mpeg2=1))
    assert info.sample_rate == 16000
    assert info.n_channels == 1
    assert info.mpeg_version == 2


def test_truncated_tail_counted_honestly():
    full = build_adts([100] * 4)
    cut = full[: len(full) - 50]  # cut inside the last frame's payload
    info = parse_adts(cut)
    assert info is not None
    assert info.n_frames == 4
    assert info.frame_sizes[-1] == 107 - 50


def test_rejects_non_adts():
    assert parse_adts(b"") is None
    assert parse_adts(b"RIFF0000WAVEfmt ") is None
    rng = np.random.default_rng(1)
    assert parse_adts(rng.integers(0, 255, 512, dtype=np.uint8).tobytes()) is None
    # a single valid frame with no chained successor is not enough
    assert parse_adts(build_adts([100])) is None
    # chained frames whose rate fields disagree break the chain rule
    two = bytearray(build_adts([60, 60]))
    two[7 + 60 + 2] = (1 << 6) | (9 << 2)  # second frame: different sr_idx
    assert parse_adts(bytes(two)) is None
