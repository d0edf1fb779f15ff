"""FLAC STREAMINFO + Ogg page-walk round-trips, forward-constructed."""

import numpy as np
import pytest

from security_log_analysis_rust_spark.textops.flac import parse_flac
from security_log_analysis_rust_spark.textops.ogg import parse_ogg


def build_flac(
    sample_rate=44100, channels=2, bps=16, total=441000,
    min_block=4096, max_block=4096,
):
    word = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bps - 1) << 36)
        | total
    )
    streaminfo = (
        min_block.to_bytes(2, "big")
        + max_block.to_bytes(2, "big")
        + b"\x00" * 6  # min/max framesize unknown
        + word.to_bytes(8, "big")
        + b"\x00" * 16  # md5
    )
    return b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo


def ogg_page(serial, granule, packets, seq=0, header_type=0):
    body = b"".join(packets)
    table = bytearray()
    for p in packets:
        n = len(p)
        while n >= 255:
            table.append(255)
            n -= 255
        table.append(n)
    return (
        b"OggS\x00"
        + bytes([header_type])
        + granule.to_bytes(8, "little", signed=True)
        + serial.to_bytes(4, "little")
        + seq.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"  # checksum unchecked by the walk
        + bytes([len(table)])
        + bytes(table)
        + body
    )


def vorbis_ident(channels=2, rate=44100):
    return (
        b"\x01vorbis" + (0).to_bytes(4, "little")
        + bytes([channels]) + rate.to_bytes(4, "little")
        + b"\x00" * 12 + b"\x01"
    )


def opus_head(channels=2, pre_skip=312, input_rate=48000):
    return (
        b"OpusHead\x01" + bytes([channels])
        + pre_skip.to_bytes(2, "little")
        + input_rate.to_bytes(4, "little") + b"\x00\x00\x00"
    )


def theora_ident(picw=640, pich=360, frn=30, frd=1):
    return (
        b"\x80theora\x03\x02\x01"
        + (picw // 16).to_bytes(2, "big") + (pich // 16).to_bytes(2, "big")
        + picw.to_bytes(3, "big") + pich.to_bytes(3, "big")
        + b"\x00\x00"
        + frn.to_bytes(4, "big") + frd.to_bytes(4, "big")
        + b"\x00" * 8
    )


def test_flac_roundtrip():
    info = parse_flac(build_flac())
    assert info is not None
    assert info.sample_rate == 44100
    assert info.n_channels == 2
    assert info.bits_per_sample == 16
    assert info.n_samples == 441000
    assert info.duration_s == pytest.approx(10.0)


def test_flac_rejects():
    assert parse_flac(b"") is None
    assert parse_flac(b"fLaCxx") is None
    assert parse_flac(b"fLaC" + bytes([4]) + b"\x00\x00\x22" + b"\x00" * 34) is None
    rng = np.random.default_rng(3)
    assert parse_flac(rng.integers(0, 255, 128, dtype=np.uint8).tobytes()) is None
    # 96 kHz / 24-bit / mono edge values survive the bit packing
    hi = parse_flac(build_flac(sample_rate=96000, channels=1, bps=24, total=1))
    assert (hi.sample_rate, hi.n_channels, hi.bits_per_sample) == (96000, 1, 24)


def test_ogg_vorbis_duration_and_pages():
    pages = (
        ogg_page(7, 0, [vorbis_ident()], seq=0, header_type=2)
        + ogg_page(7, 0, [b"\x03vorbis-comment", b"\x05vorbis-setup"], seq=1)
        + ogg_page(7, 22050, [b"\xaa" * 300], seq=2)
        + ogg_page(7, 44100, [b"\xbb" * 100], seq=3, header_type=4)
    )
    info = parse_ogg(pages)
    assert info is not None and info.n_streams == 1
    s = info.streams[0]
    assert s.codec == "vorbis" and s.kind == "audio"
    assert s.n_channels == 2 and s.sample_rate == 44100
    assert s.last_granule == 44100
    assert s.duration_s == pytest.approx(1.0)
    assert len(s.page_sizes) == 4 and s.page_sizes[2] == 300


def test_ogg_opus_preskip_granule_clock():
    pages = (
        ogg_page(9, 0, [opus_head(pre_skip=312)], header_type=2)
        + ogg_page(9, 48000 + 312, [b"\xcc" * 50], seq=1, header_type=4)
    )
    s = parse_ogg(pages).streams[0]
    assert s.codec == "opus"
    assert s.sample_rate == 48000  # granule clock, not input rate
    assert s.duration_s == pytest.approx(1.0)


def test_ogg_theora_video_stream_multiplexed():
    pages = (
        ogg_page(1, 0, [theora_ident(640, 360, 30, 1)], header_type=2)
        + ogg_page(2, 0, [vorbis_ident(1, 8000)], header_type=2)
        + ogg_page(1, 100, [b"\xdd" * 80], seq=1)
        + ogg_page(2, 16000, [b"\xee" * 40], seq=1)
    )
    info = parse_ogg(pages)
    assert info.n_streams == 2
    video = next(s for s in info.streams if s.kind == "video")
    assert video.codec == "theora"
    assert (video.width, video.height) == (640, 360)
    assert video.fps == pytest.approx(30.0)
    audio = next(s for s in info.streams if s.kind == "audio")
    assert audio.duration_s == pytest.approx(2.0)


def test_ogg_long_packet_lacing():
    # a 600-byte packet needs lacing values 255,255,90
    pages = (
        ogg_page(5, 0, [vorbis_ident()], header_type=2)
        + ogg_page(5, 4410, [b"\xab" * 600], seq=1)
    )
    s = parse_ogg(pages).streams[0]
    assert s.page_sizes[1] == 600


def test_ogg_rejects_and_truncation():
    assert parse_ogg(b"") is None
    assert parse_ogg(b"OggX" + b"\x00" * 60) is None
    rng = np.random.default_rng(4)
    assert parse_ogg(rng.integers(0, 255, 256, dtype=np.uint8).tobytes()) is None
    good = ogg_page(7, 0, [vorbis_ident()], header_type=2) + ogg_page(
        7, 44100, [b"\xaa" * 200], seq=1
    )
    cut = parse_ogg(good[: len(good) - 50])  # truncated final page
    assert cut is not None and cut.streams[0].page_sizes[1] == 150
