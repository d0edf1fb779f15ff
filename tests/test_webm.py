"""EBML/Matroska parser round-trips against a forward element builder.

The builder writes RFC 8794 VINTs and Matroska elements straight from
the public spec layouts — independent of the parser under test."""

import struct

import numpy as np
import pytest

from security_log_analysis_rust_spark.textops.webm import parse_webm


def vint_size(n):
    """Encode n as a minimal-width EBML size VINT."""
    for width in range(1, 9):
        if n < (1 << (7 * width)) - 1:
            marker = 1 << (8 - width)
            b = bytearray(n.to_bytes(width, "big"))
            b[0] |= marker
            return bytes(b)
    raise ValueError(n)


def elem(eid_bytes, payload):
    return eid_bytes + vint_size(len(payload)) + payload


def uint(n):
    length = max(1, (n.bit_length() + 7) // 8)
    return n.to_bytes(length, "big")


def simple_block(track_number, frame_data, rel_ts=0):
    body = vint_size(track_number) + rel_ts.to_bytes(2, "big") + b"\x80" + frame_data
    return elem(b"\xa3", body)


def build_webm(
    doctype=b"webm",
    duration_ticks=12345.0,
    timescale=1_000_000,
    video=("V_VP9", 1280, 720),
    audio=("A_OPUS", 2, 48000.0),
    unknown_segment_size=False,
    video_frames=(),
):
    head = elem(
        b"\x1a\x45\xdf\xa3",
        elem(b"\x42\x86", uint(1))          # EBMLVersion
        + elem(b"\x42\x82", doctype)        # DocType
        + elem(b"\x42\x87", uint(4)),       # DocTypeVersion
    )
    info = elem(
        b"\x15\x49\xa9\x66",
        elem(b"\x2a\xd7\xb1", uint(timescale))
        + elem(b"\x44\x89", struct.pack(">d", duration_ticks)),
    )
    entries = b""
    if video:
        codec, w, h = video
        entries += elem(
            b"\xae",
            elem(b"\xd7", uint(1))
            + elem(b"\x83", uint(1))  # TrackType video
            + elem(b"\x86", codec.encode())
            + elem(b"\xe0", elem(b"\xb0", uint(w)) + elem(b"\xba", uint(h))),
        )
    if audio:
        codec, ch, rate = audio
        entries += elem(
            b"\xae",
            elem(b"\xd7", uint(2))
            + elem(b"\x83", uint(2))  # TrackType audio
            + elem(b"\x86", codec.encode())
            + elem(
                b"\xe1",
                elem(b"\xb5", struct.pack(">f", rate))
                + elem(b"\x9f", uint(ch)),
            ),
        )
    tracks = elem(b"\x16\x54\xae\x6b", entries)
    clusters = b""
    if video_frames:
        blocks = b"".join(
            simple_block(1, f, rel_ts=i) for i, f in enumerate(video_frames)
        )
        clusters = elem(b"\x1f\x43\xb6\x75", elem(b"\xe7", uint(0)) + blocks)
    body = info + tracks + clusters
    if unknown_segment_size:
        segment = b"\x18\x53\x80\x67" + b"\xff" + body
    else:
        segment = elem(b"\x18\x53\x80\x67", body)
    return head + segment


def test_roundtrip_two_tracks():
    info = parse_webm(build_webm())
    assert info is not None
    assert info.doctype == "webm"
    assert info.timescale_ns == 1_000_000
    assert info.duration_s == pytest.approx(12.345)
    assert info.n_tracks == 2
    video = next(t for t in info.tracks if t.kind == "video")
    assert video.codec == "V_VP9"
    assert (video.width, video.height) == (1280, 720)
    audio = next(t for t in info.tracks if t.kind == "audio")
    assert audio.codec == "A_OPUS"
    assert audio.n_channels == 2
    assert audio.sample_rate == pytest.approx(48000.0)


def test_unknown_segment_size_streams():
    # live-captured webm commonly writes an unknown-size Segment
    info = parse_webm(build_webm(unknown_segment_size=True))
    assert info is not None and info.n_tracks == 2


def test_custom_timescale_scales_duration():
    info = parse_webm(
        build_webm(duration_ticks=500.0, timescale=1_000_000_000)
    )
    assert info.duration_s == pytest.approx(500.0)


def test_mkv_doctype_and_video_only():
    info = parse_webm(build_webm(doctype=b"matroska", audio=None))
    assert info.doctype == "matroska"
    assert info.n_tracks == 1 and info.tracks[0].kind == "video"


def test_rejects_non_ebml():
    assert parse_webm(b"") is None
    assert parse_webm(b"\x00\x00\x00\x18ftypisom" + b"\x00" * 64) is None
    rng = np.random.default_rng(2)
    assert parse_webm(rng.integers(0, 255, 256, dtype=np.uint8).tobytes()) is None
    # EBML head alone (no Segment) is not a positive identification
    head_only = build_webm()[:30]
    assert parse_webm(head_only) is None


def test_truncated_tracks_do_not_crash():
    payload = build_webm()
    for cut in (20, 40, 60, len(payload) - 10):
        parse_webm(payload[:cut])  # must not raise


def test_cluster_block_ranges_address_real_frame_bytes():
    frames = [bytes([65 + i]) * (10 + 5 * i) for i in range(4)]
    payload = build_webm(video_frames=frames)
    info = parse_webm(payload)
    video = next(t for t in info.tracks if t.kind == "video")
    assert len(video.block_ranges) == 4
    for (off, size), f in zip(video.block_ranges, frames):
        assert payload[off : off + size] == f
    # the audio track got no blocks
    audio = next(t for t in info.tracks if t.kind == "audio")
    assert audio.block_ranges == []
