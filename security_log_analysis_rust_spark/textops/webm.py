"""EBML/Matroska (WebM/MKV) structure walk — metadata without frame decode.

Scope contract mirrors :func:`.mp4.parse_mp4`: parses the public EBML
framing (RFC 8794) and the Matroska/WebM element vocabulary — EBML head
DocType, Segment Info (TimestampScale, Duration) and Tracks (track type,
codec id, video dimensions, audio channels/rate) — and reports them as
typed metadata. It does NOT decode frames (VP8/VP9/AV1/Opus need external
codecs), so callers get honest header-derived features.

Reference parity note: the reference engine has no video path at all;
this belongs to the training-data-pipeline extension (WebM is the other
major web video container beside MP4).
"""

from __future__ import annotations

import struct
from typing import NamedTuple, Optional

_EBML_HEAD = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_AUDIO = 0xE1
_SAMPLING_FREQ = 0xB5
_CHANNELS = 0x9F
_CLUSTER = 0x1F43B675
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1

#: Matroska TrackType values (subset we label).
_TRACK_TYPES = {1: "video", 2: "audio", 17: "subtitle"}

_MAX_DEPTH = 8


class WebmTrack(NamedTuple):
    number: int
    kind: str               # 'video' | 'audio' | 'subtitle' | 'other'
    codec: str              # e.g. 'V_VP9', 'A_OPUS'
    width: Optional[int]
    height: Optional[int]
    n_channels: Optional[int]
    sample_rate: Optional[float]
    block_ranges: list      # [(offset, size)] of this track's frame data
                            # resolved from Cluster SimpleBlock/Block
                            # elements (empty when no clusters present)


class WebmInfo(NamedTuple):
    doctype: str            # 'webm' | 'matroska'
    timescale_ns: int       # TimestampScale (default 1,000,000)
    duration_s: float       # Duration * timescale, 0.0 when absent
    n_tracks: int
    tracks: list            # [WebmTrack]


def _read_vint(data: bytes, pos: int, keep_marker: bool):
    """RFC 8794 variable-size integer -> (value, n_bytes) or None.
    ``keep_marker`` retains the length-marker bit (element IDs);
    otherwise it is stripped (sizes). An all-ones size is 'unknown'
    and returned as None value with its width."""
    if pos >= len(data):
        return None
    first = data[pos]
    if first == 0:
        return None
    length = 8 - first.bit_length() + 1
    if pos + length > len(data):
        return None
    value = first if keep_marker else first & ((1 << (8 - length)) - 1)
    all_ones = value == (0 if keep_marker else (1 << (8 - length)) - 1)
    for b in data[pos + 1 : pos + length]:
        value = (value << 8) | b
        all_ones = all_ones and b == 0xFF
    if not keep_marker and all_ones:
        return ("unknown", length)
    return (value, length)


def _elements(data: bytes, start: int, end: int, depth: int = 0):
    """Yield (element_id, body_start, body_end) within [start, end)."""
    if depth > _MAX_DEPTH:
        return
    pos = start
    while pos < end:
        eid = _read_vint(data, pos, keep_marker=True)
        if eid is None:
            return
        pos += eid[1]
        size = _read_vint(data, pos, keep_marker=False)
        if size is None:
            return
        pos += size[1]
        body_end = end if size[0] == "unknown" else pos + size[0]
        if body_end > end or body_end < pos:
            return
        yield eid[0], pos, body_end
        pos = body_end


def _uint(data: bytes, a: int, b: int) -> int:
    v = 0
    for byte in data[a:b]:
        v = (v << 8) | byte
    return v


def _float(data: bytes, a: int, b: int) -> Optional[float]:
    if b - a == 4:
        return struct.unpack(">f", data[a:b])[0]
    if b - a == 8:
        return struct.unpack(">d", data[a:b])[0]
    return None


def _parse_track(data: bytes, a: int, b: int) -> Optional[WebmTrack]:
    number = 0
    ttype = 0
    codec = ""
    width = height = channels = None
    rate = None
    for eid, ea, eb in _elements(data, a, b, 3):
        if eid == _TRACK_NUMBER:
            number = _uint(data, ea, eb)
        elif eid == _TRACK_TYPE:
            ttype = _uint(data, ea, eb)
        elif eid == _CODEC_ID:
            codec = data[ea:eb].decode("latin-1").rstrip("\x00")
        elif eid == _VIDEO:
            for vid, va, vb in _elements(data, ea, eb, 4):
                if vid == _PIXEL_WIDTH:
                    width = _uint(data, va, vb) or None
                elif vid == _PIXEL_HEIGHT:
                    height = _uint(data, va, vb) or None
        elif eid == _AUDIO:
            for aid, aa, ab in _elements(data, ea, eb, 4):
                if aid == _SAMPLING_FREQ:
                    rate = _float(data, aa, ab)
                elif aid == _CHANNELS:
                    channels = _uint(data, aa, ab) or None
    if ttype == 0 and not codec:
        return None
    return WebmTrack(
        number=number,
        kind=_TRACK_TYPES.get(ttype, "other"),
        codec=codec,
        width=width,
        height=height,
        n_channels=channels,
        sample_rate=round(rate, 3) if rate else None,
        block_ranges=[],
    )


def _block_range(data: bytes, a: int, b: int):
    """(track_number, frame_offset, frame_size) for a (Simple)Block body:
    track VINT + 2-byte relative timestamp + 1 flags byte, then frame
    data (lacing, when present, is left as one opaque range)."""
    tn = _read_vint(data, a, keep_marker=False)
    if tn is None or tn[0] == "unknown":
        return None
    start = a + tn[1] + 3
    if start > b:
        return None
    return tn[0], start, b - start


def parse_webm(payload: bytes) -> Optional[WebmInfo]:
    """Parse an EBML/Matroska container; None when the payload is not one.

    Identification requires the EBML head element (0x1A45DFA3) first plus
    a Segment — a lone magic prefix over arbitrary bytes is rejected by
    the element walk's size checks."""
    data = bytes(payload)
    if len(data) < 8:
        return None
    top = _elements(data, 0, len(data))
    head = next(top, None)
    if head is None or head[0] != _EBML_HEAD:
        return None
    doctype = "matroska"
    for eid, a, b in _elements(data, head[1], head[2], 1):
        if eid == _DOCTYPE:
            doctype = data[a:b].decode("latin-1").rstrip("\x00")
    segment = None
    for eid, a, b in top:
        if eid == _SEGMENT:
            segment = (a, b)
            break
    if segment is None:
        return None
    timescale = 1_000_000  # Matroska default: 1 ms in ns
    duration_ticks = 0.0
    tracks = []
    by_number: dict = {}  # track number -> [(offset, size)] of frame data
    for eid, a, b in _elements(data, *segment, 1):
        if eid == _INFO:
            for iid, ia, ib in _elements(data, a, b, 2):
                if iid == _TIMESTAMP_SCALE:
                    timescale = _uint(data, ia, ib) or timescale
                elif iid == _DURATION:
                    duration_ticks = _float(data, ia, ib) or 0.0
        elif eid == _TRACKS:
            for tid, ta, tb in _elements(data, a, b, 2):
                if tid == _TRACK_ENTRY:
                    t = _parse_track(data, ta, tb)
                    if t is not None:
                        tracks.append(t)
        elif eid == _CLUSTER:
            for cid, ca, cb in _elements(data, a, b, 2):
                blk = None
                if cid == _SIMPLE_BLOCK:
                    blk = _block_range(data, ca, cb)
                elif cid == _BLOCK_GROUP:
                    for gid, ga, gb in _elements(data, ca, cb, 3):
                        if gid == _BLOCK:
                            blk = _block_range(data, ga, gb)
                if blk is not None:
                    by_number.setdefault(blk[0], []).append(blk[1:])
    tracks = [
        t._replace(block_ranges=by_number.get(t.number, [])) for t in tracks
    ]
    return WebmInfo(
        doctype=doctype,
        timescale_ns=timescale,
        duration_s=round(duration_ticks * timescale / 1e9, 6),
        n_tracks=len(tracks),
        tracks=tracks,
    )
