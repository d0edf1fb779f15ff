"""Ogg container walk + codec identification headers — no decode.

Scope contract mirrors :func:`.mp3.parse_mp3`: parses the public Ogg
page framing (RFC 3533) and the identification headers of the codecs
that dominate web Ogg payloads — Vorbis (``\\x01vorbis``), Opus
(``OpusHead``, RFC 7845) and Theora video (``\\x80theora``) — reporting
per-stream codec, channels/sample rate (audio) or dimensions/frame rate
(video), plus duration from the final granule position. Audio/video
synthesis is out of scope.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

_MAX_PAGES = 100_000


class OggStream(NamedTuple):
    serial: int
    codec: str              # 'vorbis' | 'opus' | 'theora' | 'unknown'
    kind: str               # 'audio' | 'video' | 'unknown'
    n_channels: Optional[int]
    sample_rate: Optional[int]  # Hz (Opus: always 48000 granule clock)
    width: Optional[int]    # theora picture dims
    height: Optional[int]
    fps: Optional[float]    # theora frame rate
    pre_skip: int           # opus only (granule correction), else 0
    last_granule: int
    duration_s: float
    page_sizes: list        # payload byte size of each page, stream order


class OggInfo(NamedTuple):
    n_streams: int
    streams: list           # [OggStream]
    duration_s: float       # max stream duration


def _ident(first_packet: bytes):
    """Codec identification from a stream's first packet."""
    p = first_packet
    if p.startswith(b"\x01vorbis") and len(p) >= 16:
        channels = p[11]
        rate = int.from_bytes(p[12:16], "little")
        if channels and rate:
            return "vorbis", "audio", channels, rate, None, None, None, 0
    if p.startswith(b"OpusHead") and len(p) >= 19:
        channels = p[9]
        pre_skip = int.from_bytes(p[10:12], "little")
        if channels:
            # granule clock is ALWAYS 48 kHz regardless of input rate
            return "opus", "audio", channels, 48000, None, None, None, pre_skip
    if p.startswith(b"\x80theora") and len(p) >= 29:
        picw = int.from_bytes(p[14:17], "big")
        pich = int.from_bytes(p[17:20], "big")
        frn = int.from_bytes(p[22:26], "big")
        frd = int.from_bytes(p[26:30], "big") if len(p) >= 30 else 0
        fps = round(frn / frd, 3) if frd else None
        if picw and pich:
            return "theora", "video", None, None, picw, pich, fps, 0
    return "unknown", "unknown", None, None, None, None, None, 0


def parse_ogg(payload: bytes) -> Optional[OggInfo]:
    """Walk Ogg pages; None when the payload is not an Ogg stream.

    Requires at least one well-formed page starting at offset 0 (the
    container always begins with a BOS page)."""
    data = bytes(payload)
    n = len(data)
    streams: dict = {}
    order: list = []
    pos = 0
    pages = 0
    while pos + 27 <= n and pages < _MAX_PAGES:
        if data[pos : pos + 4] != b"OggS" or data[pos + 4] != 0:
            break
        granule = int.from_bytes(
            data[pos + 6 : pos + 14], "little", signed=True
        )
        serial = int.from_bytes(data[pos + 14 : pos + 18], "little")
        n_segs = data[pos + 26]
        table = data[pos + 27 : pos + 27 + n_segs]
        if len(table) != n_segs:
            break
        body_start = pos + 27 + n_segs
        body_len = sum(table)
        if body_start + body_len > n:  # truncated final page
            body_len = max(0, n - body_start)
        if serial not in streams:
            first_len = 0
            for seg in table:  # first packet ends at the first lacing <255
                first_len += seg
                if seg < 255:
                    break
            packet = data[body_start : body_start + first_len]
            streams[serial] = {
                "ident": _ident(packet),
                "granule": 0,
                "sizes": [],
            }
            order.append(serial)
        st = streams[serial]
        st["sizes"].append(body_len)
        if granule > 0:
            st["granule"] = max(st["granule"], granule)
        pos = body_start + body_len
        pages += 1
    if not streams or pages == 0:
        return None
    out = []
    for serial in order:
        st = streams[serial]
        codec, kind, ch, rate, w, h, fps, pre_skip = st["ident"]
        granule = st["granule"]
        if kind == "audio" and rate and granule:
            dur = max(0, granule - pre_skip) / rate
        elif codec == "theora" and fps and granule:
            # theora granules pack keyframe/offset; low bits approximate
            dur = 0.0  # honest: needs the setup header's granule shift
        else:
            dur = 0.0
        out.append(
            OggStream(
                serial=serial,
                codec=codec,
                kind=kind,
                n_channels=ch,
                sample_rate=rate,
                width=w,
                height=h,
                fps=fps,
                pre_skip=pre_skip,
                last_granule=granule,
                duration_s=round(dur, 6),
                page_sizes=st["sizes"],
            )
        )
    return OggInfo(
        n_streams=len(out),
        streams=out,
        duration_s=max((s.duration_s for s in out), default=0.0),
    )
