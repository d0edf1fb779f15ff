"""AAC ADTS frame-header walk — metadata without audio synthesis.

Scope contract mirrors :func:`.mp3.parse_mp3`: parses the public
ISO/IEC 13818-7 / 14496-3 ADTS transport layout (the framing used for
raw ``.aac`` web audio) and reports profile, sample rate, channel count,
frame count, total samples, duration and per-frame byte sizes. It does
NOT decode audio — filterbank/huffman synthesis is out of scope, so
callers get honest header-derived features (duration, bitrate shape)
instead of fake PCM.

Reference parity note: the reference engine has no audio path at all;
this belongs to the training-data-pipeline extension.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

#: ISO/IEC 14496-3 sampling_frequency_index table (13 valid entries).
_SAMPLE_RATES = (
    96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
    16000, 12000, 11025, 8000, 7350,
)

#: audio_object_type names for the 2-bit ADTS profile field (MPEG-4).
_PROFILES = ("AAC Main", "AAC LC", "AAC SSR", "AAC LTP")

#: how far into the payload to scan for the first sync word.
_SYNC_SCAN_LIMIT = 4096

#: minimum CONSECUTIVE valid frames whose lengths chain for a positive
#: identification (a lone 0xFFFx sync in arbitrary binary is common).
_MIN_FRAMES = 2


class AdtsInfo(NamedTuple):
    profile: str            # 'AAC Main' | 'AAC LC' | 'AAC SSR' | 'AAC LTP'
    mpeg_version: int       # 2 | 4
    sample_rate: int        # Hz
    n_channels: int         # 1..7 (channel_configuration; 0 unsupported)
    n_frames: int
    n_samples: int          # total samples per channel (1024 per block)
    duration_s: float
    bitrate_kbps: float     # frame-size-weighted mean
    frame_sizes: list       # per-frame byte lengths, in stream order


def _skip_id3v2(data: bytes, pos: int) -> int:
    if data[pos : pos + 3] == b"ID3" and pos + 10 <= len(data):
        size = 0
        for b in data[pos + 6 : pos + 10]:
            if b & 0x80:
                return pos
            size = (size << 7) | b
        return pos + 10 + size
    return pos


def _frame_at(data: bytes, pos: int):
    """(frame_length, samples, sample_rate, channels, version, profile)
    for a syntactically valid ADTS header at ``pos``, else None."""
    if pos + 7 > len(data):
        return None
    b = data
    if b[pos] != 0xFF or (b[pos + 1] & 0xF6) != 0xF0:
        return None  # 12-bit sync + layer == 00
    mpeg2 = (b[pos + 1] >> 3) & 1
    profile_idx = b[pos + 2] >> 6
    sr_idx = (b[pos + 2] >> 2) & 0x0F
    if sr_idx >= len(_SAMPLE_RATES):
        return None
    channels = ((b[pos + 2] & 1) << 2) | (b[pos + 3] >> 6)
    if channels == 0:
        return None  # config in-band (PCE): out of scope
    frame_len = (
        ((b[pos + 3] & 0x03) << 11) | (b[pos + 4] << 3) | (b[pos + 5] >> 5)
    )
    protection_absent = b[pos + 1] & 1
    min_len = 7 if protection_absent else 9
    if frame_len < min_len:
        return None
    blocks = (b[pos + 6] & 0x03) + 1
    return (
        frame_len,
        1024 * blocks,
        _SAMPLE_RATES[sr_idx],
        channels,
        2 if mpeg2 else 4,
        profile_idx,
    )


def parse_adts(payload: bytes) -> Optional[AdtsInfo]:
    """Walk an ADTS stream; None when the payload is not one.

    Requires ``_MIN_FRAMES`` consecutive frames whose computed lengths
    chain and whose sample-rate/channel fields agree; tolerates a
    truncated final frame (counted if its header fits)."""
    data = bytes(payload)
    n = len(data)
    start = _skip_id3v2(data, 0) if n >= 10 else 0
    limit = min(n - 7, start + _SYNC_SCAN_LIMIT)
    pos = start
    while pos <= limit:
        first = _frame_at(data, pos)
        if first is not None:
            nxt = _frame_at(data, pos + first[0])
            if (
                nxt is not None
                and nxt[2] == first[2]
                and nxt[3] == first[3]
                and nxt[4] == first[4]
            ):
                break
        pos += 1
    else:
        return None

    _fl, _sm, rate, channels, version, profile_idx = first
    frame_sizes = []
    total_samples = 0
    while pos < n:
        fr = _frame_at(data, pos)
        if fr is None or fr[2] != rate or fr[3] != channels:
            break
        frame_len, samples = fr[0], fr[1]
        if pos + frame_len > n:  # truncated tail: header fits, data cut
            frame_sizes.append(n - pos)
            total_samples += samples
            break
        frame_sizes.append(frame_len)
        total_samples += samples
        pos += frame_len
    if len(frame_sizes) < _MIN_FRAMES:
        return None
    duration = total_samples / rate
    total_bytes = sum(frame_sizes)
    return AdtsInfo(
        profile=_PROFILES[profile_idx],
        mpeg_version=version,
        sample_rate=rate,
        n_channels=channels,
        n_frames=len(frame_sizes),
        n_samples=total_samples,
        duration_s=round(duration, 6),
        bitrate_kbps=round(total_bytes * 8 / duration / 1000.0, 3)
        if duration
        else 0.0,
        frame_sizes=frame_sizes,
    )
