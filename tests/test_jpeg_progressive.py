"""Progressive (SOF2) decode round-trips.

The strongest check is the cross-entropy-coding differential: a fully
refined progressive stream carries exactly the same quantized
coefficients as the baseline stream from util_jpeg, so the two decodes
must agree BIT-FOR-BIT. Against the original image, Q=1 bounds combined
DCT rounding error at the baseline level (±2 worst case).
"""

import numpy as np

from security_log_analysis_rust_spark.textops.jpeg import decode_jpeg
from util_jpeg import encode_color, encode_gray
from util_jpeg_prog import encode_progressive


def _gray(h, w, seed=7):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 4 * np.pi, w)[None, :]
    y = np.linspace(0, 3 * np.pi, h)[:, None]
    img = 128 + 90 * np.sin(x) * np.cos(y) + rng.integers(-20, 21, (h, w))
    return np.clip(img, 0, 255).astype(np.uint8)


def _rgb(h, w, seed=11):
    rng = np.random.default_rng(seed)
    return np.stack(
        [_gray(h, w, seed + i) for i in range(3)], axis=2
    ) ^ rng.integers(0, 16, (h, w, 3), dtype=np.uint8)


def test_progressive_gray_matches_baseline_exactly():
    img = _gray(24, 17)
    base = decode_jpeg(encode_gray(img))
    prog = decode_jpeg(encode_progressive(img))
    assert prog is not None and prog.shape == (24, 17, 1)
    assert np.array_equal(prog, base)
    assert np.max(np.abs(prog[:, :, 0].astype(int) - img.astype(int))) <= 2


def test_progressive_color_444_matches_baseline_exactly():
    img = _rgb(32, 24)
    base = decode_jpeg(encode_color(img))
    prog = decode_jpeg(encode_progressive(img))
    assert prog is not None and prog.shape == (32, 24, 3)
    assert np.array_equal(prog, base)


def test_progressive_color_420_odd_dims():
    # odd dims exercise MCU padding, ceil block grids, chroma upsample crop
    img = _rgb(35, 29)
    base = decode_jpeg(encode_color(img, subsample=True))
    prog = decode_jpeg(encode_progressive(img, subsample=True))
    assert prog is not None and prog.shape == (35, 29, 3)
    assert np.array_equal(prog, base)


def test_progressive_with_restart_markers():
    img = _gray(33, 26, seed=3)
    plain = decode_jpeg(encode_progressive(img))
    rst = decode_jpeg(encode_progressive(img, restart_interval=3))
    assert rst is not None
    assert np.array_equal(rst, plain)


def test_progressive_band_split_variants():
    img = _gray(16, 16, seed=5)
    for split in (2, 6, 33, 63):
        out = decode_jpeg(encode_progressive(img, band_split=split))
        assert out is not None
        assert np.array_equal(out, decode_jpeg(encode_progressive(img)))


def test_progressive_flat_image_exercises_eob_runs():
    # a flat image makes every AC band all-zero: EOBRUN spans many blocks
    img = np.full((40, 40), 77, dtype=np.uint8)
    out = decode_jpeg(encode_progressive(img))
    assert out is not None
    assert np.array_equal(out, decode_jpeg(encode_gray(img)))


def test_truncated_progressive_renders_partial():
    # cut after the first few scans: the decoder renders what accumulated
    # (coarse image), it does not return None
    img = _gray(24, 24, seed=9)
    payload = encode_progressive(img)
    # find the 3rd SOS and cut just before it, appending EOI
    sos_positions = []
    i = 2
    while i < len(payload) - 1:
        if payload[i] == 0xFF and payload[i + 1] == 0xDA:
            sos_positions.append(i)
        i += 1
    cut = bytes(payload[: sos_positions[2]]) + b"\xff\xd9"
    out = decode_jpeg(cut)
    assert out is not None and out.shape == (24, 24, 1)
    # DC scan landed: coarse approximation should correlate with the image
    err = np.abs(out[:, :, 0].astype(int) - img.astype(int)).mean()
    assert err < 64


def test_progressive_without_scans_is_rejected():
    img = _gray(8, 8)
    payload = encode_progressive(img)
    first_sos = payload.index(b"\xff\xda")
    assert decode_jpeg(bytes(payload[:first_sos]) + b"\xff\xd9") is None


def test_progressive_property_roundtrip():
    """Property check (hypothesis): arbitrary small images decode
    identically through the progressive and baseline entropy codings."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        w=st.integers(4, 24),
        h=st.integers(4, 24),
        seed=st.integers(0, 2**31),
        subsample=st.booleans(),
        color=st.booleans(),
    )
    def check(w, h, seed, subsample, color):
        rng = np.random.default_rng(seed)
        if color:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            base = decode_jpeg(encode_color(img, subsample=subsample))
            prog = decode_jpeg(encode_progressive(img, subsample=subsample))
        else:
            img = rng.integers(0, 256, (h, w), dtype=np.uint8)
            base = decode_jpeg(encode_gray(img))
            prog = decode_jpeg(encode_progressive(img))
        assert prog is not None
        assert np.array_equal(prog, base)

    check()
