"""Perceptual image near-dup detection: dHash re-encode stability,
distinct-image separation, end-to-end pairing over binary payloads."""

from __future__ import annotations

import numpy as np

from test_textops import _encode_png
from util_jpeg import encode_color


def _smooth_rgb(w=64, h=48, seed=7):
    """Low-frequency synthetic image: smooth enough that JPEG quantization
    barely perturbs block means, structured enough that dHash bits are
    decisive."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w, 3))
    for c in range(3):
        fx, fy = rng.uniform(0.5, 2.5, 2)
        px, py = rng.uniform(0, 2 * np.pi, 2)
        img[:, :, c] = 128 + 100 * np.sin(
            2 * np.pi * fx * xx / w + px
        ) * np.cos(2 * np.pi * fy * yy / h + py)
    return np.clip(img, 0, 255).astype(np.uint8)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_dhash_stable_under_reencoding():
    from security_log_analysis_rust_spark.textops.imagedup import dhash_pixels
    from security_log_analysis_rust_spark.textops.multimodal import (
        _decode_image_real,
    )

    rgb = _smooth_rgb()
    h_png = dhash_pixels(_decode_image_real(_encode_png(rgb, filters=[0])))
    h_jpg = dhash_pixels(_decode_image_real(encode_color(rgb)))
    h_sub = dhash_pixels(
        _decode_image_real(encode_color(rgb, subsample=True))
    )
    assert _hamming(h_png, h_jpg) <= 6
    assert _hamming(h_png, h_sub) <= 6
    # the PNG round-trip is lossless: identical signature to raw pixels
    assert h_png == dhash_pixels(rgb)


def test_dhash_separates_distinct_images():
    from security_log_analysis_rust_spark.textops.imagedup import dhash_pixels

    sigs = [dhash_pixels(_smooth_rgb(seed=s)) for s in range(6)]
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            assert _hamming(sigs[i], sigs[j]) > 10, (i, j)


def test_image_near_dups_end_to_end(spark):
    from security_log_analysis_rust_spark.textops.imagedup import (
        dhash_images,
        image_near_dups,
    )

    base = _smooth_rgb(seed=3)
    other = _smooth_rgb(seed=4)
    rows = [
        (0, bytearray(_encode_png(base, filters=[0]))),
        (1, bytearray(encode_color(base))),          # same image, JPEG
        (2, bytearray(_encode_png(other, filters=[0]))),
        (3, bytearray(b"\x00" * 32)),                 # undecodable
        (4, None),                                    # null payload
    ]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")

    sigs = {r.media_id: r.dhash for r in dhash_images(media).collect()}
    assert sorted(sigs) == [0, 1, 2]  # corrupt/null yield no row

    pairs = image_near_dups(media, max_hamming=6).collect()
    assert [(r.a_id, r.b_id) for r in pairs] == [(0, 1)]
    assert pairs[0].hamming <= 6


def test_image_dedup_kept_end_to_end(spark):
    """Pairs -> connected components -> keep-min: a transitive chain
    (PNG ~ JPEG ~ subsampled JPEG of one image) collapses to ONE kept
    member even if the ends of the chain pair only through the middle."""
    from security_log_analysis_rust_spark.textops.imagedup import (
        image_dedup_kept,
    )

    base = _smooth_rgb(seed=5)
    other = _smooth_rgb(seed=6)
    rows = [
        (0, bytearray(_encode_png(base, filters=[0]))),
        (1, bytearray(encode_color(base))),
        (2, bytearray(encode_color(base, subsample=True))),
        (3, bytearray(_encode_png(other, filters=[0]))),
        (4, bytearray(b"\x01" * 16)),  # undecodable: no row
    ]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")
    out = {r.media_id: (r.cluster_id, r.kept)
           for r in image_dedup_kept(media).collect()}
    assert sorted(out) == [0, 1, 2, 3]
    assert out[0] == (0, True)
    assert out[1] == (0, False) and out[2] == (0, False)
    assert out[3] == (3, True)


def test_spark_dhash_matches_driver():
    """The mapInPandas signature equals a driver-side decode+hash of the
    same payload (no partitioning or Arrow effects)."""
    from security_log_analysis_rust_spark.textops.imagedup import dhash_pixels
    from security_log_analysis_rust_spark.textops.multimodal import (
        _decode_image_real,
    )

    rgb = _smooth_rgb(seed=11)
    png = _encode_png(rgb, filters=[0, 2, 4])
    want = dhash_pixels(_decode_image_real(png))

    from security_log_analysis_rust_spark.session import get_spark
    from security_log_analysis_rust_spark.textops.imagedup import dhash_images

    spark = get_spark(cpus=4, shuffle_partitions=8)
    media = spark.createDataFrame(
        [(7, bytearray(png))], "media_id: long, payload: binary"
    )
    got = dhash_images(media.repartition(3)).collect()
    assert [(r.media_id, r.dhash) for r in got] == [(7, want)]
