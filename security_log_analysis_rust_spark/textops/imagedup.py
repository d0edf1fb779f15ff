"""Perceptual image near-duplicate detection over binary media columns.

Web crawls carry the same image re-encoded endlessly — different JPEG
quality, PNG vs JPEG, thumbnails — so training-data pipelines dedup
images PERCEPTUALLY, not by byte hash. The standard cheap signature is
dHash (difference hash: downscale to 9x8 luminance, emit one bit per
horizontally-adjacent pair), which is stable under re-encoding and small
resizes while distinct images land ~32 bits apart in expectation.

Spark-first decomposition, reusing the engine's existing machinery:

* **signature** (:func:`dhash_images`): Arrow-batched ``mapInPandas``
  over the in-tree decoders (PNG/JPEG/GIF/BMP — no external codec), one
  64-bit signed long per decodable image. Undecodable or corrupt
  payloads yield no row (stated contract — a payload the engine cannot
  decode has no perceptual identity).
* **pairing**: the signature column feeds
  :func:`.simhash.near_dups_from_sigs` UNCHANGED — the Manku WWW'07
  combination-blocking join (bounded buckets, no all-pairs scan, hot-key
  anti-join) doesn't care whether the 64 bits came from text shingles or
  pixels. One sig-agnostic blocking kernel serves both modalities; the
  100 TB argument is inherited verbatim.

The downscale is block-averaging over a ``linspace`` grid (the same move
as :func:`.multimodal.image_features`) rather than an interpolating
resize: deterministic, dependency-free, and equally re-encode-stable.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("dhash", LongType()),
    ]
)


def dhash_pixels(pixels: np.ndarray) -> int:
    """(h, w, c) uint8 pixels -> 64-bit dHash as a SIGNED 64-bit int
    (Spark LongType; bit 63 wraps negative, matching how ``.simhash``
    stores its signatures)."""
    lum = pixels.astype(np.float64).mean(axis=2)
    h, w = lum.shape
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 10).astype(int)
    grid = np.empty((8, 9), dtype=np.float64)
    for i in range(8):
        for j in range(9):
            cell = lum[
                ys[i] : max(ys[i + 1], ys[i] + 1),
                xs[j] : max(xs[j + 1], xs[j] + 1),
            ]
            grid[i, j] = cell.mean()
    bits = (grid[:, 1:] > grid[:, :-1]).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def dhash_images(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    batch_hint: int = 256,
) -> DataFrame:
    """-> (media_id, dhash): perceptual signature per decodable image."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .multimodal import _decode_image_real

        for pdf in batches:
            ids, sigs = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    pixels = _decode_image_real(bytes(payload))
                except Exception:
                    pixels = None  # corrupt payloads have no identity
                if pixels is None:
                    continue
                ids.append(mid)
                sigs.append(dhash_pixels(pixels))
            yield pd.DataFrame({"media_id": ids, "dhash": sigs}).astype(
                {"media_id": "int64", "dhash": "int64"}
            )

    src = media.select(
        media[id_col].cast("long").alias(id_col), payload_col
    )
    return src.mapInPandas(gen, DHASH_SCHEMA)


def image_near_dups(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 6,
    n_bands: int = 8,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Perceptual near-dup pairs (id_a, id_b, hamming <= max_hamming).

    dHash signatures -> the simhash combination-blocking pair join;
    complete for ``n_bands > max_hamming`` (same guarantee as the text
    path, same bounded-bucket physical plan)."""
    from .simhash import DEFAULT_BUCKET_CAP, near_dups_from_sigs

    sigs = dhash_images(media, id_col, payload_col)
    return near_dups_from_sigs(
        sigs,
        id_col="media_id",
        sig_col="dhash",
        max_hamming=max_hamming,
        n_bands=n_bands,
        bucket_cap=DEFAULT_BUCKET_CAP if bucket_cap is None else bucket_cap,
    )


def image_dedup_kept(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 6,
    n_bands: int = 8,
) -> DataFrame:
    """-> (media_id, cluster_id, kept): full perceptual image dedup —
    near-dup pairs resolved to connected components (the same
    :func:`.cluster.connected_components` machinery as the text dedup
    stack, large-star/small-star fallback included) with the min-id
    member of each cluster kept. Undecodable images have no perceptual
    identity, hence no row (same contract as :func:`dhash_images`)."""
    from .cluster import connected_components

    sigs = dhash_images(media, id_col, payload_col)
    pairs = image_near_dups(
        media, id_col, payload_col, max_hamming, n_bands
    )
    comps = connected_components(
        sigs.select(F.col("media_id")),
        pairs,
        id_col="media_id",
        a_col="a_id",
        b_col="b_id",
    )
    return comps.select(
        "media_id",
        "cluster_id",
        (F.col("media_id") == F.col("cluster_id")).alias("kept"),
    )
