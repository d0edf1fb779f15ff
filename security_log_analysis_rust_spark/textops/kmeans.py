"""Distributed spherical k-means (Lloyd's algorithm) for embedding
clustering — the trained-centroid upgrade for :mod:`.semdedup` and
:mod:`.ann`'s IVF coarse quantizer.

SemDeDup (Abbas et al. 2023) and FAISS-style IVF both cluster with
k-means; this engine's oracle-paired paths use deterministic md5-sampled
DATA ROWS as centroids (stated deviation — reproducible in SQL). This
module provides the real thing where clustering quality matters, with
the same engine-reproducible character:

* **init**: the md5-sampled rows themselves (identical idiom/seed as
  :func:`.ann.ivf_topk`), so iteration 0 IS the certified sampling
  path and every further iteration only refines it;
* **assign** (per iteration): broadcast the O(k x dim) centroid table,
  rank by JVM cosine, keep the argmax — the same N x K expression-join
  shape as the certified SemDeDup/IVF assignment, no Python;
* **update** (per iteration): Arrow-batched ``mapInPandas`` partial
  sums — each task emits (cid, count, sum-vector) per batch, the driver
  folds O(partitions x k x dim) rows — the `treeAggregate` shape; the
  corpus never moves, and there is no N x dim explode-shuffle;
* empty clusters keep their previous centroid (stated contract);
  spherical update: mean then L2-renormalize (cosine geometry, matching
  how both consumers rank).

Training is verified against a same-order numpy reference
(:func:`kmeans_fit_reference`) exactly like the BPE trainer and the
quality classifier — the distributed loop must reproduce the
single-node algorithm, and the consumers' oracle pairing is untouched
(trained centroids enter :func:`.semdedup.semdedup` through its
``centroid_vectors`` override, leaving the default md5 path certified).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ann import _as_double_vec, _dot, _norm


def _md5_sample_rows(base: DataFrame, k: int, seed: int):
    return (
        base.withColumn(
            "__h",
            F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(f":{seed}"))),
        )
        .orderBy("__h", "vec_id")
        .limit(k)
        .collect()
    )


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def kmeans_fit(
    emb: DataFrame,
    k: int,
    iters: int = 10,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """-> k centroid vectors (list of list[float], L2-normalized).

    Spherical Lloyd iterations; the corpus stays distributed, the driver
    holds O(k x dim) floats plus O(partitions x k x dim) partial rows per
    iteration.
    """
    base = (
        _as_double_vec(emb, id_col, vec_col)
        .withColumnRenamed(id_col, "vec_id")
        .cache()
    )
    cents = _normalize(
        np.array([[float(x) for x in r["v"]] for r in _md5_sample_rows(base, k, seed)])
    )
    spark = emb.sparkSession
    dim = cents.shape[1]

    partial_schema = "cid int, n long, s array<double>"

    for _ in range(iters):
        cent_df = F.broadcast(
            spark.createDataFrame(
                [(i, [float(x) for x in cents[i]]) for i in range(k)],
                "cid int, cv array<double>",
            )
        )
        csim = _dot("v", "cv") / (_norm("v") * F.lit(1.0))  # cv unit-norm
        w = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cid"))
        assigned = (
            base.join(cent_df)
            .select("vec_id", "v", "cid", csim.alias("csim"))
            .withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .select("cid", "v")
        )

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
                cids = pdf["cid"].to_numpy()
                rows = []
                for c in np.unique(cids):
                    sel = m[cids == c]
                    rows.append((int(c), len(sel), sel.sum(axis=0).tolist()))
                yield pd.DataFrame(rows, columns=["cid", "n", "s"])

        agg = assigned.mapInPandas(partials, partial_schema).collect()
        sums = np.zeros((k, dim))
        counts = np.zeros(k, dtype=np.int64)
        for r in agg:
            sums[r.cid] += np.asarray(r.s)
            counts[r.cid] += r.n
        new = cents.copy()  # empty clusters keep their centroid
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        cents = _normalize(new)

    base.unpersist()
    return [[float(x) for x in row] for row in cents]


def kmeans_fit_reference(
    rows: list,
    k: int,
    iters: int = 10,
    seed: int = 7,
) -> list:
    """Driver-side numpy reference of :func:`kmeans_fit` on collected
    (vec_id, vector) pairs — same md5 init, same spherical updates, same
    argmax tie-break (smallest cid), same empty-cluster contract."""
    import hashlib

    ids = [i for i, _ in rows]
    m = np.array([[float(x) for x in v] for _, v in rows], dtype=np.float64)

    def h(i):
        return hashlib.md5(f"{i}:{seed}".encode()).hexdigest()

    init_ids = sorted(ids, key=lambda i: (h(i), i))[:k]
    pos = {i: j for j, i in enumerate(ids)}
    cents = _normalize(np.stack([m[pos[i]] for i in init_ids]))

    mn = _normalize(m.copy())
    for _ in range(iters):
        sims = mn @ cents.T  # matches Spark: dot(v, unit-cv) / |v| ∝ rank
        assign = sims.argmax(axis=1)  # first max = smallest cid
        new = cents.copy()
        for c in range(k):
            sel = m[assign == c]
            if len(sel):
                new[c] = sel.mean(axis=0)
        cents = _normalize(new)
    return [[float(x) for x in row] for row in cents]


def cluster_cost(
    emb: DataFrame,
    centroids: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Mean (1 - cosine to nearest centroid) over the corpus — the
    spherical k-means objective; lower is tighter clustering."""
    spark = emb.sparkSession
    base = _as_double_vec(emb, id_col, vec_col).withColumnRenamed(
        id_col, "vec_id"
    )
    cent_df = F.broadcast(
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "cid int, cv array<double>",
        )
    )
    csim = _dot("v", "cv") / (_norm("v") * _norm("cv"))
    best = (
        base.join(cent_df)
        .select("vec_id", csim.alias("csim"))
        .groupBy("vec_id")
        .agg(F.max("csim").alias("best"))
    )
    return float(best.agg(F.avg(F.lit(1.0) - F.col("best"))).collect()[0][0])
