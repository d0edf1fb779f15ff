"""Approximate nearest neighbors over an embedding column.

Two paths:

* ``brute_force_topk`` — numpy-batched exact top-k via ``mapInPandas``: the
  candidate matrix broadcasts to every task and each Arrow batch of probes
  does one BLAS matmul. This is the baseline and also the within-bucket
  kernel. Scales to the point where the candidate matrix fits executor
  memory (~10M x 128 floats = 5 GB); beyond that, shard candidates and merge
  per-shard top-k (same function, grouped).

* ``lsh_topk`` — the scale path: random-hyperplane LSH bucketing (seeded,
  deterministic) so only vectors sharing a bucket are compared. Recall is
  tunable via ``n_bits``/``n_tables``.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_TOPK_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("neighbor_id", LongType()),
        StructField("rank", IntegerType()),
        StructField("sim", DoubleType()),
    ]
)


def _collect_matrix(emb: DataFrame, id_col: str, vec_col: str):
    pdf = emb.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return ids, mat, norms


def brute_force_topk(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per vector (self-join semantics, excludes self)."""
    spark = emb.sparkSession
    ids, mat, norms = _collect_matrix(emb, id_col, vec_col)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat / norms[:, None])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cand_ids = b_ids.value
        cand = b_mat.value  # normalized candidates
        for pdf in batches:
            q_ids = pdf[id_col].to_numpy()
            q = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            qn = np.linalg.norm(q, axis=1)
            qn[qn == 0] = 1.0
            sims = (q / qn[:, None]) @ cand.T  # (batch, n_candidates)
            # mask self-matches
            for r, qid in enumerate(q_ids):
                self_idx = np.nonzero(cand_ids == qid)[0]
                sims[r, self_idx] = -np.inf
            kk = min(k, sims.shape[1] - 1)
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = []
            for r, qid in enumerate(q_ids):
                order = top[r][np.argsort(-sims[r, top[r]], kind="stable")]
                for rank, ci in enumerate(order, 1):
                    rows.append((int(qid), int(cand_ids[ci]), rank, float(sims[r, ci])))
            yield pd.DataFrame(rows, columns=["vec_id", "neighbor_id", "rank", "sim"])

    return emb.select(id_col, vec_col).mapInPandas(gen, _TOPK_SCHEMA)


def with_lsh_bucket(
    emb: DataFrame,
    n_bits: int = 10,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Attach a random-hyperplane LSH bucket (sign pattern) column."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    planes = np.random.default_rng(seed).standard_normal((n_bits, dim))
    spark = emb.sparkSession
    b_planes = spark.sparkContext.broadcast(planes)

    schema = StructType(
        emb.select(id_col, vec_col).schema.fields
        + [StructField("bucket", LongType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = b_planes.value
        weights = 1 << np.arange(pl.shape[0], dtype=np.int64)
        for pdf in batches:
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (v @ pl.T) > 0
            pdf = pdf[[id_col, vec_col]].copy()
            pdf["bucket"] = (bits @ weights).astype(np.int64)
            yield pdf

    return emb.select(id_col, vec_col).mapInPandas(gen, schema)


def lsh_topk(
    emb: DataFrame,
    k: int = 5,
    n_bits: int = 4,
    n_tables: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine among LSH-bucket candidates only.

    Standard OR-amplified multi-table LSH: a pair is a candidate if it
    collides in *any* of ``n_tables`` independent hyperplane tables (per-table
    collision prob ``(1 - theta/pi)^n_bits``; tables drive recall up, bits
    drive candidate count down). At scale the bucket equi-joins replace the
    all-pairs matmul: one shuffle on (table, bucket), comparisons only within
    buckets.
    """
    spark = emb.sparkSession
    tables = []
    for t in range(n_tables):
        bt = with_lsh_bucket(
            emb, n_bits=n_bits, seed=seed + 1000 * t, id_col=id_col, vec_col=vec_col
        ).select(F.col(id_col), F.lit(t).alias("tbl"), "bucket")
        tables.append(bt)
    buckets = tables[0]
    for bt in tables[1:]:
        buckets = buckets.unionByName(bt)

    lhs = buckets.select(F.col(id_col).alias("vec_id"), "tbl", "bucket")
    rhs = buckets.select(F.col(id_col).alias("neighbor_id"), "tbl", "bucket")
    cand = (
        lhs.join(rhs, ["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id")
        .distinct()
    )

    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col), vec.alias("v"))
    cand = (
        cand.join(base.select(F.col(id_col).alias("vec_id"), F.col("v").alias("va")), "vec_id")
        .join(
            base.select(F.col(id_col).alias("neighbor_id"), F.col("v").alias("vb")),
            "neighbor_id",
        )
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    nrm = lambda c: F.sqrt(
        F.aggregate(F.transform(F.col(c), lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    pairs = cand.select(
        "vec_id", "neighbor_id", (dot / (nrm("va") * nrm("vb"))).alias("sim")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "rank", "sim")
    )


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int = 5) -> float:
    """Fraction of exact top-k pairs recovered by the approximate result."""
    e = exact.filter(F.col("rank") <= k).select("vec_id", "neighbor_id")
    a = approx.filter(F.col("rank") <= k).select("vec_id", "neighbor_id")
    hit = e.join(a, ["vec_id", "neighbor_id"]).count()
    total = e.count()
    return hit / total if total else 1.0
