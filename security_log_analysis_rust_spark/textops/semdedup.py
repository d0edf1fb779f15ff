"""Semantic deduplication (SemDeDup, Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", arXiv:2303.09540).

Document-level near-dup detection in *embedding* space: cluster the
corpus, then inside each cluster mark every example whose cosine
similarity to a better-ranked cluster member reaches ``threshold``.
The released SemDeDup pseudocode takes the upper triangle of the
within-cluster similarity matrix — example *i* is removed iff ANY
earlier-ordered example *j* has ``cos(i, j) >= threshold``, whether or
not *j* itself survives — and prefers keeping the examples *least*
similar to their centroid (the diverse ones). Both choices are mirrored
exactly here, which keeps the rule expressible as a plain SQL ``EXISTS``
for the oracle (a greedy-transitive variant would need a sequential
scan; the paper's published rule does not).

Deviation from the paper, stated: centroids are the same deterministic
md5-sampled data rows the IVF index uses (:func:`.ann.ivf_topk`), not a
trained k-means — sampling keeps centroid choice reproducible in any
engine (the SQL oracle derives the identical set), and the paper itself
reports robustness to clustering quality (§4.4).

Scale notes (the 100 TB plan): assignment is JVM expressions against a
broadcast O(centroids) literal — no corpus collect; the per-cluster pass
is one shuffle on ``cid`` into an ``applyInPandas`` kernel whose cost is
one |cluster|² matmul, so ``n_centroids`` must grow with the corpus:
size it ~N/``target_cluster`` (:func:`semdedup_n_centroids`) to hold the
per-cluster work at target² — the paper runs k=110k clusters for LAION
at web scale for exactly this reason. Stated limit: coarse assignment
itself costs N x K dot products (identical to the k-means assignment
step the paper runs); at extreme K the standard fix is a two-level
centroid hierarchy (route through ~sqrt(K) super-centroids first),
which changes assignment from exact-nearest to approximate and is
deliberately NOT implemented — the oracle pairing certifies the exact
rule.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ann import _as_double_vec, _centroid_score_structs, _half_up_round


def semdedup_n_centroids(n_vectors: int, target_cluster: int = 4096) -> int:
    """~N/target clusters, power-of-two, floored at 16 — bounds expected
    per-cluster pairwise work at ~target². Same shape as the SQL twin:
    greatest(16, pow(2, ceil(log2(ceil(N/target)))))."""
    return max(
        16, 1 << math.ceil(math.log2(math.ceil(max(n_vectors, 1) / target_cluster)))
    )


def semdedup(
    emb: DataFrame,
    threshold: float = 0.95,
    n_centroids: int | None = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_vectors: int | None = None,
    target_cluster: int = 4096,
    centroid_vectors: list | None = None,
) -> DataFrame:
    """-> (vec_id, cid, csim, kept): every vector with its cluster id, its
    (rounded) cosine to the cluster centroid, and the SemDeDup verdict.

    ``kept`` is false iff some cluster member ordered earlier — ascending
    ``(csim, vec_id)``, i.e. centroid-diverse examples rank first — has
    pairwise cosine >= ``threshold`` with this vector. ``threshold`` must
    be positive (cosine near-dup regimes are ~0.7-0.99; the paper sweeps
    eps around 0.95 for LAION). ``n_centroids=None`` auto-sizes via
    :func:`semdedup_n_centroids`. Deterministic for a given corpus
    regardless of partitioning.

    ``centroid_vectors`` (optional) replaces the md5-sampled centroids
    with caller-supplied ones — e.g. trained :func:`.kmeans.kmeans_fit`
    output, the paper's actual clustering. The default (None) keeps the
    SQL-oracle-certified sampling path.
    """
    if not threshold > 0:
        raise ValueError("SemDeDup threshold must be positive")
    base = _as_double_vec(emb, id_col, vec_col).withColumnRenamed(id_col, "vec_id")
    if centroid_vectors is not None:
        cent_pairs = [
            (i, [float(x) for x in c]) for i, c in enumerate(centroid_vectors)
        ]
    else:
        if n_centroids is None:
            n_centroids = semdedup_n_centroids(
                emb.count() if n_vectors is None else n_vectors, target_cluster
            )
        cent_rows = (
            base.withColumn(
                "__h",
                F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(f":{seed}"))),
            )
            .orderBy("__h", "vec_id")
            .limit(n_centroids)
            .collect()
        )
        cent_pairs = [
            (i, [float(x) for x in r["v"]]) for i, r in enumerate(cent_rows)
        ]
    # r6 (guide §2.4): the centroids are driver-side literals already, so
    # the nearest-centroid assignment is ONE per-row expression over the
    # centroid-literal array — the former broadcast join exploded every
    # vector into n_centroids rows (each carrying the full vector) and
    # picked rank 1 with a sort-based window, i.e. a full N*K exchange.
    # The per-centroid cosine is the identical rounded expression, and
    # min-of-(-csim, cid) structs equals the window's (csim desc, cid asc)
    # rank-1 pick (see _centroid_score_structs on the single-tree shape).
    best_arr = F.array_min(_centroid_score_structs(cent_pairs))
    assigned = base.select("vec_id", "v", best_arr.alias("__best")).select(
        "vec_id",
        F.col("__best.cid").alias("cid"),
        (-F.col("__best.ns")).alias("csim"),
        "v",
    )
    thr = float(threshold)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((pdf["vec_id"].to_numpy(), pdf["csim"].to_numpy()))
        pdf = pdf.iloc[order].reset_index(drop=True)
        m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        sims = _half_up_round(mn @ mn.T)
        # column i is dropped iff any strictly-earlier row j has
        # sims[j, i] >= thr — the paper's upper-triangle rule
        dropped = np.triu(sims >= thr, 1).any(axis=0)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "cid": pdf["cid"],
                "csim": pdf["csim"],
                "kept": ~dropped,
            }
        )

    return assigned.groupBy("cid").applyInPandas(
        kernel, "vec_id long, cid int, csim double, kept boolean"
    )


def semdedup_oracle_sql(
    threshold: float = 0.95,
    n_centroids: int | None = 16,
    seed: int = 7,
    target_cluster: int = 4096,
    source: str = "embeddings",
) -> str:
    """Independent DuckDB twin over the ``source`` relation
    (``vec_id``, ``embedding``): window-ranked centroid sample, argmin
    assignment, and a correlated ``EXISTS`` for the upper-triangle rule —
    no shared code with the Spark kernel. ``n_centroids=None`` derives the
    auto count from the corpus inside SQL (same formula as
    :func:`semdedup_n_centroids`)."""
    thr = float(threshold)
    sim = (
        "round(list_sum(list_transform(list_zip({a}.e, {b}.e), z -> z[1] * z[2])) / "
        "(sqrt(list_sum(list_transform({a}.e, x -> x * x))) * "
        "sqrt(list_sum(list_transform({b}.e, x -> x * x)))), 6)"
    )
    if n_centroids is None:
        nc = (
            "nc AS (SELECT greatest(16, CAST(pow(2, ceil(log2(ceil("
            f"greatest(count(*), 1) / {float(target_cluster)})))) AS INT)) AS n "
            f"FROM {source}), "
            "cent AS (SELECT cv, CAST(rn - 1 AS INT) AS cid FROM ("
            "SELECT e AS cv, row_number() OVER (ORDER BY "
            f"md5(CAST(vec_id AS VARCHAR) || ':{seed}'), vec_id) AS rn FROM v) t "
            "WHERE rn <= (SELECT n FROM nc)), "
        )
    else:
        nc = (
            "cent AS (SELECT cv, CAST(rn - 1 AS INT) AS cid FROM ("
            "SELECT e AS cv, row_number() OVER (ORDER BY "
            f"md5(CAST(vec_id AS VARCHAR) || ':{seed}'), vec_id) AS rn FROM v) t "
            f"WHERE rn <= {int(n_centroids)}), "
        )
    return (
        "WITH v AS (SELECT vec_id, "
        f"list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM {source}), "
        + nc
        + "scored AS (SELECT v.vec_id, v.e, cent.cid, "
        "round(list_sum(list_transform(list_zip(v.e, cent.cv), z -> z[1] * z[2])) / "
        "(sqrt(list_sum(list_transform(v.e, x -> x * x))) * "
        "sqrt(list_sum(list_transform(cent.cv, x -> x * x)))), 6) AS csim "
        "FROM v CROSS JOIN cent), "
        "assigned AS (SELECT vec_id, e, cid, csim FROM ("
        "SELECT *, row_number() OVER (PARTITION BY vec_id "
        "ORDER BY csim DESC, cid ASC) AS crank FROM scored) t WHERE crank = 1), "
        "ranked AS (SELECT *, row_number() OVER (PARTITION BY cid "
        "ORDER BY csim ASC, vec_id ASC) AS ord FROM assigned) "
        "SELECT r.vec_id, r.cid, r.csim, NOT EXISTS ("
        "SELECT 1 FROM ranked p WHERE p.cid = r.cid AND p.ord < r.ord AND "
        + sim.format(a="p", b="r")
        + f" >= {thr}) AS kept FROM ranked r"
    )
