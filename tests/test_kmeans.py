"""Distributed spherical k-means: numpy-reference parity, objective
improvement over sampled centroids, SemDeDup centroid-override wiring."""

from __future__ import annotations

import numpy as np

TESTDATA = "/root/testdata/sf0.01"


def _emb(spark):
    return spark.read.parquet(f"{TESTDATA}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def test_kmeans_matches_numpy_reference(spark):
    from security_log_analysis_rust_spark.textops.kmeans import (
        kmeans_fit,
        kmeans_fit_reference,
    )

    emb = _emb(spark)
    got = np.array(kmeans_fit(emb, k=8, iters=4))

    rows = [(r.vec_id, list(r.embedding)) for r in emb.collect()]
    want = np.array(kmeans_fit_reference(rows, k=8, iters=4))

    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-6), np.abs(got - want).max()
    # spherical contract: unit-norm centroids
    assert np.allclose(np.linalg.norm(got, axis=1), 1.0, atol=1e-9)


def test_kmeans_improves_objective_over_sampling(spark):
    """Lloyd iterations must tighten the clustering the md5 sample starts
    from (iteration 0 IS the sampling path, so improvement is monotone by
    construction — this asserts it is also material on real data)."""
    from security_log_analysis_rust_spark.textops.ann import _as_double_vec
    from security_log_analysis_rust_spark.textops.kmeans import (
        _md5_sample_rows,
        cluster_cost,
        kmeans_fit,
    )

    emb = _emb(spark)
    base = _as_double_vec(emb, "vec_id", "embedding")
    sampled = [
        [float(x) for x in r["v"]] for r in _md5_sample_rows(base, 8, seed=7)
    ]
    trained = kmeans_fit(emb, k=8, iters=6)
    c_sampled = cluster_cost(emb, sampled)
    c_trained = cluster_cost(emb, trained)
    assert c_trained < c_sampled, (c_trained, c_sampled)


def test_semdedup_accepts_trained_centroids(spark):
    """Trained centroids flow through semdedup's override; the default
    md5 path is untouched (same results as before the parameter)."""
    from security_log_analysis_rust_spark.textops.kmeans import kmeans_fit
    from security_log_analysis_rust_spark.textops.semdedup import semdedup

    emb = _emb(spark)
    n = emb.count()

    trained = kmeans_fit(emb, k=8, iters=3)
    out = semdedup(emb, threshold=0.35, centroid_vectors=trained).toPandas()
    assert len(out) == n  # every vector gets a verdict
    assert set(out.columns) == {"vec_id", "cid", "csim", "kept"}
    assert out["cid"].between(0, 7).all()
    assert out["kept"].any() and not out["kept"].all()  # the rule bites

    # default path unchanged: explicitly-None override == no override
    a = semdedup(emb, threshold=0.35, n_centroids=16).toPandas()
    b = semdedup(
        emb, threshold=0.35, n_centroids=16, centroid_vectors=None
    ).toPandas()
    pa = a.sort_values("vec_id").reset_index(drop=True)
    pb = b.sort_values("vec_id").reset_index(drop=True)
    assert pa.equals(pb)


def test_ivf_accepts_trained_centroids(spark):
    """Trained centroids flow through ivf_topk's override (the FAISS
    configuration); recall vs exact stays at least non-inferior to the
    certified md5-sampled quantizer on the same probe budget."""
    from security_log_analysis_rust_spark.textops.ann import (
        brute_force_topk,
        ivf_topk,
        recall_at_k,
    )
    from security_log_analysis_rust_spark.textops.kmeans import kmeans_fit

    emb = _emb(spark)
    exact = brute_force_topk(emb, k=5)
    trained = kmeans_fit(emb, k=16, iters=4)
    r_trained = recall_at_k(
        ivf_topk(emb, k=5, centroid_vectors=trained, n_probe=4), exact
    )
    r_sampled = recall_at_k(
        ivf_topk(emb, k=5, n_centroids=16, n_probe=4), exact
    )
    assert r_trained >= r_sampled - 0.05, (r_trained, r_sampled)
    assert r_trained > 0.5


def test_kmeans_empty_cluster_contract(spark):
    """k larger than the number of distinct directions: empty clusters
    keep their init centroid instead of collapsing to NaN."""
    from security_log_analysis_rust_spark.textops.kmeans import kmeans_fit

    rows = [(i, [1.0, 0.0] if i % 2 else [0.0, 1.0]) for i in range(12)]
    emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    cents = np.array(kmeans_fit(emb, k=6, iters=3))
    assert cents.shape == (6, 2)
    assert np.isfinite(cents).all()
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0, atol=1e-9)
