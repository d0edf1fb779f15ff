"""SemDeDup: DuckDB oracle parity (pinned + auto centroid counts, real and
crafted corpora), the paper's upper-triangle rule on a similarity chain,
and partitioning invariance."""

from __future__ import annotations

import duckdb
import pytest

from util_compare import compare_frames, duck_connection

TESTDATA = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{TESTDATA}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def test_semdedup_oracle_parity_pinned(spark):
    from security_log_analysis_rust_spark.textops.semdedup import (
        semdedup,
        semdedup_oracle_sql,
    )

    got = semdedup(_emb(spark), threshold=0.35, n_centroids=8).toPandas()
    con = duck_connection(TESTDATA)
    try:
        oracle = con.sql(semdedup_oracle_sql(threshold=0.35, n_centroids=8)).df()
    finally:
        con.close()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)
    assert len(got) == 500, "every vector must receive a verdict"
    assert (~got["kept"]).any(), "threshold 0.35 must actually drop something"
    assert got["kept"].any()


def test_semdedup_oracle_parity_auto(spark):
    from security_log_analysis_rust_spark.textops.semdedup import (
        semdedup,
        semdedup_n_centroids,
        semdedup_oracle_sql,
    )

    # auto sizing: 500 vectors / target 64 -> 8 clusters (power of two,
    # floored at 16 -> 16 here); verify formula and end-to-end parity
    assert semdedup_n_centroids(500, target_cluster=64) == 16
    assert semdedup_n_centroids(10**12, target_cluster=4096) == 2**28
    got = semdedup(
        _emb(spark), threshold=0.35, n_centroids=None, target_cluster=64
    ).toPandas()
    con = duck_connection(TESTDATA)
    try:
        oracle = con.sql(
            semdedup_oracle_sql(threshold=0.35, n_centroids=None, target_cluster=64)
        ).df()
    finally:
        con.close()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)


def test_semdedup_upper_triangle_chain(spark):
    """a~b and b~c but a!~c: the paper's triu rule drops BOTH b and c
    (c's dropper b is earlier-ordered even though b is itself dropped) —
    verified against the independently-formulated SQL oracle."""
    from security_log_analysis_rust_spark.textops.semdedup import (
        semdedup,
        semdedup_oracle_sql,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.1]),
        (2, [1.0, 0.25, 0.0, 0.1]),
        (3, [1.0, 0.52, 0.0, 0.1]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ]
    docs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got_df = semdedup(docs, threshold=0.97, n_centroids=1)
    got = got_df.toPandas()
    values = ", ".join(
        f"({i}, CAST({v!r} AS FLOAT[]))" for i, v in rows
    )
    src = f"(SELECT * FROM (VALUES {values}) AS t(vec_id, embedding))"
    oracle = duckdb.sql(
        semdedup_oracle_sql(threshold=0.97, n_centroids=1, source=src)
    ).df()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)
    kept = dict(zip(got["vec_id"], got["kept"]))
    # centroid = id 3 (md5-min of 'id:7' over {1..4}), so the ascending-csim
    # order is 4, 1, 2, 3: cos(1,2)=0.9705 drops 2; cos(2,3)=0.9728 drops 3
    # even though 2 is itself dropped (the triu rule); cos(1,3)=0.888 < 0.97
    # so a greedy-transitive variant would KEEP 3 — this pins the paper's rule
    assert kept == {4: True, 1: True, 2: False, 3: False}


def test_semdedup_partitioning_invariance(spark):
    from security_log_analysis_rust_spark.textops.semdedup import semdedup

    emb = _emb(spark)
    a = sorted(
        map(tuple, semdedup(emb.coalesce(1), 0.35, n_centroids=8).collect())
    )
    b = sorted(
        map(tuple, semdedup(emb.repartition(32), 0.35, n_centroids=8).collect())
    )
    assert a == b


def test_semdedup_threshold_validation(spark):
    from security_log_analysis_rust_spark.textops.semdedup import semdedup

    with pytest.raises(ValueError):
        semdedup(_emb(spark), threshold=0.0)
