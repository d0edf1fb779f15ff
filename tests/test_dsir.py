"""DSIR importance resampling: oracle parity, target-affinity semantics on
a crafted bimodal pool, partitioning invariance, and the no-bigram
exclusion contract."""

from __future__ import annotations

import duckdb

from util_compare import compare_frames, duck_connection

TESTDATA = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{TESTDATA}/documents.parquet").select(
        "doc_id", "source", "text"
    )


def test_dsir_oracle_parity(spark):
    from security_log_analysis_rust_spark.textops.dsir import (
        dsir_select,
        dsir_select_oracle_sql,
    )
    from pyspark.sql import functions as F

    docs = _docs(spark)
    got = dsir_select(
        docs.select("doc_id", "text"),
        docs.filter(F.col("source") == "src0").select("doc_id", "text"),
        k=50,
    ).toPandas()
    con = duck_connection(TESTDATA)
    try:
        oracle = con.sql(
            dsir_select_oracle_sql(
                "SELECT doc_id, text FROM documents",
                "SELECT doc_id, text FROM documents WHERE source = 'src0'",
                k=50,
            )
        ).df()
    finally:
        con.close()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)
    assert len(got) == 50


def _bimodal(spark):
    """30 target-like + 30 junk raw docs, 10 held-out target docs."""
    a_words = "the quick brown fox jumps over a lazy dog and runs home".split()
    b_words = "zqx wvu jkl pqr mno stu bcd fgh zzz qqq vvv".split()

    def doc(words, i, n=40):
        return " ".join(words[(i + j) % len(words)] for j in range(n))

    raw = [(i, "A", doc(a_words, i)) for i in range(30)] + [
        (100 + i, "B", doc(b_words, i)) for i in range(30)
    ]
    target = [(1000 + i, doc(a_words, 7 * i + 3)) for i in range(10)]
    raw_df = spark.createDataFrame(raw, "doc_id long, grp string, text string")
    tgt_df = spark.createDataFrame(target, "doc_id long, text string")
    return raw_df, tgt_df


def test_dsir_prefers_target_like_docs(spark):
    from security_log_analysis_rust_spark.textops.dsir import dsir_select

    raw_df, tgt_df = _bimodal(spark)
    sel = dsir_select(raw_df.select("doc_id", "text"), tgt_df, k=20)
    picked = {r.doc_id for r in sel.collect()}
    n_target_like = sum(1 for i in picked if i < 100)
    assert len(picked) == 20
    assert n_target_like >= 17, (
        f"only {n_target_like}/20 selected docs are target-like"
    )


def test_dsir_bimodal_oracle_parity(spark):
    from security_log_analysis_rust_spark.textops.dsir import (
        dsir_select,
        dsir_select_oracle_sql,
    )

    raw_df, tgt_df = _bimodal(spark)
    got = dsir_select(raw_df.select("doc_id", "text"), tgt_df, k=20).toPandas()
    raw_vals = ", ".join(
        f"({r.doc_id}, {r.text!r})" for r in raw_df.collect()
    )
    tgt_vals = ", ".join(
        f"({r.doc_id}, {r.text!r})" for r in tgt_df.collect()
    )
    oracle = duckdb.sql(
        dsir_select_oracle_sql(
            f"SELECT * FROM (VALUES {raw_vals}) AS t(doc_id, text)",
            f"SELECT * FROM (VALUES {tgt_vals}) AS t(doc_id, text)",
            k=20,
        )
    ).df()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)


def test_dsir_partitioning_invariance_and_exclusion(spark):
    from security_log_analysis_rust_spark.textops.dsir import dsir_select
    from pyspark.sql import functions as F

    docs = _docs(spark).select("doc_id", "text")
    extra = spark.createDataFrame(
        [(9001, "solo"), (9002, "")], ["doc_id", "text"]
    )
    pool = docs.unionByName(extra)
    tgt = _docs(spark).filter(F.col("source") == "src1").select(
        "doc_id", "text"
    )
    a = sorted(r.doc_id for r in dsir_select(pool.coalesce(1), tgt, k=40).collect())
    b = sorted(
        r.doc_id for r in dsir_select(pool.repartition(32), tgt, k=40).collect()
    )
    assert a == b
    # <2-token docs have no bigrams and can never be selected
    assert 9001 not in a and 9002 not in a
