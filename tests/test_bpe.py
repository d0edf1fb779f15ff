"""Distributed BPE training: differential vs a from-scratch reference
trainer, word-count oracle parity, encode round-trip properties,
partitioning invariance, and the stop condition."""

from __future__ import annotations

from pyspark.sql import functions as F

from util_compare import compare_frames, duck_connection

TESTDATA = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{TESTDATA}/documents.parquet").select(
        "doc_id", "text"
    )


def test_word_counts_oracle_parity(spark):
    from security_log_analysis_rust_spark.textops.bpe import word_counts

    got = word_counts(_docs(spark)).toPandas()
    con = duck_connection(TESTDATA)
    try:
        oracle = con.sql(
            r"""
            SELECT word, CAST(count(*) AS BIGINT) AS n FROM (
              SELECT unnest(list_filter(
                string_split_regex(text, '\s+'), t -> t <> '')) AS word
              FROM documents
            ) GROUP BY word
            """
        ).df()
    finally:
        con.close()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)


def test_bpe_train_matches_reference_documents(spark):
    from security_log_analysis_rust_spark.textops.bpe import (
        bpe_train,
        bpe_train_reference,
        word_counts,
    )

    docs = _docs(spark)
    got = bpe_train(docs, n_merges=30)
    wc = {r.word: r.n for r in word_counts(docs).collect()}
    want = bpe_train_reference(wc, n_merges=30)
    assert got == want
    assert len(got) == 30, "tiny vocab must still sustain 30 merges"


def test_bpe_train_matches_reference_pages(spark):
    from security_log_analysis_rust_spark.synth import ensure_synthetic
    from security_log_analysis_rust_spark.textops.bpe import (
        bpe_train,
        bpe_train_reference,
        word_counts,
    )

    pages = (
        spark.read.parquet(ensure_synthetic(TESTDATA)["pages"])
        .select("text")
        .limit(120)
    )
    got = bpe_train(pages, n_merges=12)
    wc = {r.word: r.n for r in word_counts(pages).collect()}
    want = bpe_train_reference(wc, n_merges=12)
    assert got == want
    assert len(got) == 12


def test_bpe_train_partitioning_invariance(spark):
    from security_log_analysis_rust_spark.textops.bpe import bpe_train

    docs = _docs(spark)
    a = bpe_train(docs.coalesce(1), n_merges=8)
    b = bpe_train(docs.repartition(32), n_merges=8, checkpoint_every=2)
    assert a == b


def test_bpe_train_stop_condition(spark):
    from security_log_analysis_rust_spark.textops.bpe import bpe_train

    docs = spark.createDataFrame(
        [(1, "ab cd"), (2, "ef gh")], ["doc_id", "text"]
    )
    # every adjacent pair occurs once: nothing reaches min_pair_count=2
    assert bpe_train(docs, n_merges=5) == []


def test_bpe_encode_properties(spark):
    from security_log_analysis_rust_spark.textops.bpe import (
        EOW,
        bpe_encode,
        bpe_train,
        word_counts,
    )

    docs = _docs(spark)
    merges = bpe_train(docs, n_merges=40)
    enc = bpe_encode(docs.limit(50), merges).collect()
    assert all(r.n_bpe_tokens == len(r.tokens) for r in enc)
    for r in enc:
        # concatenating a document's BPE tokens reproduces its words
        joined = "".join(r.tokens).replace(EOW, " ").split()
        [orig] = [d.text for d in docs.filter(F.col("doc_id") == r.doc_id).collect()]
        assert joined == orig.split()
    # the most frequent training word must be fully merged by 40 rounds
    top = word_counts(docs).orderBy(F.desc("n"), "word").first().word
    one = spark.createDataFrame([(0, top)], ["doc_id", "text"])
    [row] = bpe_encode(one, merges).collect()
    assert row.tokens == [top + EOW], row.tokens
