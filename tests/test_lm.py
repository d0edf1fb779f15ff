"""Bigram-LM perplexity scoring: oracle parity (self-scored, held-out,
and pruned-model variants), backoff semantics, and hand-checked math."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from util_compare import compare_frames, duck_connection

TESTDATA = "/root/testdata/sf0.01"


def _parity(spark, train_pred, score_pred, max_bigrams=None):
    from security_log_analysis_rust_spark.textops.lm import (
        score_docs,
        score_docs_oracle_sql,
        train_bigram_lm,
    )

    docs = spark.read.parquet(f"{TESTDATA}/documents.parquet")
    train = docs.filter(train_pred)
    score = docs.filter(score_pred)
    lm = train_bigram_lm(train, max_bigrams=max_bigrams)
    got = score_docs(score, lm).toPandas()

    t_sql = f"SELECT doc_id, text FROM documents WHERE {train_pred}"
    s_sql = f"SELECT doc_id, text FROM documents WHERE {score_pred}"
    con = duck_connection(TESTDATA)
    try:
        oracle = con.sql(
            score_docs_oracle_sql(t_sql, s_sql, max_bigrams=max_bigrams)
        ).df()
    finally:
        con.close()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)
    return got


def test_lm_self_scored_oracle_parity(spark):
    got = _parity(spark, "doc_id >= 0", "doc_id >= 0")
    assert len(got) == 500


def test_lm_held_out_oracle_parity_exercises_backoff(spark):
    """Train on even ids, score odd ids — unseen bigrams and unseen
    predecessors both occur (verified), so the smoothing AND 1/V backoff
    paths are certified, not just the seen-pair path."""
    from security_log_analysis_rust_spark.textops.lm import (
        doc_bigrams,
        train_bigram_lm,
    )

    got = _parity(spark, "doc_id % 2 = 0", "doc_id % 2 = 1")
    assert len(got) == 250

    docs = spark.read.parquet(f"{TESTDATA}/documents.parquet")
    lm = train_bigram_lm(docs.filter("doc_id % 2 = 0"))
    held = doc_bigrams(docs.filter("doc_id % 2 = 1"))
    unseen_pairs = held.join(lm.bigrams, ["w1", "w2"], "left_anti").count()
    assert unseen_pairs > 0, "held-out set must contain unseen bigrams"


def test_lm_pruned_model_oracle_parity(spark):
    _parity(spark, "doc_id >= 0", "doc_id < 50", max_bigrams=200)


def test_lm_hand_checked_math(spark):
    """Tiny corpus where every probability is checkable by hand."""
    from security_log_analysis_rust_spark.textops.lm import (
        score_docs,
        train_bigram_lm,
    )

    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], ["doc_id", "text"]
    )
    # bigrams: (a,b)x2? doc1: a b, b a, a b -> (a,b):2 (b,a):1; doc2: a b, b c
    # c12: (a,b)=3 (b,a)=1 (b,c)=1 ; c1: a=3, b=2 ; V = 3 (a,b,c)
    lm = train_bigram_lm(train)
    assert lm.vocab_size == 3
    c12 = {(r.w1, r.w2): r.c12 for r in lm.bigrams.collect()}
    assert c12 == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}

    score = spark.createDataFrame([(9, "a b z q")], ["doc_id", "text"])
    row = score_docs(score, lm).collect()[0]
    # p(b|a) = (3+1)/(3+3) ; p(z|b) = (0+1)/(2+3) ; p(q|z): z unseen -> 1/3
    expected = -(math.log(4 / 6) + math.log(1 / 5) + math.log(1 / 3)) / 3
    assert row.n_bigrams == 3
    assert abs(row.avg_neg_logp - round(expected, 6)) < 1e-9


def test_lm_scores_separate_clean_from_shuffled(spark):
    """Sanity: a doc made of in-domain text scores lower (less surprising)
    than one of rare-token soup under a model of the corpus."""
    from security_log_analysis_rust_spark.textops.lm import (
        score_docs,
        train_bigram_lm,
    )

    docs = spark.read.parquet(f"{TESTDATA}/documents.parquet")
    lm = train_bigram_lm(docs)
    typical = docs.orderBy("doc_id").limit(1).select("doc_id", "text")
    soup = spark.createDataFrame(
        [(999999, "zq xv qwk vvj zzt plm qqa wox")], ["doc_id", "text"]
    )
    t = score_docs(typical, lm).collect()[0].avg_neg_logp
    s = score_docs(soup, lm).collect()[0].avg_neg_logp
    assert t < s, (t, s)
