"""Cross-module composition: LM-score gate -> mixture thinning -> sequence
packing, certified end-to-end against one nested DuckDB oracle.

Each stage is already oracle-certified alone; this test certifies the
COMPOSITION — the thing a real corpus build runs — so stage-boundary
contracts (column names, determinism, id stability) can't drift apart
silently."""

from __future__ import annotations

from pyspark.sql import functions as F

from util_compare import compare_frames, duck_connection

TESTDATA = "/root/testdata/sf0.01"
SEQ_LEN = 128
SCORE_MAX = 3.39  # ~median of the sf0.01 score distribution — the gate bites


def test_corpus_v2_composed_oracle_parity(spark):
    from security_log_analysis_rust_spark.textops.domains import (
        mixture_thin,
        mixture_thin_oracle_sql,
    )
    from security_log_analysis_rust_spark.textops.lm import (
        score_docs,
        score_docs_oracle_sql,
        train_bigram_lm,
    )
    from security_log_analysis_rust_spark.textops.pack import (
        pack_sequences,
        pack_sequences_oracle_sql,
    )

    docs = spark.read.parquet(f"{TESTDATA}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    rates = {"src0": 1.0, "src1": 0.4, "src2": 0.0}

    # Spark side: gate by self-trained LM score, thin, pack
    lm = train_bigram_lm(docs)
    gated_ids = score_docs(docs, lm).filter(
        F.col("avg_neg_logp") <= SCORE_MAX
    )
    gated = docs.join(gated_ids.select("doc_id"), "doc_id")
    thinned = mixture_thin(gated, rates)
    packed = pack_sequences(thinned, seq_len=SEQ_LEN)
    got = packed.toPandas()

    n_docs, n_gated, n_thinned = (
        docs.count(),
        gated.count(),
        thinned.count(),
    )
    assert n_docs > n_gated > n_thinned > 0, (n_docs, n_gated, n_thinned)
    assert len(got) == n_thinned

    # Oracle side: the same three stages as nested CTE subqueries
    all_docs = "SELECT doc_id, text FROM documents"
    gate_sql = (
        f"SELECT d.doc_id, d.source, d.text FROM documents d WHERE d.doc_id IN "
        f"(SELECT doc_id FROM ({score_docs_oracle_sql(all_docs, all_docs)}) "
        f"WHERE avg_neg_logp <= {SCORE_MAX!r})"
    )
    thin_sql = mixture_thin_oracle_sql(gate_sql, rates)
    final_sql = pack_sequences_oracle_sql(thin_sql, SEQ_LEN)

    con = duck_connection(TESTDATA)
    try:
        oracle = con.sql(final_sql).df()
    finally:
        con.close()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)
