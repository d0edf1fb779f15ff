"""Cross-module composition v4: quality-classifier Pareto selection ->
budget-planned mixture thinning -> deterministic shuffle-shard output,
certified end-to-end against one nested DuckDB oracle — the SELECTION +
PACKAGING tail of a corpus build (GPT-3-style model filter, token-budget
mixture, training-shard layout), downstream of the v3 dedup stack.

Each stage is oracle-certified alone; this certifies the COMPOSITION so
stage-boundary contracts (id/text column flow, score rounding before the
Pareto comparison, rate quantization, shard/pos determinism) can't drift
apart silently."""

from __future__ import annotations

from pyspark.sql import functions as F

from util_compare import compare_frames, duck_connection

TESTDATA = "/root/testdata/sf0.01"


def test_corpus_v4_composed_oracle_parity(spark):
    from security_log_analysis_rust_spark.textops.classifier import (
        pareto_select,
        pareto_select_oracle_sql,
        score_docs_classifier,
        score_oracle_sql,
        train_classifier,
    )
    from security_log_analysis_rust_spark.textops.domains import (
        mixture_thin,
        mixture_thin_oracle_sql,
        plan_mixture,
    )
    from security_log_analysis_rust_spark.textops.shard import (
        shuffle_shards,
        shuffle_shards_oracle_sql,
    )

    docs = spark.read.parquet(f"{TESTDATA}/documents.parquet").select(
        "doc_id", "source", "text"
    )

    # stage 0 (driver artifact): train the filter on source labels
    model = train_classifier(
        docs.withColumn(
            "label", F.col("source").isin("src0", "src1").cast("int")
        ),
        dim=4096, lr=2.0, iters=5, l2=1e-4,
    )

    # Spark side: select -> thin to a budget -> shard
    selected = pareto_select(
        score_docs_classifier(docs, model)
    ).join(docs, "doc_id")
    avail = {
        r.source: r.n
        for r in selected.groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    budget = int(sum(avail.values()) * 0.6)
    rates = plan_mixture(avail, {s: 1.0 for s in avail}, budget)
    thinned = mixture_thin(selected, rates)
    got = shuffle_shards(
        thinned.select("doc_id", "source"), n_shards=4, salt="v4"
    ).toPandas()

    # oracle: the same three stages as ONE nested DuckDB query
    sel_sql = f"""
SELECT s.doc_id, d.source FROM (
  {pareto_select_oracle_sql(
      score_oracle_sql("SELECT doc_id, text FROM documents", model))}
) s JOIN documents d USING (doc_id)"""
    thin_sql = mixture_thin_oracle_sql(sel_sql, rates)
    final_sql = shuffle_shards_oracle_sql(thin_sql, n_shards=4, salt="v4")

    con = duck_connection(TESTDATA)
    try:
        oracle = con.sql(final_sql).df()
    finally:
        con.close()

    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)

    # every stage bites: selection < corpus, thinning < selection, and the
    # thinned count sits within binomial noise of the planned budget
    n_sel = selected.count()
    assert 0 < n_sel < 500
    assert 0 < len(got) < n_sel
    assert abs(len(got) - budget) < 60
    # shard layout: valid ids, spread over shards, contiguous pos
    assert set(got["shard"]) <= {0, 1, 2, 3}
    assert len(set(got["shard"])) >= 2
    for s, grp in got.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))
