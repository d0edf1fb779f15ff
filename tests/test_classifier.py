"""fastText-style quality classifier: distributed-GD-vs-numpy parity,
separable-signal learning, oracle-paired scoring and Pareto selection."""

from __future__ import annotations

from pyspark.sql import functions as F

from util_compare import compare_frames, duck_connection

TESTDATA = "/root/testdata/sf0.01"
DIM = 4096


def _toy_docs(spark):
    # 12 separable docs: positives speak 'excellent prose', negatives
    # 'spam junk'; shared filler tokens in both classes.
    rows = []
    for i in range(6):
        rows.append((i, f"excellent prose clear filler{i % 3} common", 1))
    for i in range(6, 12):
        rows.append((i, f"spam junk click filler{i % 3} common", 0))
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def test_train_matches_numpy_reference(spark):
    from security_log_analysis_rust_spark.textops.classifier import (
        doc_features,
        train_classifier,
        train_classifier_reference,
    )

    docs = _toy_docs(spark)
    got = train_classifier(docs, dim=DIM, lr=1.0, iters=8, l2=1e-3)

    feat_rows = [
        (r.doc_id, r.idx, r.val)
        for r in doc_features(docs, dim=DIM).collect()
    ]
    label_rows = [(r.doc_id, r.label) for r in docs.collect()]
    want = train_classifier_reference(
        feat_rows, label_rows, dim=DIM, lr=1.0, iters=8, l2=1e-3
    )

    assert set(got.weights) == set(want.weights)
    for i in got.weights:
        assert abs(got.weights[i] - want.weights[i]) < 1e-9, i
    assert abs(got.bias - want.bias) < 1e-9


def test_classifier_learns_separable_signal(spark):
    from security_log_analysis_rust_spark.textops.classifier import (
        score_docs_classifier,
        train_classifier,
    )

    docs = _toy_docs(spark)
    model = train_classifier(docs, dim=DIM, lr=4.0, iters=30, l2=0.0)
    held_out = spark.createDataFrame(
        [
            (100, "excellent clear prose common"),
            (101, "junk spam click common"),
        ],
        ["doc_id", "text"],
    )
    scores = {
        r.doc_id: r.score
        for r in score_docs_classifier(held_out, model).collect()
    }
    assert scores[100] > 0.5 > scores[101]
    assert scores[100] - scores[101] > 0.3


def test_score_oracle_parity_sf001(spark):
    """Train on sf0.01 documents (label = source src0/src1), score ALL
    documents; the DuckDB twin re-derives features + scores from the
    pinned weights — bit-exact at 6 decimals."""
    from security_log_analysis_rust_spark.textops.classifier import (
        score_docs_classifier,
        score_oracle_sql,
        train_classifier,
    )

    docs = spark.read.parquet(f"{TESTDATA}/documents.parquet")
    train = docs.withColumn(
        "label", F.col("source").isin("src0", "src1").cast("int")
    )
    model = train_classifier(train, dim=DIM, lr=2.0, iters=5, l2=1e-4)
    assert len(model.weights) > 20  # the table's full vocabulary reached the model

    got = score_docs_classifier(docs, model).toPandas()
    con = duck_connection(TESTDATA)
    try:
        oracle = con.sql(
            score_oracle_sql("SELECT doc_id, text FROM documents", model)
        ).df()
    finally:
        con.close()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)
    assert len(got) == 500


def test_pareto_select_composed_oracle_parity(spark):
    """score -> pareto_select composed end-to-end against the composed
    SQL twin (scoring CTE nested inside the selection query)."""
    from security_log_analysis_rust_spark.textops.classifier import (
        pareto_select,
        pareto_select_oracle_sql,
        score_docs_classifier,
        score_oracle_sql,
        train_classifier,
    )

    docs = spark.read.parquet(f"{TESTDATA}/documents.parquet")
    train = docs.withColumn(
        "label", F.col("source").isin("src0", "src1").cast("int")
    )
    model = train_classifier(train, dim=DIM, lr=2.0, iters=5, l2=1e-4)

    kept = pareto_select(score_docs_classifier(docs, model)).toPandas()
    con = duck_connection(TESTDATA)
    try:
        oracle = con.sql(
            pareto_select_oracle_sql(
                score_oracle_sql("SELECT doc_id, text FROM documents", model)
            )
        ).df()
    finally:
        con.close()
    problems = compare_frames(kept, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)
    # the rule keeps the high-score head plus a stochastic tail: strictly
    # fewer than all docs, strictly more than the score>0.5 hard cut
    assert 0 < len(kept) < 500


def test_empty_docs_excluded_everywhere(spark):
    from security_log_analysis_rust_spark.textops.classifier import (
        doc_features,
        score_docs_classifier,
        train_classifier,
    )

    docs = spark.createDataFrame(
        [(0, "alpha beta", 1), (1, "   ", 0), (2, "", 0), (3, "gamma", 0)],
        ["doc_id", "text", "label"],
    )
    assert doc_features(docs, dim=DIM).filter(
        F.col("doc_id").isin(1, 2)
    ).count() == 0
    model = train_classifier(docs, dim=DIM, iters=2)
    scored = score_docs_classifier(docs, model)
    assert sorted(r.doc_id for r in scored.collect()) == [0, 3]


def test_scoring_plan_broadcasts_weights(spark):
    """The weight join must be a broadcast — a shuffle join on the weight
    table would shuffle the full feature table at corpus scale."""
    from security_log_analysis_rust_spark.textops.classifier import (
        LinearClassifier,
        score_docs_classifier,
    )

    import contextlib
    import io

    docs = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
    model = LinearClassifier(weights={1: 0.5, 2: -0.25}, bias=0.1, dim=DIM)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        score_docs_classifier(docs, model).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
