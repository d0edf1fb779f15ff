"""C4-style cleanup + corpus-global line dedup: oracle parity and rules.

The prose corpus is generated deterministically in-test (seeded) so the
rule set (terminal punctuation, min words, brace/marker bans, global
first-occurrence dedup) is exercised on data that actually has sentences;
the log-mode variant is certified against the synthetic pages table the
pipeline queries use.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest

from util_compare import compare_frames, duck_connection

TESTDATA = "/root/testdata/sf0.001"

WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa river stone "
    "cloud ember quartz willow harbor meadow signal vector tensor matrix"
).split()

BOILERPLATE = 'All rights reserved worldwide."'
LOREM = "Lorem ipsum dolor sit amet."
BRACED = "function f() { return 1; }"
NO_PUNCT = "this line never ends with punctuation"
SHORT = "ok."


def _prose_corpus(n_docs: int = 120, seed: int = 42) -> pd.DataFrame:
    rng = random.Random(seed)

    def sentence():
        n = rng.randint(1, 8)
        body = " ".join(rng.choice(WORDS) for _ in range(n))
        return body + rng.choice(['.', '!', '?', '"', ""])

    rows = []
    for doc_id in range(n_docs):
        lines = [sentence() for _ in range(rng.randint(3, 12))]
        # inject rule-triggering lines at deterministic spots
        if doc_id % 3 == 0:
            lines.insert(rng.randrange(len(lines) + 1), BOILERPLATE)
        if doc_id % 7 == 0:
            lines.insert(rng.randrange(len(lines) + 1), LOREM)
        if doc_id % 5 == 0:
            lines.insert(rng.randrange(len(lines) + 1), BRACED)
        if doc_id % 4 == 0:
            lines.insert(rng.randrange(len(lines) + 1), NO_PUNCT)
        if doc_id % 6 == 0:
            lines.insert(rng.randrange(len(lines) + 1), SHORT)
        rows.append((doc_id, "\n".join(lines)))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_c4_clean_oracle_parity_prose(spark):
    from security_log_analysis_rust_spark.textops.c4 import (
        c4_clean,
        c4_clean_oracle_sql,
    )

    pdf = _prose_corpus()
    docs = spark.createDataFrame(pdf)
    got = c4_clean(docs).toPandas()

    con = duck_connection(TESTDATA)
    try:
        con.register("c4src", pdf)
        oracle = con.sql(
            c4_clean_oracle_sql("SELECT doc_id, text FROM c4src")
        ).df()
    finally:
        con.close()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)


def test_c4_rules_enforced(spark):
    from security_log_analysis_rust_spark.textops.c4 import c4_clean

    pdf = _prose_corpus()
    docs = spark.createDataFrame(pdf)
    out = c4_clean(docs).collect()
    assert out, "cleaned corpus must be non-empty"
    all_lines = [ln for r in out for ln in r.text.split("\n")]
    # per-line rules
    assert all(ln[-1] in '.!?"' for ln in all_lines)
    assert all("{" not in ln for ln in all_lines)
    assert all("lorem ipsum" not in ln.lower() for ln in all_lines)
    assert all(len(ln.split()) >= 3 for ln in all_lines)
    # global dedup: the injected boilerplate appears at most once corpus-wide
    assert sum(1 for ln in all_lines if ln == BOILERPLATE) == 1
    # ... and survives in the lexicographically-first (doc_id, line_no) doc
    first_doc = min(
        (doc_id, text.split("\n").index(BOILERPLATE))
        for doc_id, text in pdf.itertuples(index=False)
        if BOILERPLATE in text.split("\n")
    )[0]
    keeper = [r.doc_id for r in out if BOILERPLATE in r.text.split("\n")]
    assert keeper == [first_doc]
    # per-doc rule: every surviving doc kept >= 3 lines
    assert all(r.n_lines >= 3 and len(r.text.split("\n")) == r.n_lines for r in out)


def test_c4_dedup_partitioning_invariance(spark):
    """Same answer at 1 partition and 32 partitions — the global-first
    tie-break is data-deterministic, not partition-deterministic."""
    from security_log_analysis_rust_spark.textops.c4 import c4_clean

    pdf = _prose_corpus(n_docs=60, seed=7)
    docs = spark.createDataFrame(pdf)
    a = sorted(
        (r.doc_id, r.text) for r in c4_clean(docs.coalesce(1)).collect()
    )
    b = sorted(
        (r.doc_id, r.text) for r in c4_clean(docs.repartition(32)).collect()
    )
    assert a == b


def test_c4_log_mode_oracle_parity_pages(spark):
    """Log-pipeline variant (no punctuation gate) over the synthetic pages
    table: global dedup of re-sent log lines, certified vs DuckDB."""
    from security_log_analysis_rust_spark.synth import ensure_synthetic
    from security_log_analysis_rust_spark.textops.c4 import (
        c4_clean,
        c4_clean_oracle_sql,
    )

    pages_path = ensure_synthetic(TESTDATA)["pages"]
    pages = spark.read.parquet(pages_path).select("url", "text")
    got = c4_clean(
        pages,
        id_col="url",
        min_words=1,
        min_lines=1,
        require_terminal_punct=False,
        ban_brace=False,
        policy_markers=(),
    ).toPandas()

    con = duck_connection(TESTDATA)
    try:
        oracle = con.sql(
            c4_clean_oracle_sql(
                f"SELECT url, text FROM read_parquet('{pages_path}/*.parquet')",
                id_col="url",
                min_words=1,
                min_lines=1,
                require_terminal_punct=False,
                ban_brace=False,
                policy_markers=(),
            )
        ).df()
    finally:
        con.close()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)


def test_c4_plan_shape(spark):
    """Exactly two hash exchanges end-to-end: line-text dedup + doc
    reassembly. The explode and filters stay narrow."""
    from security_log_analysis_rust_spark.textops.c4 import c4_clean

    docs = spark.createDataFrame(_prose_corpus(n_docs=10))
    plan = c4_clean(docs)._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, f"expected <=2 shuffles, saw {n_exchanges}:\n{plan[:2000]}"
