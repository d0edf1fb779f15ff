"""ExactSubstr span dedup: hand-checked semantics, DuckDB oracle parity
on two corpora, and partitioning invariance."""

from __future__ import annotations

from util_compare import compare_frames, duck_connection

TESTDATA = "/root/testdata/sf0.001"


def _pages(spark):
    from security_log_analysis_rust_spark.synth import ensure_synthetic

    path = ensure_synthetic(TESTDATA)["pages"]
    return spark.read.parquet(path).select("url", "text"), f"{path}/*.parquet"


def test_exact_substr_hand_semantics(spark):
    from security_log_analysis_rust_spark.textops.exactsubstr import (
        exact_substr_dedup,
    )

    docs = spark.createDataFrame(
        [
            ("a", "a b c d e f g h"),  # first occurrence: untouched
            ("b", "x x a b c d e f g h y y"),  # interior dup span cut
            ("c", "p q r s p q r s p q r s"),  # self-repetition collapses
            ("d", "a b c d e f g h"),  # exact copy: fully removed -> dropped
            ("e", "tiny doc"),  # < L tokens: passes through
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.text, r.n_tokens, r.n_removed)
        for r in exact_substr_dedup(docs, min_len=4).collect()
    }
    assert got["a"] == ("a b c d e f g h", 8, 0)
    assert got["b"] == ("x x y y", 4, 8)
    assert got["c"] == ("p q r s", 4, 8)
    assert "d" not in got  # fully duplicated, below min_tokens_kept
    assert got["e"] == ("tiny doc", 2, 0)


def test_exact_substr_whitespace_normalization(spark):
    from security_log_analysis_rust_spark.textops.exactsubstr import (
        exact_substr_dedup,
    )

    docs = spark.createDataFrame(
        [("a", "  one   two\tthree \n four  ")], ["doc_id", "text"]
    )
    [row] = exact_substr_dedup(docs, min_len=10).collect()
    assert row.text == "one two three four"
    assert row.n_tokens == 4 and row.n_removed == 0


def test_exact_substr_oracle_parity_pages(spark):
    from security_log_analysis_rust_spark.textops.exactsubstr import (
        exact_substr_dedup,
        exact_substr_oracle_sql,
    )

    pages, glob = _pages(spark)
    got = exact_substr_dedup(pages, min_len=8, id_col="url").toPandas()
    con = duck_connection(TESTDATA)
    try:
        oracle = con.sql(
            exact_substr_oracle_sql(
                f"SELECT url, text FROM read_parquet('{glob}')",
                min_len=8,
                id_col="url",
            )
        ).df()
    finally:
        con.close()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)
    # log pages re-send lines: the operator must actually bite
    assert (got["n_removed"] > 0).any(), "no duplicate spans found in pages"


def test_exact_substr_oracle_parity_documents(spark):
    from security_log_analysis_rust_spark.textops.exactsubstr import (
        exact_substr_dedup,
        exact_substr_oracle_sql,
    )

    docs = spark.read.parquet(f"{TESTDATA}/documents.parquet").select(
        "doc_id", "text"
    )
    got = exact_substr_dedup(docs, min_len=3, id_col="doc_id").toPandas()
    con = duck_connection(TESTDATA)
    try:
        oracle = con.sql(
            exact_substr_oracle_sql(
                "SELECT doc_id, text FROM documents", min_len=3
            )
        ).df()
    finally:
        con.close()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)
    assert (got["n_removed"] > 0).any()


def test_exact_substr_partitioning_invariance(spark):
    from security_log_analysis_rust_spark.textops.exactsubstr import (
        exact_substr_dedup,
    )

    pages, _ = _pages(spark)
    a = sorted(
        (r.url, r.text)
        for r in exact_substr_dedup(
            pages.coalesce(1), min_len=8, id_col="url"
        ).collect()
    )
    b = sorted(
        (r.url, r.text)
        for r in exact_substr_dedup(
            pages.repartition(32), min_len=8, id_col="url"
        ).collect()
    )
    assert a == b


def test_decontaminate_hand_semantics(spark):
    from security_log_analysis_rust_spark.textops.exactsubstr import (
        decontaminate,
    )

    docs = spark.createDataFrame(
        [
            ("a", "a b c d e f g h"),
            ("b", "x x a b c d e f g h y y"),
            ("c", "p q r s p q r s p q r s"),
            ("e", "tiny doc"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([("c d e f",)], ["text"])
    got = {
        r.doc_id: (r.text, r.n_tokens, r.n_removed)
        for r in decontaminate(docs, bench, n=4, mode="excise").collect()
    }
    # every contaminated span cut — no first-occurrence exemption
    assert got["a"] == ("a b g h", 4, 4)
    assert got["b"] == ("x x a b g h y y", 8, 4)
    assert got["c"] == ("p q r s p q r s p q r s", 12, 0)
    assert got["e"] == ("tiny doc", 2, 0)
    dropped = {
        r.doc_id: r.text
        for r in decontaminate(docs, bench, n=4, mode="drop").collect()
    }
    assert set(dropped) == {"c", "e"}
    assert dropped["c"] == "p q r s p q r s p q r s"  # text untouched


def test_decontaminate_oracle_parity_pages(spark):
    from security_log_analysis_rust_spark.textops.exactsubstr import (
        decontaminate,
        decontaminate_oracle_sql,
    )

    pages, glob = _pages(spark)
    bench = pages.orderBy("url").limit(3).select("text")
    raw_sql = f"SELECT url, text FROM read_parquet('{glob}')"
    bench_sql = (
        f"SELECT text FROM (SELECT * FROM read_parquet('{glob}') "
        f"ORDER BY url LIMIT 3)"
    )
    con = duck_connection(TESTDATA)
    try:
        for mode in ("excise", "drop"):
            got = decontaminate(
                pages, bench, n=8, mode=mode, id_col="url"
            ).toPandas()
            oracle = con.sql(
                decontaminate_oracle_sql(
                    raw_sql, bench_sql, n=8, mode=mode, id_col="url"
                )
            ).df()
            problems = compare_frames(got, oracle)
            assert not problems, f"{mode}: " + "; ".join(p[:400] for p in problems)
            assert len(got) < pages.count(), f"{mode} must bite"
    finally:
        con.close()
