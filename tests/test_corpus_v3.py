"""Cross-module composition v3: URL dedup -> C4 clean -> ExactSubstr span
dedup, certified end-to-end against one nested DuckDB oracle — the
dedup-stack ordering real corpus builds run (RefinedWeb: URL-level first,
then line-level boilerplate, then substring-level).

Each stage is oracle-certified alone; this certifies the COMPOSITION so
stage-boundary contracts (id column naming, text normalization,
determinism) can't drift apart silently."""

from __future__ import annotations

from util_compare import compare_frames, duck_connection

TESTDATA = "/root/testdata/sf0.01"
MIN_LEN = 8


def test_corpus_v3_composed_oracle_parity(spark):
    from security_log_analysis_rust_spark.synth import ensure_synthetic
    from security_log_analysis_rust_spark.textops.c4 import (
        c4_clean,
        c4_clean_oracle_sql,
    )
    from security_log_analysis_rust_spark.textops.domains import (
        canonical_url_oracle_expr,
        url_dedup,
    )
    from security_log_analysis_rust_spark.textops.exactsubstr import (
        exact_substr_dedup,
        exact_substr_oracle_sql,
    )

    path = ensure_synthetic(TESTDATA)["pages"]
    pages = spark.read.parquet(path).select("url", "text")
    # make the URL stage bite: tracking-param variants of the first 60 urls
    corpus = pages.unionByName(
        pages.orderBy("url")
        .limit(60)
        .selectExpr("concat(url, '?utm_source=feed') AS url", "text")
    )

    deduped = url_dedup(corpus)
    cleaned = c4_clean(
        deduped,
        id_col="url",
        min_words=1,
        min_lines=1,
        require_terminal_punct=False,
        ban_brace=False,
        policy_markers=(),
    ).select("url", "text")
    final = exact_substr_dedup(cleaned, min_len=MIN_LEN, id_col="url")
    got = final.toPandas()

    n0, n1 = corpus.count(), deduped.count()
    assert n0 > n1 == pages.count(), "URL stage must collapse every variant"
    assert (got["n_removed"] > 0).any(), "substring stage must bite"

    glob = f"{path}/*.parquet"
    base_sql = (
        f"SELECT url, text FROM read_parquet('{glob}') UNION ALL "
        f"SELECT url || '?utm_source=feed' AS url, text "
        f"FROM (SELECT * FROM read_parquet('{glob}') ORDER BY url LIMIT 60)"
    )
    dedup_sql = (
        "SELECT url, text FROM ("
        "SELECT url, text, row_number() OVER ("
        f"PARTITION BY {canonical_url_oracle_expr('url')} ORDER BY url) AS rn "
        f"FROM ({base_sql})) WHERE rn = 1"
    )
    c4_sql = c4_clean_oracle_sql(
        dedup_sql,
        id_col="url",
        min_words=1,
        min_lines=1,
        require_terminal_punct=False,
        ban_brace=False,
        policy_markers=(),
    )
    final_sql = exact_substr_oracle_sql(
        f"SELECT url, text FROM ({c4_sql})", min_len=MIN_LEN, id_col="url"
    )
    con = duck_connection(TESTDATA)
    try:
        oracle = con.sql(final_sql).df()
    finally:
        con.close()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)
