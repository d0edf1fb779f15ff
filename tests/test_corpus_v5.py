"""Cross-module composition v5: the FULL raw-crawl-to-training-shards
path — HTML text extraction -> URL dedup -> C4 clean -> quality-
classifier Pareto selection -> deterministic shuffle-shard — certified
end-to-end against ONE nested DuckDB oracle.

The input is the pages table's real text wrapped in noisy HTML (script
junk, nav links, per-line <p> blocks, entity-escaped content — 556 of
1200 sf0.01 pages contain '<' or '&', so the escape->extract->decode
round-trip is exercised on real data, not toy strings). The classifier
is trained on the DOCUMENTS table (src0/src1 as the trusted corpus) and
applied to the page text — the actual GPT-3 configuration: reference-
corpus filter applied cross-corpus to the crawl."""

from __future__ import annotations

from pyspark.sql import functions as F

from util_compare import compare_frames, duck_connection

TESTDATA = "/root/testdata/sf0.01"

_PRE = (
    '<html><head><title>Crawl</title><script>var x = "<p>junk</p>";'
    "</script></head><body><p>"
)
_POST = '</p><a href="/nav">home</a><!-- footer --></body></html>'


def _wrap_spark(text_col):
    esc = F.replace(text_col, F.lit("&"), F.lit("&amp;"))
    esc = F.replace(esc, F.lit("<"), F.lit("&lt;"))
    esc = F.replace(esc, F.lit(">"), F.lit("&gt;"))
    return F.concat(
        F.lit(_PRE), F.regexp_replace(esc, r"\n", "</p><p>"), F.lit(_POST)
    )


def _wrap_sql(expr: str) -> str:
    esc = f"replace(replace(replace({expr}, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    pre = _PRE.replace("'", "''")
    post = _POST.replace("'", "''")
    return f"'{pre}' || regexp_replace({esc}, '\\n', '</p><p>', 'g') || '{post}'"


def test_corpus_v5_full_path_oracle_parity(spark):
    from security_log_analysis_rust_spark.synth import ensure_synthetic
    from security_log_analysis_rust_spark.textops.c4 import (
        c4_clean,
        c4_clean_oracle_sql,
    )
    from security_log_analysis_rust_spark.textops.classifier import (
        pareto_select,
        pareto_select_oracle_sql,
        score_docs_classifier,
        score_oracle_sql,
        train_classifier,
    )
    from security_log_analysis_rust_spark.textops.domains import (
        url_dedup,
        url_dedup_oracle_sql,
    )
    from security_log_analysis_rust_spark.textops.html import (
        extract_text,
        extract_text_oracle_sql,
    )
    from security_log_analysis_rust_spark.textops.shard import (
        shuffle_shards,
        shuffle_shards_oracle_sql,
    )

    path = ensure_synthetic(TESTDATA)["pages"]
    glob = f"{path}/*.parquet"

    # stage 0 (shared artifact both sides): the trusted-corpus filter
    docs = spark.read.parquet(f"{TESTDATA}/documents.parquet")
    model = train_classifier(
        docs.withColumn(
            "label", F.col("source").isin("src0", "src1").cast("int")
        ),
        dim=4096, lr=2.0, iters=5, l2=1e-4,
    )

    # ---- Spark side ----
    pages = spark.read.parquet(path).select("url", "text")
    # raw crawl: real text wrapped in noisy HTML + tracking-param url dups
    crawl = pages.select(
        "url", _wrap_spark(F.col("text")).alias("html")
    ).unionByName(
        pages.orderBy("url").limit(80).select(
            F.concat("url", F.lit("?utm_source=v5#f")).alias("url"),
            _wrap_spark(F.col("text")).alias("html"),
        )
    )
    extracted = extract_text(crawl, html_col="html").select(
        "url", F.col("extracted_text").alias("text")
    )
    deduped = url_dedup(extracted)
    cleaned = c4_clean(
        deduped, id_col="url", min_words=1, min_lines=1,
        require_terminal_punct=False, ban_brace=False, policy_markers=(),
    )
    selected = pareto_select(
        score_docs_classifier(cleaned, model, id_col="url", text_col="text"),
        id_col="url",
    )
    got = shuffle_shards(selected, n_shards=4, id_col="url", salt="v5").toPandas()

    # ---- oracle: ONE nested DuckDB query over the same five stages ----
    crawl_sql = f"""
SELECT url, {_wrap_sql('text')} AS html FROM read_parquet('{glob}')
UNION ALL
SELECT url || '?utm_source=v5#f', {_wrap_sql('text')} AS html
FROM (SELECT * FROM read_parquet('{glob}') ORDER BY url LIMIT 80)
"""
    ext_sql = (
        "SELECT url, extracted_text AS text FROM ("
        + extract_text_oracle_sql(crawl_sql, html_expr="html")
        + ")"
    )
    dedup_sql = f"""
SELECT d.url, s.text FROM ({url_dedup_oracle_sql(ext_sql)}) d
JOIN ({ext_sql}) s USING (url)
"""
    c4_sql = c4_clean_oracle_sql(
        dedup_sql, id_col="url", min_words=1, min_lines=1,
        require_terminal_punct=False, ban_brace=False, policy_markers=(),
    )
    sel_sql = pareto_select_oracle_sql(
        score_oracle_sql(f"SELECT url, text FROM ({c4_sql})", model,
                         id_col="url"),
        id_col="url",
    )
    final_sql = shuffle_shards_oracle_sql(
        sel_sql, n_shards=4, id_col="url", salt="v5"
    )

    con = duck_connection(TESTDATA)
    try:
        oracle = con.sql(final_sql).df()
    finally:
        con.close()

    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)

    # every stage bites on real data
    assert crawl.count() == 1280          # 1200 pages + 80 variants
    assert deduped.count() == 1200        # URL stage drops the variants
    n_sel = len(got)
    assert 0 < n_sel < 1200               # Pareto selection drops most
    # extraction recovered real content: the nav line survived block
    # separation and entity-escaped text round-tripped (spot-check one)
    one = extracted.orderBy("url").limit(1).collect()[0]
    assert one.text.endswith("\nhome")
    assert "Crawl" == one.text.split("\n")[0]
    amp = pages.filter(F.col("text").contains("&")).orderBy("url").limit(1)
    row = amp.collect()
    if row:
        u = row[0].url
        back = extracted.filter(F.col("url") == u).collect()[0].text
        assert "&" in back and "&amp;" not in back