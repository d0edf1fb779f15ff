"""HTML -> text extraction: hand semantics, Spark-vs-DuckDB parity on
crafted and real (binary) corpora, link-density boilerplate signal."""

from __future__ import annotations

from pyspark.sql import functions as F

from util_compare import compare_frames, duck_connection

TESTDATA = "/root/testdata/sf0.01"

CRAFTED = [
    ("t1", "<html><head><title>T</title><script>var x='<p>';</script>"
           "<style>a{color:red}</style></head>"
           "<body><h1>Header One</h1><p>First para.</p>"
           "<p>Second &amp; third.</p></body></html>"),
    ("t2", "<div>nav</div><ul><li><a href='/x'>Home</a></li>"
           "<li><a href='/y'>About</a></li></ul><p>Tiny body.</p>"),
    ("t3", "plain text, no tags at all"),
    ("t4", "<p>double escape: &amp;lt;kept&amp;gt;</p>"),
    ("t5", "<p>unclosed <b>bold and <i>italic"),
    ("t6", ""),
    ("t7", "<br><br><br><br>spaced<br><br><br>out"),
    ("t8", "<!-- only a comment --><noscript>fallback</noscript>"),
    ("t9", "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>"),
]


def test_html_extract_hand_semantics(spark):
    from security_log_analysis_rust_spark.textops.html import extract_text

    df = spark.createDataFrame(CRAFTED, ["url", "html"])
    out = {r.url: r.extracted_text for r in extract_text(df).collect()}
    assert out["t1"] == "T\nHeader One\nFirst para.\nSecond & third."
    assert "var x" not in out["t1"] and "color:red" not in out["t1"]
    assert out["t3"] == "plain text, no tags at all"
    assert out["t4"] == "double escape: &lt;kept&gt;"  # &amp;lt; -> &lt;
    assert out["t5"] == "unclosed bold and italic"
    assert out["t6"] == ""
    assert out["t7"] == "spaced\n\nout"  # 3+ newlines collapse to 2
    assert out["t8"] == ""
    assert out["t9"] == "a b\nc"


def test_html_extract_oracle_parity_crafted(spark):
    from security_log_analysis_rust_spark.textops.html import (
        extract_text,
        extract_text_oracle_sql,
    )

    df = spark.createDataFrame(CRAFTED, ["url", "html"])
    got = extract_text(df).toPandas()

    rows = " UNION ALL ".join(
        "SELECT '{}' AS url, '{}' AS html".format(u, h.replace("'", "''"))
        for u, h in CRAFTED
    )
    con = duck_connection(TESTDATA)
    try:
        oracle = con.sql(
            extract_text_oracle_sql(rows, html_expr="html")
        ).df()
    finally:
        con.close()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)


def test_html_extract_oracle_parity_real_pages(spark):
    """The real input table's html BINARY column through both engines
    (Spark binary->string cast vs DuckDB decode)."""
    from security_log_analysis_rust_spark.synth import ensure_synthetic
    from security_log_analysis_rust_spark.textops.html import (
        extract_text,
        extract_text_oracle_sql,
    )

    path = ensure_synthetic(TESTDATA)["pages"]
    pages = spark.read.parquet(path).select("url", "html")
    got = extract_text(pages).toPandas()

    con = duck_connection(TESTDATA)
    try:
        oracle = con.sql(
            extract_text_oracle_sql(
                f"SELECT url, html FROM read_parquet('{path}/*.parquet')"
            )
        ).df()
    finally:
        con.close()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)
    assert len(got) == pages.count()
    # the synthetic html wraps 'synthetic page {i}'
    assert got["extracted_text"].str.startswith("synthetic page").all()


def test_link_density_separates_nav_from_body(spark):
    from security_log_analysis_rust_spark.textops.html import extract_text

    df = spark.createDataFrame(
        [
            ("nav", "<ul>" + "".join(
                f"<li><a href='/{i}'>Item number {i}</a></li>"
                for i in range(10)
            ) + "</ul>"),
            ("body", "<p>" + "Long body sentence here. " * 20
             + "</p><a href='/x'>one link</a>"),
        ],
        ["url", "html"],
    )
    out = {r.url: r.link_density for r in extract_text(df).collect()}
    assert out["nav"] > 0.9
    assert out["body"] < 0.1
