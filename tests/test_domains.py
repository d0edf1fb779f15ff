"""Per-domain stats/caps + mixture thinning: oracle parity, determinism,
and exact-proportion checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from util_compare import compare_frames, duck_connection

TESTDATA = "/root/testdata/sf0.001"
TESTDATA_ORACLE = "/root/testdata/sf0.01"


def _pages(spark):
    from security_log_analysis_rust_spark.synth import ensure_synthetic

    path = ensure_synthetic(TESTDATA)["pages"]
    return spark.read.parquet(path).select("url", "text"), f"{path}/*.parquet"


def test_domain_stats_oracle_parity(spark):
    from security_log_analysis_rust_spark.textops.domains import (
        domain_stats,
        domain_stats_oracle_sql,
    )

    pages, glob = _pages(spark)
    got = domain_stats(pages).toPandas()
    con = duck_connection(TESTDATA)
    try:
        oracle = con.sql(domain_stats_oracle_sql(glob)).df()
    finally:
        con.close()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)
    assert (got["domain"].str.len() > 0).all(), "every url must yield a host"


def test_cap_per_domain_oracle_parity_and_semantics(spark):
    from security_log_analysis_rust_spark.textops.domains import (
        cap_per_domain,
        cap_per_domain_oracle_sql,
        domain_col,
    )

    pages, glob = _pages(spark)
    cap = 7
    got_df = cap_per_domain(pages, cap)
    got = got_df.select("url").toPandas()
    con = duck_connection(TESTDATA)
    try:
        oracle = con.sql(cap_per_domain_oracle_sql(glob, cap)).df()
    finally:
        con.close()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)
    # no domain exceeds the cap; capped domains keep exactly `cap`
    before = {
        r.domain: r.n
        for r in pages.groupBy(domain_col(F.col("url")).alias("domain"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    after = {
        r.domain: r.n
        for r in got_df.groupBy(domain_col(F.col("url")).alias("domain"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert all(n <= cap for n in after.values())
    for d, n in before.items():
        assert after.get(d, 0) == min(n, cap)


def test_cap_per_domain_partitioning_invariance(spark):
    from security_log_analysis_rust_spark.textops.domains import cap_per_domain

    pages, _ = _pages(spark)
    a = sorted(r.url for r in cap_per_domain(pages.coalesce(1), 3).collect())
    b = sorted(r.url for r in cap_per_domain(pages.repartition(32), 3).collect())
    assert a == b and a, "cap selection must be partition-invariant"


def test_mixture_thin_oracle_parity_and_rates(spark):
    from security_log_analysis_rust_spark.textops.domains import (
        mixture_thin,
        mixture_thin_oracle_sql,
    )

    docs = spark.read.parquet(f"{TESTDATA_ORACLE}/documents.parquet")
    sources = sorted(r.source for r in docs.select("source").distinct().collect())
    rates = {sources[0]: 0.25, sources[1]: 0.0, sources[2]: 1.0}
    got = mixture_thin(docs, rates).select("doc_id", "source").toPandas()
    con = duck_connection(TESTDATA_ORACLE)
    try:
        oracle = con.sql(
            mixture_thin_oracle_sql(
                "SELECT doc_id, source FROM documents", rates
            )
        ).df()
    finally:
        con.close()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)

    # rate-0 source vanishes, rate-1 and unlisted sources keep everything,
    # fractional source lands near its rate
    before = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    after = dict(got.groupby("source").size().items())
    assert after.get(sources[1], 0) == 0
    assert after[sources[2]] == before[sources[2]]
    for s in sources[3:]:
        assert after[s] == before[s]
    frac = after[sources[0]] / before[sources[0]]
    assert 0.1 <= frac <= 0.4, f"thinned fraction {frac} far from 0.25"


def test_mixture_thin_is_append_stable(spark):
    """A row's fate is independent of what else is in the frame: thinning
    the union equals the union of thinnings (the property that lets a
    100 TB pipeline thin month-shards independently)."""
    from security_log_analysis_rust_spark.textops.domains import mixture_thin

    docs = spark.read.parquet(f"{TESTDATA_ORACLE}/documents.parquet").select(
        "doc_id", "source"
    )
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    rates = {"web": 0.5, "wiki": 0.3}
    whole = sorted(r.doc_id for r in mixture_thin(docs, rates).collect())
    parts = sorted(
        r.doc_id
        for part in (a, b)
        for r in mixture_thin(part, rates).collect()
    )
    assert whole == parts


def test_canonical_url_hand_cases(spark):
    from security_log_analysis_rust_spark.textops.domains import (
        canonical_url_col,
    )
    from pyspark.sql import functions as F

    cases = [
        ("HTTP://Example.COM:80/a/b/?utm_source=x&q=1#frag",
         "http://example.com/a/b?q=1"),
        ("https://example.com:443/", "https://example.com/"),
        ("https://example.com", "https://example.com/"),
        ("https://example.com/a?utm_source=1&utm_medium=2",
         "https://example.com/a"),
        ("ftp://Host:21/x", "ftp://host:21/x"),  # non-http port kept
        ("not a url", "not a url"),  # unparseable passes through
        ("https://example.com/a?fbclid=abc&b=2&a=1",
         "https://example.com/a?b=2&a=1"),  # survivor order preserved
        ("https://example.com/a///", "https://example.com/a"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = {
        r.url: r.c
        for r in df.select("url", canonical_url_col(F.col("url")).alias("c")).collect()
    }
    for raw, want in cases:
        assert got[raw] == want, f"{raw!r}: {got[raw]!r} != {want!r}"


def test_url_dedup_oracle_parity_and_semantics(spark):
    import duckdb

    from security_log_analysis_rust_spark.textops.domains import (
        url_dedup,
        url_dedup_oracle_sql,
    )

    # synthetic pages plus crafted variants that canonicalize identically
    pages, _ = _pages(spark)
    variants = pages.limit(40).selectExpr(
        "concat(url, '?utm_source=feed#top') AS url", "text"
    )
    upper = pages.limit(10).selectExpr(
        "concat('HTTPS', substring(url, 6)) AS url", "text"
    )
    corpus = pages.unionByName(variants).unionByName(upper)
    got_df = url_dedup(corpus)
    got = got_df.select("url").toPandas()
    rows = [(r.url,) for r in corpus.select("url").collect()]
    values = ", ".join(f"({u!r})" for (u,) in rows)
    oracle = duckdb.sql(
        url_dedup_oracle_sql(f"SELECT * FROM (VALUES {values}) AS t(url)")
    ).df()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)
    # every crafted variant collapsed onto its base: count unchanged
    assert got_df.count() == pages.count()
    # survivor is the order_cols minimum (raw url: 'HTTPS...' < 'https...')
    kept = set(got["url"])
    for r in upper.select("url").collect():
        assert r.url in kept


def test_url_dedup_partitioning_invariance(spark):
    from security_log_analysis_rust_spark.textops.domains import url_dedup

    pages, _ = _pages(spark)
    corpus = pages.unionByName(
        pages.limit(25).selectExpr("concat(url, '#x') AS url", "text")
    )
    a = sorted(r.url for r in url_dedup(corpus.coalesce(1)).collect())
    b = sorted(r.url for r in url_dedup(corpus.repartition(32)).collect())
    assert a == b
