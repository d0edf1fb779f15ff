"""Per-domain corpus operators: stats, caps, deterministic thinning.

Web-corpus pipelines (RefinedWeb, Dolma, CCNet) treat the URL's domain as
a first-class grouping key: per-domain accounting feeds dataset cards,
per-domain document caps stop a single crawler-friendly site from
dominating the corpus, and per-source deterministic thinning implements
training-mixture weights. All three are expressed here as pure DataFrame
operators whose selection order is **data-deterministic** (md5 of the URL,
reproducible in any engine) rather than partition- or sample()-dependent,
so a re-run — or a different engine — selects the exact same documents.

Scale notes: `domain_stats` is one partial-aggregated shuffle.
`cap_per_domain` is one shuffle (window by domain); the md5 sort is
per-domain, and domains are naturally high-cardinality keys — the hottest
domain in a 100 TB crawl is millions of rows, not billions, and the cap
discards them map-free after one sort. `mixture_thin` is a pure map stage
(no shuffle at all): the keep decision depends only on the row's own id
hash and its source's configured rate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: scheme://HOST[:port]/... -> HOST (lowercased); '' when no match
_HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"
#: last two dot-labels of the host — the eTLD+1 approximation used when no
#: public-suffix list is shipped (site0.example.com -> example.com)
_REG_DOMAIN_RE = "([^.]+\\.[^.]+)$"


def domain_col(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def registered_domain_col(url: Column) -> Column:
    return F.regexp_extract(domain_col(url), _REG_DOMAIN_RE, 1)


def domain_stats(
    pages: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """-> (domain, n_docs, total_chars, avg_chars): dataset-card numbers
    per host. One map-side-combining shuffle."""
    return (
        pages.select(
            domain_col(F.col(url_col)).alias("domain"),
            F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("n"),
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").alias("total_chars"),
            F.round(F.avg("n"), 6).alias("avg_chars"),
        )
    )


def cap_per_domain(
    pages: DataFrame, max_docs: int, url_col: str = "url"
) -> DataFrame:
    """Keep at most ``max_docs`` documents per domain, selected in md5(url)
    order (an unbiased, engine-reproducible shuffle of each domain's docs;
    ties broken by the url itself, so the result is a pure function of the
    data)."""
    w = Window.partitionBy(domain_col(F.col(url_col))).orderBy(
        F.md5(F.col(url_col)), F.col(url_col)
    )
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_docs)
        .drop("_rn")
    )


def mixture_thin(
    df: DataFrame,
    rates: dict,
    source_col: str = "source",
    id_col: str = "doc_id",
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic per-source thinning to training-mixture rates.

    ``rates`` maps source -> keep fraction in [0, 1]; a row survives iff
    its md5(id) bucket (of ``buckets``) falls below ``rate * buckets``.
    Sources absent from ``rates`` keep everything. Pure map — the decision
    is a function of the row alone, so the sample is stable under
    re-partitioning, re-runs, appends, and engine choice (the same
    property `docs_split` relies on)."""
    # same md5-bucket idiom as docs_split, salted ':mix' so the mixture
    # decision is independent of the train/val/test assignment
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":mix"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % buckets
    )
    thresholds = F.create_map(
        *[x for s, r in sorted(rates.items()) for x in (F.lit(s), F.lit(int(round(r * buckets))))]
    )
    thr = F.coalesce(thresholds[F.col(source_col)], F.lit(buckets))
    return df.filter(bucket < thr)


def mixture_thin_oracle_sql(
    source_sql: str,
    rates: dict,
    source_col: str = "source",
    id_col: str = "doc_id",
    buckets: int = 10_000,
) -> str:
    """Independent DuckDB twin of :func:`mixture_thin`."""
    cases = " ".join(
        f"WHEN {source_col} = '{s}' THEN {int(round(r * buckets))}"
        for s, r in sorted(rates.items())
    )
    return f"""
SELECT * FROM ({source_sql})
WHERE CAST(('0x' || substr(md5({id_col}::varchar || ':mix'), 1, 8))::BIGINT
           AS BIGINT) % {buckets}
      < (CASE {cases} ELSE {buckets} END)
"""


def plan_mixture(
    avail: dict,
    weights: dict,
    budget: float,
) -> dict:
    """Token-budget waterfilling: keep rates that realize a target
    mixture under per-source supply constraints.

    ``avail`` maps source -> available tokens, ``weights`` maps source ->
    target mixture proportion (need not sum to 1 — normalized here),
    ``budget`` is the total token budget. Returns source -> keep rate in
    [0, 1] for :func:`mixture_thin`.

    Semantics: take ``min(avail_s, lam * w_s)`` tokens from each source,
    with ``lam`` the unique level at which the takes sum to the budget —
    i.e. the mixture matches the target weights exactly until a source
    runs out of supply, and its unmet demand is re-spread over the
    remaining sources at THEIR relative weights (the standard
    waterfilling solution; DoReMi-style weights plug straight in as
    ``weights``). If the whole corpus is smaller than the budget, every
    rate is 1.0. Driver-side O(S log S) arithmetic on the per-source
    aggregate — the data never moves.
    """
    if budget <= 0:
        return {s: 0.0 for s in avail}
    sources = [s for s in avail if weights.get(s, 0.0) > 0 and avail[s] > 0]
    rates = {s: 0.0 for s in avail}
    if sum(avail[s] for s in sources) <= budget:
        for s in sources:
            rates[s] = 1.0
        return rates
    # sources saturate in order of avail/weight; find the level lam where
    # saturated supply + lam * (active weight mass) == budget
    order = sorted(sources, key=lambda s: (avail[s] / weights[s], s))
    taken = 0.0
    wmass = sum(weights[s] for s in sources)
    for k, s in enumerate(order):
        lam = (budget - taken) / wmass
        if avail[s] / weights[s] >= lam:
            # no further source saturates: everyone active takes lam*w
            for t in order[k:]:
                rates[t] = (lam * weights[t]) / avail[t]
            break
        rates[s] = 1.0
        taken += avail[s]
        wmass -= weights[s]
    return rates


def domain_stats_oracle_sql(pages_glob: str) -> str:
    """Independent DuckDB twin of :func:`domain_stats`."""
    return f"""
SELECT lower(regexp_extract(url, '{_HOST_RE}', 1)) AS domain,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS total_chars,
       round(avg(length(coalesce(text, ''))), 6) AS avg_chars
FROM read_parquet('{pages_glob}')
GROUP BY 1
"""


def cap_per_domain_oracle_sql(pages_glob: str, max_docs: int) -> str:
    """Independent DuckDB twin of :func:`cap_per_domain` (url column only,
    to keep the compared payload engine-neutral)."""
    return f"""
SELECT url FROM (
  SELECT url, row_number() OVER (
    PARTITION BY lower(regexp_extract(url, '{_HOST_RE}', 1))
    ORDER BY md5(url), url
  ) AS rn
  FROM read_parquet('{pages_glob}')
) WHERE rn <= {max_docs}
"""


#: scheme://authority[path][?query] after the fragment is stripped
_URL_PARTS_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://([^/?#]+)([^?#]*)(.*)$"
#: tracking query parameters dropped by canonicalization (CCNet/RefinedWeb
#: treat these as presentation noise, not content identity)
_TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid)($|=)"


def canonical_url_col(url: Column) -> Column:
    """URL canonicalization for URL-level dedup (the CCNet/RefinedWeb
    pre-pass before any content hashing): lowercase scheme and host, strip
    the scheme's default port (:80 / :443), drop the fragment, drop
    tracking query params (utm_*, fbclid, gclid — order of survivors
    preserved), and normalize the path's trailing slashes ('' -> '/',
    '/a/' -> '/a'). Strings that don't parse as scheme://host URLs pass
    through unchanged. Pure JVM expressions — usable inside any filter or
    groupBy without a UDF."""
    nofrag = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, _URL_PARTS_RE, 1))
    authority = F.lower(F.regexp_extract(nofrag, _URL_PARTS_RE, 2))
    host = F.when(
        scheme == "http", F.regexp_replace(authority, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(authority, ":443$", "")
    ).otherwise(authority)
    raw_path = F.regexp_extract(nofrag, _URL_PARTS_RE, 3)
    stripped = F.regexp_replace(raw_path, "/+$", "")
    path = F.when(stripped == "", F.lit("/")).otherwise(stripped)
    raw_q = F.regexp_replace(F.regexp_extract(nofrag, _URL_PARTS_RE, 4), r"^\?", "")
    params = F.filter(
        F.split(raw_q, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
    )
    query = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    canon = F.concat(scheme, F.lit("://"), host, path, query)
    return F.when(scheme == "", url).otherwise(canon)


def url_dedup(
    df: DataFrame, url_col: str = "url", order_cols: list | None = None
) -> DataFrame:
    """Keep one row per canonical URL — the row ranked first by
    ``order_cols`` (default: the raw URL, so the survivor is a pure
    function of the data). One shuffle on the canonical URL, a naturally
    high-cardinality key. Output keeps the input columns unchanged."""
    order_cols = order_cols or [url_col]
    w = Window.partitionBy(canonical_url_col(F.col(url_col))).orderBy(
        *[F.col(c) for c in order_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def canonical_url_oracle_expr(url_expr: str = "url") -> str:
    """Independent DuckDB expression mirroring :func:`canonical_url_col`
    (RE2 regexes + list_filter; no shared code)."""
    re = _URL_PARTS_RE.replace("\\-", "-")
    nofrag = f"regexp_replace({url_expr}, '#.*$', '')"
    scheme = f"lower(regexp_extract({nofrag}, '{re}', 1))"
    auth = f"lower(regexp_extract({nofrag}, '{re}', 2))"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({auth}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({auth}, ':443$', '') "
        f"ELSE {auth} END"
    )
    stripped = f"regexp_replace(regexp_extract({nofrag}, '{re}', 3), '/+$', '')"
    path = f"(CASE WHEN {stripped} = '' THEN '/' ELSE {stripped} END)"
    raw_q = (
        f"regexp_replace(regexp_extract({nofrag}, '{re}', 4), '^\\?', '')"
    )
    params = (
        f"list_filter(string_split({raw_q}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{_TRACKING_PARAM_RE}'))"
    )
    query = (
        f"(CASE WHEN len({params}) > 0 "
        f"THEN '?' || array_to_string({params}, '&') ELSE '' END)"
    )
    return (
        f"(CASE WHEN {scheme} = '' THEN {url_expr} "
        f"ELSE {scheme} || '://' || {host} || {path} || {query} END)"
    )


def url_dedup_oracle_sql(
    source_sql: str, url_col: str = "url", order_cols: list | None = None
) -> str:
    """Independent DuckDB twin of :func:`url_dedup` (url column only)."""
    order_cols = order_cols or [url_col]
    order = ", ".join(order_cols)
    return f"""
SELECT {url_col} FROM (
  SELECT *, row_number() OVER (
    PARTITION BY {canonical_url_oracle_expr(url_col)} ORDER BY {order}
  ) AS rn FROM ({source_sql})
) WHERE rn = 1
"""
