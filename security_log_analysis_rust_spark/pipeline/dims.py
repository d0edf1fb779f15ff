"""Dimension-table maintenance: host_country upsert + whois classifier.

* ``upsert_host_country`` = K3 (``src/models.rs:110-162``): insert-if-new /
  update-if-existing, keyed on host. (The reference's UPDATE is missing its
  WHERE clause — a known bug, SURVEY.md §7.4.4; this implements the intended
  keyed upsert, i.e. Iceberg ``MERGE INTO host_country USING updates ON
  host``.)
* ``enrich_new_hosts`` = J5 cache-through (``src/host_country_metadata.rs:
  49-101``): dangling hosts get codes from a resolver function and are
  appended to the dim — the whois/DNS network call replaced by a
  deterministic resolver.
* ``classify_whois_line`` = P8 (``src/host_country_metadata.rs:219-241``):
  the whois output line classifier, preserved as a tested pure function.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def upsert_host_country(existing: DataFrame, updates: DataFrame) -> DataFrame:
    """MERGE INTO analog: updates win over existing rows on the host key."""
    e = existing.withColumn("__src", F.lit(0))
    u = updates.withColumn("__src", F.lit(1))
    w = Window.partitionBy("host").orderBy(F.desc("__src"))
    return (
        e.unionByName(u, allowMissingColumns=True)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def enrich_new_hosts(
    events: DataFrame,
    host_country: DataFrame,
    resolver: Callable[[str], Optional[str]],
) -> DataFrame:
    """Cache-through enrichment: resolve hosts missing from the dim and
    return the upserted dim. The resolver runs driver-side over the
    (small) distinct dangling-host set — exactly the reference's per-miss
    whois loop, minus the network."""
    from .enrich import dangling_hosts

    missing = [r.host for r in dangling_hosts(events, host_country).collect()]
    resolved = [(h, resolver(h)) for h in missing]
    rows = [(h, c, None, None) for h, c in resolved if c is not None]
    if not rows:
        return host_country
    spark = host_country.sparkSession
    updates = spark.createDataFrame(
        rows, "host string, code string, ipaddr string, created_at timestamp"
    )
    return upsert_host_country(host_country, updates)


def classify_whois_line(line: str) -> Optional[str]:
    """P8: classify one whois output line to a country code.

    Faithful to ``src/host_country_metadata.rs:219-241``: uppercase the line,
    apply the special cases (KOREA->KR, .BR->BR, COMCAST CABLE->US,
    HINET-NET->TW, .JP->JP), else take the token after a ``COUNTRY:`` tag.
    Returns ``"BREAK"`` sentinel semantics as None (QUERY RATE = give up).
    """
    u = line.upper()
    if "QUERY RATE" in u:
        return None
    if "KOREA" in u:
        return "KR"
    if u.endswith(".BR"):
        return "BR"
    if "COMCAST CABLE" in u:
        return "US"
    if "HINET-NET" in u:
        return "TW"
    if u.endswith(".JP"):
        return "JP"
    if "COUNTRY:" in u:
        toks = u.split("COUNTRY:", 1)[1].split()
        if toks:
            return toks[0][:2]
    return None


def build_event_filters(
    df: DataFrame,
    service: Optional[str] = None,
    server: Optional[str] = None,
    min_datetime: Optional[str] = None,
    max_datetime: Optional[str] = None,
) -> DataFrame:
    """F7 dynamic predicate builder (``src/models.rs:322-366``) as chained
    optional filters. (The reference's SQL builder has a ``datetine`` typo
    that silently breaks max_datetime — intended semantics implemented,
    SURVEY.md §7.4.4.)"""
    if service is not None:
        df = df.filter(F.col("service") == service)
    if server is not None:
        df = df.filter(F.col("server") == server)
    if min_datetime is not None:
        df = df.filter(F.col("datetime") >= F.lit(min_datetime))
    if max_datetime is not None:
        df = df.filter(F.col("datetime") <= F.lit(max_datetime))
    return df
