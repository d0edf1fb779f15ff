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


def overwrite_dim(df: DataFrame, path: str) -> None:
    """Atomically replace a dim table at ``path`` (file OR directory) with
    ``df``: write to a sibling tmp dir first (the source may be ``path``
    itself), then swap. The Iceberg table-commit analog for plain parquet."""
    import os
    import shutil

    tmp = path + ".tmp"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.exists(path):
        os.remove(path)
    os.replace(tmp, path)


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
    return the upserted dim (``src/host_country_metadata.rs:49-101``).

    The resolver runs DISTRIBUTED via ``mapInPandas`` over the dangling-host
    DataFrame — the dangling set is unbounded at scale, so it is never
    collected to the driver (the reference's per-miss whois loop becomes a
    per-partition loop inside each Arrow batch). Hosts the resolver can't
    classify (None) are skipped, like the reference's failed whois lookups.
    """
    import pandas as pd

    from .enrich import dangling_hosts

    if resolver is None:  # no live whois: skip every host (upsert nothing)
        resolver = lambda h: None  # noqa: E731

    missing = dangling_hosts(events, host_country)

    def gen(batches):
        for pdf in batches:
            codes = pdf["host"].map(resolver)
            out = pd.DataFrame({"host": pdf["host"], "code": codes})
            yield out[out["code"].notna()]

    updates = missing.mapInPandas(gen, "host string, code string").select(
        "host",
        "code",
        F.lit(None).cast("string").alias("ipaddr"),
        F.lit(None).cast("timestamp").alias("created_at"),
    )
    return upsert_host_country(host_country, updates)


def classify_whois_line(line: str) -> Optional[str]:
    """P8: classify one whois output line to a country code.

    Faithful to ``src/host_country_metadata.rs:219-241`` (``process_line``)
    including its caller's ``to_uppercase`` at ``:148``: special cases
    (KOREA->KR, ends-with .BR->BR, COMCAST CABLE->US, HINET-NET->TW,
    contains .JP->JP), else the second whitespace token when the FIRST token
    is exactly ``COUNTRY:`` — kept whole (e.g. ``NLD``), not truncated.
    ``QUERY RATE`` = the reference's Break sentinel -> None (give up).
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
    if ".JP" in u:
        return "JP"
    toks = u.split()[:2]
    if len(toks) >= 2 and toks[0] == "COUNTRY:":
        return toks[1]
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
