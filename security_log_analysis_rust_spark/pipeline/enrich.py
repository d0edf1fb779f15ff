"""Enrichment stage: broadcast joins against the lookup dimensions.

The reference enriches via an in-memory ``HashMap<host, HostCountry>`` probe
plus live whois on miss (``src/host_country_metadata.rs:23-175``). The Spark
equivalent is a broadcast hash join against the ``host_country`` dimension
(J1/J3/J5, SURVEY.md §2.5): the fact side never shuffles — at 10^12 rows the
dims (<100 MB) ship to every executor once, and the join stays narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_events(
    events: DataFrame,
    host_country: DataFrame,
    country_code: DataFrame,
    how: str = "left",
) -> DataFrame:
    """J1 export enrichment (``src/polars_analysis.rs:96-107``):
    ``events LEFT JOIN host_country ON host LEFT JOIN country_code ON code``.
    ``how='inner'`` gives the report variant J3 (``src/reports.rs:19-22``).
    """
    hc = F.broadcast(host_country.select("host", "code"))
    cc = F.broadcast(country_code.select("code", "country"))
    return events.join(hc, "host", how).join(cc, "code", how)


def dangling_hosts(events: DataFrame, host_country: DataFrame) -> DataFrame:
    """J2 (``src/models.rs:166-189``): distinct event hosts with no
    host_country row — broadcast left-anti join, no fact shuffle."""
    hc = F.broadcast(host_country.select("host"))
    return events.join(hc, "host", "left_anti").select("host").distinct()
