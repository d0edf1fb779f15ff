"""Plan-quality and plan-equivalence tests.

The fused single-pass parse must be row-identical to the definitional
per-branch union, and the physical plans must show the properties the scale
design depends on: column pruning at the scan, broadcast joins for
enrichment, no extra shuffles in the narrow stage.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from conftest import TESTDATA_SF_SMALL

from security_log_analysis_rust_spark.pipeline.enrich import enrich_events
from security_log_analysis_rust_spark.pipeline.parse import (
    extract_events,
    extract_events_union,
)
from security_log_analysis_rust_spark.synth import ensure_synthetic


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _pages(spark):
    return spark.read.parquet(ensure_synthetic(TESTDATA_SF_SMALL)["pages"])


def test_fused_equals_union(spark):
    pages = _pages(spark)
    cols = ["url", "line_no", "service", "server", "datetime", "host", "username"]
    fused = {tuple(r) for r in extract_events(pages)["events"].select(*cols).collect()}
    union = {tuple(r) for r in extract_events_union(pages)["events"].select(*cols).collect()}
    assert fused == union
    scols = ["url", "line_no", "log_level", "log_unit", "log_message", "log_timestamp"]
    f_sys = {tuple(r) for r in extract_events(pages)["systemd"].select(*scols).collect()}
    u_sys = {tuple(r) for r in extract_events_union(pages)["systemd"].select(*scols).collect()}
    assert f_sys == u_sys


def test_scan_prunes_html_column(spark):
    plan = _plan(extract_events(_pages(spark))["events"])
    # ReadSchema must not include the big binary column we never touch
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, plan
    assert all("html" not in l for l in read_schema), read_schema


def test_fused_parse_is_single_scan_no_shuffle(spark):
    import re

    plan = _plan(extract_events(_pages(spark))["events"])
    # formatted output lists each node twice (tree + detail section)
    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    assert len(scans) == 1, plan
    assert "Exchange" not in plan, "parse stage must stay narrow"


def test_enrichment_uses_broadcast_joins(spark):
    paths = ensure_synthetic(TESTDATA_SF_SMALL)
    pages = spark.read.parquet(paths["pages"])
    hc = spark.read.parquet(paths["host_country"])
    cc = spark.read.parquet(paths["country_code"])
    enriched = enrich_events(extract_events(pages)["events"], hc, cc)
    plan = _plan(enriched)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "dims must broadcast, never sort-merge"


def test_filter_pushdown_on_sink_read(spark, tmp_path):
    """Predicate pushdown reaches the parquet scan on sink reads."""
    pages = _pages(spark)
    out = str(tmp_path / "intr")
    extract_events(pages)["events"].write.parquet(out)
    df = spark.read.parquet(out).filter(F.col("service") == "ssh")
    plan = _plan(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "service" in pushed[0], plan
