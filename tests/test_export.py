"""Tests for the monthly export, parquet merge, and HTML report sinks."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from conftest import TESTDATA_SF_SMALL

from security_log_analysis_rust_spark.pipeline.enrich import enrich_events
from security_log_analysis_rust_spark.pipeline.export import (
    country_report_html,
    export_monthly,
    merge_parquet_files,
)
from security_log_analysis_rust_spark.pipeline.parse import extract_events
from security_log_analysis_rust_spark.pipeline.route import dedup_intrusions
from security_log_analysis_rust_spark.synth import ensure_synthetic


def _enriched(spark):
    paths = ensure_synthetic(TESTDATA_SF_SMALL)
    pages = spark.read.parquet(paths["pages"])
    hc = spark.read.parquet(paths["host_country"])
    cc = spark.read.parquet(paths["country_code"])
    return enrich_events(
        dedup_intrusions(extract_events(pages)["events"]), hc, cc
    ).select("service", "server", "datetime", "host", "username", "code", "country")


def test_export_monthly_partitions_and_incremental_overwrite(spark, tmp_path):
    out = str(tmp_path / "monthly")
    enriched = _enriched(spark).cache()
    export_monthly(enriched, out)
    months = sorted(
        d for d in os.listdir(out) if d.startswith("year=")
    )
    assert months == ["year=2024"]
    n_all = spark.read.parquet(out).count()
    assert n_all == enriched.count()

    # re-export only January: other months must be untouched (dynamic mode)
    jan = enriched.filter(F.month("datetime") == 1)
    export_monthly(jan, out)
    assert spark.read.parquet(out).count() == n_all


def test_merge_parquet_files_keep_first(spark, tmp_path):
    df = _enriched(spark)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    df.limit(50).write.parquet(a)
    df.limit(80).write.parquet(b)  # overlaps a
    out = str(tmp_path / "merged")
    n = merge_parquet_files(spark, [a, b], out)
    distinct_union = (
        spark.read.parquet(a).unionByName(spark.read.parquet(b)).distinct().count()
    )
    assert n == distinct_union


def test_country_report_html(spark, tmp_path):
    from security_log_analysis_rust_spark.pipeline.aggregate import per_country_counts

    pc = per_country_counts(_enriched(spark).filter(F.col("country").isNotNull()))
    out = country_report_html(pc, str(tmp_path / "report.html"))
    text = open(out).read()
    assert "geochart" in text and "<table" in text
    assert "Country CN" in text  # golden host 36.110.50.217 -> CN dominates
