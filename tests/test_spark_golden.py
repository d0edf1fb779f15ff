"""Spark-pipeline golden tests over the reference's own fixture files.

The reference fixtures are consumed in place (read-only) — same inputs,
same outputs as ``/root/reference/src/parse_logs.rs:575-650``.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from conftest import REFERENCE_AUTH_LOG, REFERENCE_SYSTEMD_JSON

from security_log_analysis_rust_spark.parsing.udfs import invalid_user_udf
from security_log_analysis_rust_spark.pipeline.route import dedup_intrusions
from security_log_analysis_rust_spark.schemas import JOURNALD_SCHEMA


def _auth_events(spark):
    """parse_log_file semantics via spark.read.text (S1/S3 -> P2)."""
    lines = spark.read.text(REFERENCE_AUTH_LOG).withColumnRenamed("value", "line")
    toks = F.split(F.trim("line"), r"\s+")
    df = (
        lines.filter(F.col("line").contains("sshd") & F.col("line").contains("Invalid user"))
        .withColumn("toks", toks)
        .filter(F.size("toks") >= 10)
        .withColumn(
            "datetime",
            F.try_to_timestamp(
                F.concat_ws(
                    " ", F.get("toks", 0), F.get("toks", 1), F.lit("2023"), F.get("toks", 2)
                ),
                F.lit("MMM d yyyy HH:mm:ss"),
            ),
        )
        .withColumn("ex", invalid_user_udf(F.col("line")))
        .filter(F.col("datetime").isNotNull() & F.col("ex.host").isNotNull())
    )
    return df.select(
        "datetime",
        F.col("ex.host").alias("host"),
        F.col("ex.username").alias("username"),
    )


@pytest.mark.skipif(not os.path.exists(REFERENCE_AUTH_LOG), reason="fixture absent")
def test_spark_auth_log_20_events(spark):
    assert _auth_events(spark).count() == 20


@pytest.mark.skipif(not os.path.exists(REFERENCE_AUTH_LOG), reason="fixture absent")
def test_spark_auth_log_18_after_dedup(spark):
    ev = _auth_events(spark).select(
        F.lit("ssh").alias("service"),
        F.lit("home.ddboline.net").alias("server"),
        "datetime",
        "host",
        "username",
    )
    # reference pipeline dedup (O5) keyed like the DB unique constraint (O8)
    assert dedup_intrusions(ev).count() == 18


@pytest.mark.skipif(not os.path.exists(REFERENCE_SYSTEMD_JSON), reason="fixture absent")
def test_spark_systemd_24_errors(spark):
    lines = spark.read.text(REFERENCE_SYSTEMD_JSON).withColumnRenamed("value", "line")
    lines = lines.filter(F.length(F.trim("line")) > 0)
    rec = F.from_json("line", JOURNALD_SCHEMA)
    level = (
        F.when(F.col("line").contains("err") | F.col("line").contains("ERR"), "error")
        .when(F.col("line").contains("warn") | F.col("line").contains("WARN"), "warn")
        .when(F.col("line").contains("info") | F.col("line").contains("INFO"), "info")
        .when(F.col("line").contains("debug") | F.col("line").contains("DEBUG"), "debug")
    )
    df = lines.select(
        level.alias("log_level"),
        F.timestamp_micros(
            rec["__REALTIME_TIMESTAMP"].try_cast("long")
        ).alias("log_timestamp"),
    )
    rows = df.collect()
    assert len(rows) == 24
    assert all(r.log_level == "error" for r in rows)
    assert all(r.log_timestamp is not None for r in rows)


@pytest.mark.skipif(not os.path.exists(REFERENCE_SYSTEMD_JSON), reason="fixture absent")
def test_spark_journald_routing_matches_oracle_on_reference_fixture(spark):
    """Full S4 routing (source -> blacklist -> ssh/nginx/systemd split) over
    the reference's own journald fixture, row-compared against the
    pure-Python oracle — the independent anchor on non-synthetic data."""
    from security_log_analysis_rust_spark.parsing.core import parse_journald_line
    from security_log_analysis_rust_spark.pipeline.parse import parse_journald_lines
    from security_log_analysis_rust_spark.sources.logfiles import read_journald_json

    lines = read_journald_json(spark, REFERENCE_SYSTEMD_JSON)
    intr, sysd = parse_journald_lines(lines)
    got_intr = sorted(
        (r.service, r.host, r.username, r.datetime.replace(tzinfo=None))
        for r in intr.collect()
    )
    got_sysd = sorted(
        (r.log_level, r.log_unit, r.log_message,
         r.log_timestamp.replace(tzinfo=None))
        for r in sysd.collect()
    )

    exp_intr, exp_sysd = [], []
    with open(REFERENCE_SYSTEMD_JSON) as f:
        for raw in f:
            raw = raw.strip()
            if not raw:
                continue
            out = parse_journald_line(raw)
            if out is None:
                continue
            if out["kind"] == "intrusion":
                exp_intr.append(
                    (out["service"], out["host"], out["username"],
                     out["datetime"].replace(tzinfo=None))
                )
            else:
                exp_sysd.append(
                    (out["log_level"], out["log_unit"], out["log_message"],
                     out["log_timestamp"].replace(tzinfo=None))
                )
    assert got_intr == sorted(exp_intr)
    assert got_sysd == sorted(exp_sysd)
    assert len(got_sysd) > 0  # fixture routes into the systemd sink


def test_spark_journald_golden_single(spark):
    line = (
        '{"__REALTIME_TIMESTAMP":"1655046591494032",'
        '"MESSAGE":"Invalid user ark from 43.154.144.211 port 42608"}'
    )
    df = spark.createDataFrame([(line,)], "line string").select(
        invalid_user_udf(F.get_json_object("line", "$.MESSAGE")).alias("ex")
    )
    row = df.collect()[0]
    assert row.ex.host == "43.154.144.211"
    assert row.ex.username == "ark"


def test_udf_all_null_batch(spark):
    """Regression: Arrow hands the UDF a float64(NaN) column when every
    value in a batch is null — the bank must not crash on it."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("noise",), ("more noise",)], "line string")
    out = df.select(
        invalid_user_udf(F.when(F.lit(False), F.col("line"))).alias("ex")
    ).collect()
    assert all(r.ex.host is None and r.ex.username is None for r in out)
