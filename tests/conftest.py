"""Shared fixtures: one local SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Reference fixture files (read-only; used for golden-count parity tests).
REFERENCE_AUTH_LOG = "/root/reference/tests/data/test_auth.log"
REFERENCE_SYSTEMD_JSON = "/root/reference/tests/data/test_systemd.json"

TESTDATA_SF_SMALL = "/root/testdata/sf0.001"
TESTDATA_SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from security_log_analysis_rust_spark.session import get_spark

    spark = get_spark(app_name="sla-spark-tests", cpus=4, shuffle_partitions=8)
    yield spark
    spark.stop()
