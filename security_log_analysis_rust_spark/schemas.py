"""Spark schemas for every table in the pipeline.

Mapped from the reference's Rust structs + SQL migrations (SURVEY.md §1):

* ``pages``       — Common-Crawl-style input (BASELINE.json input_hint)
* ``intrusion_log`` — ``migrations/V03__intrusion_log.sql``, ``src/models.rs:192-200``
* ``host_country``  — ``migrations/V01__host_country.sql``, ``src/models.rs:40-46``
* ``country_code``  — ``migrations/V02__country_code.sql``, ``src/models.rs:22-26``
* ``systemd_log_messages`` — ``migrations/V07__log_messages.sql``, ``src/models.rs:657-665``
"""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

#: intermediate: one exploded log line of a page's text
LINES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("line_no", LongType(), False),
        StructField("line", StringType(), True),
    ]
)

#: extracted intrusion events (pre-sink; no uuid yet).  ``url`` + ``line_no``
#: carry provenance for the per-url byte-equality checks.
EVENTS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("line_no", LongType(), False),
        StructField("service", StringType(), False),
        StructField("server", StringType(), False),
        StructField("datetime", TimestampType(), False),
        StructField("host", StringType(), False),
        StructField("username", StringType(), True),
    ]
)

INTRUSION_LOG_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),  # uuid4; excluded from equality
        StructField("service", StringType(), False),
        StructField("server", StringType(), False),
        StructField("datetime", TimestampType(), False),
        StructField("host", StringType(), False),
        StructField("username", StringType(), True),
    ]
)

HOST_COUNTRY_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("code", StringType(), False),
        StructField("ipaddr", StringType(), True),
        StructField("created_at", TimestampType(), True),
    ]
)

COUNTRY_CODE_SCHEMA = StructType(
    [
        StructField("code", StringType(), False),
        StructField("country", StringType(), False),
    ]
)

SYSTEMD_LOG_MESSAGES_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("log_level", StringType(), False),
        StructField("log_unit", StringType(), True),
        StructField("log_message", StringType(), False),
        StructField("log_timestamp", TimestampType(), False),
        StructField("processed_time", TimestampType(), True),
    ]
)

#: journald JSON record schema for from_json (``src/parse_logs.rs:381-389``)
JOURNALD_SCHEMA = StructType(
    [
        StructField("UNIT", StringType(), True),
        StructField("MESSAGE", StringType(), True),
        StructField("__REALTIME_TIMESTAMP", StringType(), True),
    ]
)
