"""Tests for the alert queue (O4 pop-oldest, K9 accumulate-then-flush)."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from security_log_analysis_rust_spark.pipeline.alerts import (
    build_alert_batches,
    mark_processed,
    pop_oldest_unprocessed,
)
from security_log_analysis_rust_spark.schemas import SYSTEMD_LOG_MESSAGES_SCHEMA

BASE = datetime(2024, 6, 1, 12, 0, 0)


def _queue(spark, rows):
    data = [
        (f"id{i}", lvl, "unit", msg, BASE + timedelta(seconds=off), None)
        for i, (lvl, msg, off) in enumerate(rows)
    ]
    return spark.createDataFrame(data, SYSTEMD_LOG_MESSAGES_SCHEMA)


def test_pop_oldest(spark):
    q = _queue(spark, [("error", "late", 100), ("warn", "early", 0), ("error", "mid", 50)])
    r = pop_oldest_unprocessed(q).collect()
    assert len(r) == 1 and r[0].log_message == "early"


def test_alert_batches_flush_on_recency_and_size(spark):
    # old errors accumulate; the one younger than alert_log_delay flushes
    rows = [("error", f"boom {i}", i * 100) for i in range(5)]
    q = _queue(spark, rows)
    as_of = BASE + timedelta(seconds=430)  # last message is 30s old -> flush
    batches = build_alert_batches(q, alert_log_delay=60, as_of=as_of)
    assert len(batches) == 1
    assert len(batches[0].message_ids) == 5
    assert batches[0].subject.endswith("error")

    # sub-threshold levels are skipped entirely
    q2 = _queue(spark, [("warn", "meh", 0), ("info", "nope", 10)])
    assert build_alert_batches(q2, as_of=BASE + timedelta(hours=1)) == []

    # buffer-size overflow forces an intermediate flush
    rows = [("error", "x" * 6000, 0), ("error", "y" * 6000, 10), ("error", "z", 20)]
    q3 = _queue(spark, rows)
    batches = build_alert_batches(
        q3, alert_log_delay=1, alert_buffer_size=10_000,
        as_of=BASE + timedelta(hours=1),
    )
    assert len(batches) >= 2


def test_mark_processed(spark):
    q = _queue(spark, [("error", "a", 0), ("error", "b", 10)])
    stamped = mark_processed(q, ["id0"], BASE + timedelta(minutes=5))
    got = {r.id: r.processed_time for r in stamped.collect()}
    assert got["id0"] is not None and got["id1"] is None
    assert pop_oldest_unprocessed(stamped).collect()[0].id == "id1"
