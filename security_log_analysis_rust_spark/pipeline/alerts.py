"""Alert batching over the systemd message queue (O4 + K9).

The reference runs a polling consumer: pop the oldest unprocessed message
(``SystemdLogMessages::get_oldest_message``, ``src/models.rs:695-709``),
accumulate messages above ``alert_log_level`` into a buffer, flush as one
email once a message is younger than ``alert_log_delay`` seconds or the
buffer exceeds ``alert_buffer_size`` bytes (``src/parse_logs.rs:447-506``,
defaults ``src/config.rs:27-34``), and mark everything processed.

Spark re-expression: the same accumulate-then-flush fold, computed as a
deterministic batch function over the queue ordered by ``log_timestamp`` —
emails become rows in an ``alerts`` result (side-effecting senders live
outside the engine), and "mark processed" becomes a processed_time column
stamp. Ordering is the queue's total order, so the fold is reproducible.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LEVEL_ORDER = {"debug": 0, "info": 1, "warn": 2, "error": 3}


@dataclass
class AlertBatch:
    subject: str
    message_ids: List[str] = field(default_factory=list)
    body_bytes: int = 0


def pop_oldest_unprocessed(systemd: DataFrame) -> DataFrame:
    """O4: oldest unprocessed message (ORDER BY log_timestamp LIMIT 1)."""
    return (
        systemd.filter(F.col("processed_time").isNull())
        .orderBy("log_timestamp", "id")
        .limit(1)
    )


def build_alert_batches(
    systemd: DataFrame,
    server: str = "home.ddboline.net",
    alert_log_level: str = "error",
    alert_log_delay: int = 60,
    alert_buffer_size: int = 10_000,
    as_of: Optional[datetime] = None,
) -> List[AlertBatch]:
    """Deterministic replay of the reference's accumulate-then-flush loop.

    Messages at/above ``alert_log_level`` accumulate while they are older
    than ``alert_log_delay`` (relative to ``as_of``) and the buffer stays
    under ``alert_buffer_size`` bytes; anything else flushes the buffer.
    Returns the flushed batches (the 'emails'); all inputs count as
    processed. The queue is small by construction (alerts are human-scale),
    so a driver-side fold is the honest implementation — the heavy lifting
    (classification, routing) already happened distributed.
    """
    min_lvl = LEVEL_ORDER[alert_log_level]
    rows = (
        systemd.filter(F.col("processed_time").isNull())
        .orderBy("log_timestamp", "id")
        .select("id", "log_level", "log_message", "log_timestamp")
        .collect()
    )
    as_of = as_of or (
        rows[-1].log_timestamp
        if rows
        else datetime.now(timezone.utc).replace(tzinfo=None)
    )
    batches: List[AlertBatch] = []
    current: Optional[AlertBatch] = None
    for r in rows:
        if LEVEL_ORDER.get(r.log_level, 0) < min_lvl:
            continue
        if current is None:
            current = AlertBatch(subject=f"Systemd Alert {server} {r.log_level}")
        current.message_ids.append(r.id)
        current.body_bytes += len(r.log_message.encode()) + 12
        age = (as_of - r.log_timestamp).total_seconds()
        if age <= alert_log_delay or current.body_bytes >= alert_buffer_size:
            batches.append(current)
            current = None
    if current is not None:
        batches.append(current)
    return batches


def mark_processed(
    systemd: DataFrame, message_ids: List[str], processed_time: datetime
) -> DataFrame:
    """Stamp processed_time for the given ids (columnar update analog of
    ``set_message_processed``, ``src/models.rs:744-747``)."""
    hit = F.col("id").isin(message_ids)
    return systemd.withColumn(
        "processed_time",
        F.when(hit & F.col("processed_time").isNull(), F.lit(processed_time)).otherwise(
            F.col("processed_time")
        ),
    )
