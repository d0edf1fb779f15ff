"""Routing/sink stage: dedup + fan-out writers.

The reference routes parsed rows into Postgres tables with
``INSERT ... ON CONFLICT DO NOTHING`` against the unique key
``(service, server, datetime, host)`` (``migrations/V03__intrusion_log.sql:10``,
``src/models.rs:429-448``) after a sort + adjacent-dedup pass
(``src/parse_logs.rs:198-202``). Spark has no unique constraints, so the same
exactly-once semantics are built from:

* ``dedup_intrusions`` — deterministic keep-first over the unique key
  (window ``row_number``; the reference's keep-first is insert-order
  dependent, ours is ordered by (username NULLS FIRST, url, line_no) and
  therefore reproducible — SURVEY.md §7.4.3);
* ``append_dedup`` — anti-join against the existing sink before an append,
  replacing ON CONFLICT DO NOTHING (O8 -> K1).

Scale: the dedup shuffles once on the unique key — the same shuffle a
``groupBy`` would need; AQE handles skewed hosts. The anti-join reads only
the sink's key columns (column pruning) and can be restricted to the
incremental datetime range via ``since``.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..schemas import INTRUSION_LOG_SCHEMA, SYSTEMD_LOG_MESSAGES_SCHEMA

#: intrusion_log unique key (migrations/V03__intrusion_log.sql:10)
UNIQUE_KEY = ["service", "server", "datetime", "host"]


def dedup_intrusions(events: DataFrame) -> DataFrame:
    """Keep one row per unique key, deterministically (K1/O5/O8).

    Implemented as ``groupBy(key).agg(min_by(row, order))`` rather than a
    ``row_number`` window: the hash aggregate gets map-side partial
    combining, so the shuffle carries ~unique-keys rows instead of every
    event — the window variant's sort was the pipeline's worst-scaling
    stage (1.7x from 8->32 cores vs 5x for the parse).

    Order = (username ASC NULLS FIRST, url, line_no): deterministic
    keep-first; NULL is encoded below '' so the winner is reproducible.
    """
    ord_fields = [
        F.col("username").isNotNull().cast("int"),  # NULL (0) sorts first
        F.coalesce(F.col("username"), F.lit("")),
    ]
    for c in ("url", "line_no"):
        if c in events.columns:
            ord_fields.append(F.col(c))
    payload = F.struct(*[F.col(c) for c in events.columns])
    picked = events.groupBy(*UNIQUE_KEY).agg(
        F.min_by(payload, F.struct(*ord_fields)).alias("__row")
    )
    return picked.select("__row.*")


def to_intrusion_log(deduped: DataFrame) -> DataFrame:
    """Attach the random uuid4 id (``src/parse_logs.rs:46``; excluded from
    all equality checks) and project the sink schema."""
    return deduped.select(
        F.expr("uuid()").alias("id"),
        "service",
        "server",
        "datetime",
        "host",
        "username",
    )


def to_systemd_log_messages(systemd: DataFrame) -> DataFrame:
    """Project the systemd sink schema (``migrations/V07__log_messages.sql``);
    ``processed_time`` starts NULL (V08)."""
    return systemd.select(
        F.expr("uuid()").alias("id"),
        "log_level",
        "log_unit",
        "log_message",
        "log_timestamp",
        F.lit(None).cast("timestamp").alias("processed_time"),
    )


def read_sink(spark: SparkSession, path: str, schema) -> DataFrame:
    """Read a parquet sink table projected to ``schema``'s columns (drops the
    physical partition column); empty DataFrame if it doesn't exist yet.

    Runs :func:`recover_sink` first: a crash between the two renames of
    :func:`_swap_dir` leaves the live dir absent with its ``_old.`` aside
    holding the data — without this, a pure read path would see "no sink"
    until some write-path entry point happened to repair it."""
    recover_sink(path)
    if os.path.exists(path):
        return spark.read.parquet(path).select(*[f.name for f in schema.fields])
    return spark.createDataFrame([], schema)


#: intrusion sink partition column: month(datetime), written as 'yyyy-MM'
MONTH_COL = "dt_month"


def sink_month_filter(df: DataFrame, since: str) -> DataFrame:
    """Prune a month-partitioned sink read to ``datetime >= since``.

    The coarse predicate on :data:`MONTH_COL` is what Spark turns into
    *partition pruning* (directories skipped, zero IO); the exact predicate
    on ``datetime`` then applies within the boundary month.
    """
    month = str(since)[:7]
    if MONTH_COL in df.columns:
        df = df.filter(F.col(MONTH_COL) >= F.lit(month))
    return df.filter(F.col("datetime") >= F.lit(since))


def _swap_dir(live: str, tmp: str) -> None:
    """Replace directory ``live`` with ``tmp`` via rename-aside.

    Order matters for crash safety: the live copy is renamed aside (never
    deleted while it is the only copy), the new dir moved in, and only then
    is the old copy removed. Every intermediate state is recoverable by
    :func:`recover_sink` — a crash can leave a leftover, never data loss.
    The aside name is ``_old.<name>`` (underscore prefix = invisible to
    Spark's file listing, so a concurrent partitioned read never sees it).
    """
    import shutil

    parent, name = os.path.split(os.path.normpath(live))
    aside = os.path.join(parent, "_old." + name)
    if os.path.exists(aside):  # leftover from a crashed *completed* swap
        shutil.rmtree(aside)
    os.rename(live, aside)
    os.rename(tmp, live)
    shutil.rmtree(aside)


def recover_sink(sink_path: str) -> None:
    """Repair leftovers of a crashed :func:`_swap_dir` / migration.

    Invariants restored: if the live dir (sink root or a month partition)
    is missing but its ``_old.`` aside exists, the aside IS the pre-swap
    data — rename it back. If both exist, the swap completed — drop the
    aside. A ``.tmp`` with no live sink and no aside means a legacy
    (pre-rename-aside) crash stranded the whole history in the tmp: fail
    loudly instead of silently starting a fresh sink.
    """
    import glob as _glob
    import shutil

    parent, name = os.path.split(os.path.normpath(sink_path))
    aside = os.path.join(parent, "_old." + name)
    tmp = sink_path + ".tmp"
    if os.path.exists(aside):
        if os.path.exists(sink_path):
            shutil.rmtree(aside)
        else:
            os.rename(aside, sink_path)
    if os.path.exists(tmp):
        if os.path.exists(sink_path):
            shutil.rmtree(tmp)  # unswapped rewrite; source state intact
        else:
            raise RuntimeError(
                f"sink {sink_path} is missing but {tmp} exists: a legacy "
                "migration crashed mid-swap. Inspect and rename the .tmp "
                "back manually; refusing to start a fresh sink."
            )
    if os.path.isdir(sink_path):
        for md_aside in _glob.glob(
            os.path.join(sink_path, f"_old.{MONTH_COL}=*")
        ):
            live = os.path.join(
                sink_path, os.path.basename(md_aside)[len("_old.") :]
            )
            if os.path.exists(live):
                shutil.rmtree(md_aside)
            else:
                os.rename(md_aside, live)
        for md_tmp in _glob.glob(os.path.join(sink_path, f".tmp.{MONTH_COL}=*")):
            shutil.rmtree(md_tmp)  # month rewrites stage next to the live dir


def _migrate_unpartitioned_sink(spark: SparkSession, sink_path: str) -> bool:
    """One-time atomic rewrite of a legacy flat sink into the
    month-partitioned layout.

    Appending ``partitionBy(dt_month)`` files next to flat part-files would
    succeed and then brick every subsequent read ('Conflicting directory
    structures detected'), so the legacy layout is detected (data files at
    the sink root) and rewritten via the rename-aside swap (a crash leaves
    either the legacy layout or the new one — never a missing sink).
    Returns True if a migration happened.
    """
    import glob as _glob

    root_files = [
        p
        for p in _glob.glob(os.path.join(sink_path, "*.parquet"))
        if os.path.isfile(p)
    ]
    if not root_files:
        return False
    flat = spark.read.parquet(*root_files)
    flat = flat.withColumn(MONTH_COL, F.date_format("datetime", "yyyy-MM"))
    month_dirs = sorted(_glob.glob(os.path.join(sink_path, f"{MONTH_COL}=*")))
    if month_dirs:  # already-mixed sink: keep both halves
        part = spark.read.option("basePath", sink_path).parquet(*month_dirs)
        flat = flat.unionByName(part.select(*flat.columns))
    tmp = sink_path + ".tmp"
    flat.write.mode("overwrite").partitionBy(MONTH_COL).parquet(tmp)
    _swap_dir(sink_path, tmp)
    return True


def append_dedup(
    spark: SparkSession,
    sink_path: str,
    new_rows: DataFrame,
    key=UNIQUE_KEY,
    since: Optional[str] = None,
) -> int:
    """ON CONFLICT DO NOTHING analog: drop rows whose key already exists in
    the sink, then append. Returns the number of appended rows.

    The sink is written partitioned by month(datetime) (:data:`MONTH_COL`),
    so the ``since`` bound (ISO timestamp; callers pass the split's
    min(datetime)) prunes the anti-join's sink scan to the incremental
    months via partition pruning — a 100 TB sink is never fully re-scanned
    per split. Correctness: every new row has ``datetime >= since``, so any
    conflicting sink row lies in the pruned range by construction.
    """
    recover_sink(sink_path)
    if os.path.exists(sink_path):
        _migrate_unpartitioned_sink(spark, sink_path)
        existing = spark.read.parquet(sink_path)
        if since is not None:
            existing = sink_month_filter(existing, since)
        new_rows = new_rows.join(existing.select(*key), key, "left_anti")
    new_rows = new_rows.withColumn(
        MONTH_COL, F.date_format("datetime", "yyyy-MM")
    ).persist()
    try:
        n = new_rows.count()
        if n:
            new_rows.write.mode("append").partitionBy(MONTH_COL).parquet(sink_path)
    finally:
        new_rows.unpersist()
    return n


def cleanup_intrusion_log(spark: SparkSession, sink_path: str) -> int:
    """``cleanup_intrusion_log`` analog (``src/host_country_metadata.rs:
    179-214``): delete duplicate sink rows on the unique key, keeping the
    max-id row (the reference deletes ``a.id < b.id``). Returns the number
    of removed rows.

    Partition-scoped: ``datetime`` is part of the unique key and
    :data:`MONTH_COL` = month(datetime), so duplicate rows always share a
    month partition. The dup scan reads only key columns (column-pruned),
    and ONLY the month directories that actually contain duplicates are
    rewritten (rename-aside swap per directory); every other month keeps
    its original part-files untouched. This is the plain-parquet analog of
    a table-format partition-level rewrite — a 100 TB sink with a few dirty
    months rewrites a few months, not 100 TB.
    """
    recover_sink(sink_path)
    df = spark.read.parquet(sink_path)
    if MONTH_COL not in df.columns:  # legacy flat sink: migrate, then scope
        if _migrate_unpartitioned_sink(spark, sink_path):
            df = spark.read.parquet(sink_path)

    dup_months = (
        df.groupBy(*UNIQUE_KEY)
        .agg(F.count(F.lit(1)).alias("__n"), F.first(MONTH_COL).alias("__m"))
        .filter(F.col("__n") > 1)
        .groupBy("__m")
        .agg(F.sum(F.col("__n") - 1).alias("__extra"))
        .collect()
    )
    if not dup_months:
        return 0
    removed = 0
    payload = F.struct(*[F.col(c) for c in df.columns if c != MONTH_COL])
    for r in dup_months:
        month, extra = r["__m"], int(r["__extra"])
        live = os.path.join(sink_path, f"{MONTH_COL}={month}")
        part = df.filter(F.col(MONTH_COL) == month)  # partition-pruned scan
        deduped = (
            part.groupBy(*UNIQUE_KEY)
            .agg(F.max_by(payload, F.col("id")).alias("__row"))
            .select("__row.*")
        )
        tmp = os.path.join(sink_path, f".tmp.{MONTH_COL}={month}")
        deduped.write.mode("overwrite").parquet(tmp)
        _swap_dir(live, tmp)
        removed += extra
    spark.catalog.refreshByPath(sink_path)  # drop stale FileStatus entries
    return removed


def write_sinks_single_pass(routed: DataFrame, out_dir: str) -> None:
    """Fan-out both sinks in ONE job: scan -> narrow route projection ->
    one dedup shuffle -> one partitioned write.

    This is the 100 TB plan: the input is scanned exactly once regardless of
    sink count. Dedup happens in the same shuffle for intrusion rows (their
    key is the sink unique key) while systemd rows pass through (their key
    is the row identity ``url#line_no`` — the reference's systemd table has
    no unique constraint, duplicates are legal and preserved).
    """
    intr = F.col("sink") == "intrusion_log"
    key = F.when(
        intr,
        F.concat_ws(
            "\x01", "service", "server", F.col("datetime").cast("string"), "host"
        ),
    ).otherwise(F.concat_ws("\x01", "url", F.col("line_no").cast("string")))
    order = F.struct(
        F.col("username").isNotNull().cast("int"),
        F.coalesce(F.col("username"), F.lit("")),
        F.col("url"),
        F.col("line_no"),
    )
    payload = F.struct(*[F.col(c) for c in routed.columns])
    picked = (
        routed.withColumn("__key", key)
        .groupBy("sink", "__key")
        .agg(F.min_by(payload, order).alias("__row"))
        .select("__row.*")
    )
    # drop the duplicated sink inside __row and provenance columns; stamp ids
    out = picked.select(
        "sink",
        F.expr("uuid()").alias("id"),
        "service",
        "server",
        "datetime",
        "host",
        "username",
        "log_level",
        "log_unit",
        "log_message",
        "log_timestamp",
    )
    out.write.mode("overwrite").partitionBy("sink").parquet(out_dir)


def write_sinks(
    spark: SparkSession,
    out_dir: str,
    events: DataFrame,
    systemd: DataFrame,
) -> dict:
    """Fan-out (K1-K5): one writer per sink table. Returns appended counts."""
    os.makedirs(out_dir, exist_ok=True)
    intr_path = os.path.join(out_dir, "intrusion_log")
    sysd_path = os.path.join(out_dir, "systemd_log_messages")
    n_intr = append_dedup(spark, intr_path, to_intrusion_log(dedup_intrusions(events)))
    # persist so the count doesn't re-derive the projection (and re-parse,
    # when the caller didn't persist upstream)
    sysd = to_systemd_log_messages(systemd).persist()
    try:
        sysd.write.mode("append").parquet(sysd_path)
        n_sysd = sysd.count()
    finally:
        sysd.unpersist()
    return {"intrusion_log": n_intr, "systemd_log_messages": n_sysd}
