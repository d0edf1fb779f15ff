"""Shared helpers for the textops stack."""

from __future__ import annotations

from pyspark.sql import DataFrame


def n_input_splits(df: DataFrame) -> int:
    """Cheap input-split estimate. ``df.inputFiles()`` is metadata-only for
    file-based sources (no RDD conversion — ``df.rdd`` forces the plan
    through the RDD translation); the RDD partition count is the fallback
    for in-memory frames, where it is cheap. File count slightly
    under-counts splittable big files, which only ever errs toward an extra
    repartition of a small input — a no-op at scale where datasets are
    many-files."""
    files = df.inputFiles()
    if files:
        return len(files)
    return df.rdd.getNumPartitions()


def spread_small_input(df: DataFrame) -> DataFrame:
    """Small demo tables arrive as 1-2 parquet splits, serializing the
    per-row transforms that follow; spread them across the cores. At real
    scale the input has >= cores splits and this is a no-op (no shuffle)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if n_input_splits(df) < par:
        return df.repartition(par)
    return df
