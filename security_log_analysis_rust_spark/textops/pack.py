"""Sequence packing: concat-and-chunk documents into fixed-length windows.

The last step before a text corpus becomes training batches: concatenate
all documents (one separator token between docs) in a deterministic order
and slice the token stream into fixed ``seq_len`` windows. GPT-style
pipelines do exactly this; the hard part at scale is the global running
token offset — a naive ``Window.orderBy(...)`` with no partition key pulls
the whole corpus into ONE task.

This implementation is the classic two-phase distributed prefix sum, all
JVM-side:

1. range-partition by the order key (md5 of the doc id — hash order
   decorrelates document length from stream position, the same shuffle a
   training pipeline wants anyway) and pin the layout with an eager
   ``localCheckpoint`` so partition ids are frozen data, not a recompute;
2. one tiny job collects per-partition token totals (O(partitions) rows)
   and turns them into exclusive per-partition offsets, broadcast-joined
   back;
3. the running sum WITHIN each partition is an ordinary partitioned
   window — every partition scans in parallel — and the global position is
   ``partition offset + local running sum``.

The result is a pure function of the corpus (keys are md5 of ids): any
partition count gives byte-identical positions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """-> (id_col, n_tokens, start_pos, chunk_first, chunk_last).

    ``start_pos`` is the document's first-token offset in the packed
    stream (each doc is followed by one separator token); ``chunk_first``
    / ``chunk_last`` are the ``seq_len`` windows its real tokens land in —
    documents straddle chunk boundaries, as concat-and-chunk intends.
    """
    n_tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    d = docs.select(
        id_col,
        F.md5(F.col(id_col).cast("string")).alias("_k"),
        n_tok.cast("long").alias("n_tokens"),
    ).withColumn("_slot", F.col("n_tokens") + 1)
    if num_partitions:
        d = d.repartitionByRange(num_partitions, "_k")
    else:
        d = d.repartitionByRange("_k")
    # freeze the physical layout: partition ids become plain data
    d = d.withColumn("_pid", F.spark_partition_id()).localCheckpoint(eager=True)

    spark = docs.sparkSession
    totals = {
        r._pid: r.total
        for r in d.groupBy("_pid").agg(F.sum("_slot").alias("total")).collect()
    }
    offsets, running = [], 0
    for pid in sorted(totals):
        offsets.append((pid, running))
        running += totals[pid]
    if not offsets:
        offsets = [(0, 0)]
    off = spark.createDataFrame(offsets, ["_pid", "_offset"])

    w = (
        Window.partitionBy("_pid")
        .orderBy("_k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.col("_offset") + F.sum("_slot").over(w)
    start = (cum - F.col("_slot")).alias("start_pos")
    return (
        d.join(F.broadcast(off), "_pid")
        .select(id_col, "n_tokens", start)
        .withColumn("chunk_first", F.expr(f"start_pos div {seq_len}"))
        .withColumn(
            "chunk_last",
            F.expr(f"(start_pos + greatest(n_tokens - 1, 0)) div {seq_len}"),
        )
    )


def pack_sequences_oracle_sql(source_sql: str, seq_len: int, id_col: str = "doc_id") -> str:
    """Independent DuckDB twin (single-node window; the distributed side
    must reproduce it exactly)."""
    return f"""
WITH src AS ({source_sql}),
t AS (
  SELECT {id_col},
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         md5({id_col}::varchar) AS k
  FROM src
),
s AS (
  -- CAST: DuckDB window sum() yields HUGEINT -> pandas float64, the exact
  -- int-vs-float typing class the hardened comparator exists to catch
  SELECT {id_col}, n_tokens,
         CAST(sum(n_tokens + 1) OVER (ORDER BY k
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM t
)
SELECT {id_col}, n_tokens,
       cum - n_tokens - 1 AS start_pos,
       (cum - n_tokens - 1) // {seq_len} AS chunk_first,
       (cum - n_tokens - 1 + greatest(n_tokens - 1, 0)) // {seq_len} AS chunk_last
FROM s
"""
