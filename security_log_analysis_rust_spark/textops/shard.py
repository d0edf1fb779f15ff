"""Deterministic global shuffle + sharding for training output.

The last step of every pretraining data pipeline: the filtered corpus must
be (a) globally shuffled — gradient quality collapses if a model sees one
domain for a million consecutive steps — and (b) written as N
roughly-equal shards that the training loader streams independently.

Spark-first and engine-reproducible:

* **shard assignment** is the md5-bucket idiom (`md5(id || ':shard' ||
  salt)`) — a pure map, so membership is stable under re-partitioning,
  re-runs, appends, and engine choice, and each shard is an unbiased
  random sample of the corpus (domains interleave by construction);
* **within-shard order** is `row_number()` over `(md5(id || ':ord' ||
  salt), id)` partitioned by shard — ONE shuffle total (the window's
  hash-partition on `shard`), no global sort. Each shard sorts
  independently; at 100 TB you pick `n_shards` so a shard fits a task
  (e.g. 100k shards of ~1 GB), which is exactly the shape the training
  loader wants anyway.
* the `id` tiebreak makes the order total even under md5 collisions, so
  the output is a pure function of the corpus — certified against a
  DuckDB twin computing the same window.

``salt`` gives independent epoch shuffles: salt='epoch1', 'epoch2', ...
re-shuffle the same corpus into statistically independent orders without
any RNG state to carry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _md5_key(id_col: str, tag: str, salt: str):
    return F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{tag}:{salt}"))
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """-> input columns + (shard, pos): deterministic global shuffle.

    ``shard`` in [0, n_shards); ``pos`` is the 1-based position within the
    shard under the salted-md5 order. Reading shards in shard order and
    rows in pos order replays one fixed global permutation of the corpus.
    """
    shard = (
        F.conv(F.substring(_md5_key(id_col, "shard", salt), 1, 8), 16, 10)
        .cast("long")
        % n_shards
    ).alias("shard")
    order_key = _md5_key(id_col, "ord", salt)
    w = Window.partitionBy("shard").orderBy(order_key, F.col(id_col))
    return (
        df.select("*", shard)
        .withColumn("pos", F.row_number().over(w))
    )


def shuffle_shards_oracle_sql(
    source_sql: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> str:
    """Independent DuckDB twin of :func:`shuffle_shards`."""
    shard = (
        f"CAST(('0x' || substr(md5({id_col}::varchar || ':shard:{salt}'), "
        f"1, 8)) AS BIGINT) % {n_shards}"
    )
    okey = f"md5({id_col}::varchar || ':ord:{salt}')"
    return f"""
WITH src AS ({source_sql}),
sharded AS (SELECT *, {shard} AS shard FROM src)
SELECT *,
       CAST(row_number() OVER (PARTITION BY shard
                               ORDER BY {okey}, {id_col}) AS INT) AS pos
FROM sharded
"""


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> None:
    """Materialize the shuffle as parquet partitioned by shard: one
    directory per shard, rows within each file ordered by pos. The
    window in :func:`shuffle_shards` already hash-partitioned by shard
    and sorted within it, so the write adds NO extra shuffle — each task
    streams its (whole) shards straight into their directories."""
    (
        shuffle_shards(df, n_shards, id_col, salt)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
