"""Bloom-filter incremental dedup: no-false-negative guarantee, measured
FPR vs theory, shard/partitioning invariance, union maintenance, and the
lossy-incremental-dedup flow end-to-end."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _vals(spark, lo, hi, prefix="doc-"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(prefix), F.col("id")).alias("fp")
    )


def test_no_false_negatives_and_fpr(spark):
    from security_log_analysis_rust_spark.textops.bloom import (
        bloom_build,
        bloom_maybe_contains,
    )

    n, n_bits, k = 5000, 1 << 16, 5
    corpus = _vals(spark, 0, n)
    bloom = bloom_build(corpus, "fp", n_bits=n_bits, k=k)

    # every inserted value must probe positive — the hard guarantee
    hits = (
        bloom_maybe_contains(corpus, "fp", bloom)
        .filter(F.col("maybe_dup"))
        .count()
    )
    assert hits == n

    # disjoint probes: measured FPR within 3x of theory
    m_probes = 20000
    fresh = _vals(spark, 0, m_probes, prefix="new-")
    fp = (
        bloom_maybe_contains(fresh, "fp", bloom)
        .filter(F.col("maybe_dup"))
        .count()
    )
    theory = (1 - math.exp(-k * n / n_bits)) ** k
    assert fp / m_probes <= max(3 * theory, 0.01), (fp, theory)


def test_sharded_matches_unsharded_membership(spark):
    from security_log_analysis_rust_spark.textops.bloom import (
        bloom_build,
        bloom_maybe_contains,
    )

    corpus = _vals(spark, 0, 2000)
    probes = _vals(spark, 1000, 4000)  # half dup, half new
    flat = bloom_build(corpus, "fp", n_bits=1 << 15, k=4, shards=1)
    sharded = bloom_build(corpus, "fp", n_bits=1 << 12, k=4, shards=8)
    # same total bits; both must flag every true member
    for bloom in (flat, sharded):
        n_dup_flagged = (
            bloom_maybe_contains(probes, "fp", bloom)
            .filter(F.col("maybe_dup"))
            .filter(F.col("fp").isin([f"doc-{i}" for i in range(1000, 2000)]))
            .count()
        )
        assert n_dup_flagged == 1000


def test_build_partitioning_invariance(spark):
    from security_log_analysis_rust_spark.textops.bloom import bloom_build

    corpus = _vals(spark, 0, 3000)
    a = bloom_build(corpus.coalesce(1), "fp", n_bits=1 << 14, k=3, shards=4)
    b = bloom_build(corpus.repartition(32), "fp", n_bits=1 << 14, k=3, shards=4)
    assert (a.words == b.words).all()


def test_union_equals_build_of_union(spark):
    from security_log_analysis_rust_spark.textops.bloom import bloom_build

    kw = dict(n_bits=1 << 14, k=3, shards=2)
    a = bloom_build(_vals(spark, 0, 1000), "fp", **kw)
    b = bloom_build(_vals(spark, 1000, 2000), "fp", **kw)
    both = bloom_build(_vals(spark, 0, 2000), "fp", **kw)
    assert (a.union(b).words == both.words).all()
    with pytest.raises(ValueError):
        a.union(
            bloom_build(_vals(spark, 0, 10), "fp", n_bits=1 << 13, k=3, shards=2)
        )


def test_incremental_dedup_flow(spark):
    """History -> filter; new batch (40% overlap) -> bloom_filter_new.
    No duplicate survives; FP losses stay within the theoretical bound."""
    from security_log_analysis_rust_spark.textops.bloom import (
        bloom_build,
        bloom_filter_new,
    )

    history = _vals(spark, 0, 4000)
    batch = _vals(spark, 2400, 6400)  # 1600 dups, 2400 new
    bloom = bloom_build(history, "fp", n_bits=1 << 16, k=5)
    survivors = [r.fp for r in bloom_filter_new(batch, "fp", bloom).collect()]
    dup_keys = {f"doc-{i}" for i in range(2400, 4000)}
    assert not dup_keys.intersection(survivors), "a known duplicate survived"
    assert len(survivors) >= 2400 * 0.99, "FP loss above 1%"


def test_empty_build_flags_nothing(spark):
    from security_log_analysis_rust_spark.textops.bloom import (
        bloom_build,
        bloom_maybe_contains,
    )

    empty = _vals(spark, 0, 0)
    bloom = bloom_build(empty, "fp", n_bits=1 << 10, k=3)
    flagged = (
        bloom_maybe_contains(_vals(spark, 0, 500), "fp", bloom)
        .filter(F.col("maybe_dup"))
        .count()
    )
    assert flagged == 0


def test_build_plan_is_one_exchange(spark):
    """The build's only shuffle is the (shard, word_idx) bit_or — sized by
    the filter, not the corpus."""
    from security_log_analysis_rust_spark.textops.bloom import (
        _position_cols,
        _shard_col,
    )

    c = F.col("fp")
    df = (
        _vals(spark, 0, 100)
        .select(
            _shard_col(c, 4).alias("shard"),
            F.explode(F.array(*_position_cols(c, 1 << 10, 3))).alias("pos"),
        )
        .select(
            "shard",
            F.shiftright(F.col("pos"), 6).alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))"
            ).alias("bit"),
        )
        .groupBy("shard", "word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_streaming_cross_batch_dedup(spark, tmp_path):
    """Real Structured Streaming drive: foreachBatch + StreamingBloomDedup
    drops within-batch AND cross-batch duplicates; a restarted instance
    rebuilt from the sink's history keeps the guarantee."""
    import json

    from security_log_analysis_rust_spark.textops.bloom import (
        StreamingBloomDedup,
    )

    indir = tmp_path / "in"
    indir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    emitted = []

    def emit(df, batch_id):
        emitted.append([r.fp for r in df.collect()])

    dedup = StreamingBloomDedup("fp", emit, n_bits=1 << 14, k=5)

    def run_available():
        q = (
            spark.readStream.schema("fp string")
            .json(str(indir))
            .writeStream.foreachBatch(dedup.process)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    (indir / "b1.json").write_text(
        "\n".join(json.dumps({"fp": v}) for v in ["A", "B", "A", "C"])
    )
    run_available()
    assert sorted(x for b in emitted for x in b) == ["A", "B", "C"]

    (indir / "b2.json").write_text(
        "\n".join(json.dumps({"fp": v}) for v in ["B", "D"])
    )
    run_available()
    assert sorted(x for b in emitted for x in b) == ["A", "B", "C", "D"]

    # restart: rebuild the filter from emitted history, not driver memory
    history = spark.createDataFrame(
        [(v,) for b in emitted for v in b], ["fp"]
    )
    dedup2 = StreamingBloomDedup.from_history(
        history, "fp", emit, n_bits=1 << 14, k=5
    )
    batch3 = spark.createDataFrame([("A",), ("E",)], ["fp"])
    dedup2.process(batch3, 99)
    assert sorted(x for b in emitted for x in b) == ["A", "B", "C", "D", "E"]
