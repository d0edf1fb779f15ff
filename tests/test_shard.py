"""Deterministic shuffle-shard output + token-budget mixture planner."""

from __future__ import annotations

import contextlib
import io
import math

from pyspark.sql import functions as F

from util_compare import compare_frames, duck_connection

TESTDATA = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(f"{TESTDATA}/documents.parquet").select(
        "doc_id", "source", "text"
    )


def test_shuffle_shards_oracle_parity(spark):
    from security_log_analysis_rust_spark.textops.shard import (
        shuffle_shards,
        shuffle_shards_oracle_sql,
    )

    got = shuffle_shards(
        _docs(spark).select("doc_id", "source"), n_shards=8, salt="e1"
    ).toPandas()
    con = duck_connection(TESTDATA)
    try:
        oracle = con.sql(
            shuffle_shards_oracle_sql(
                "SELECT doc_id, source FROM documents", n_shards=8, salt="e1"
            )
        ).df()
    finally:
        con.close()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)
    assert len(got) == 500


def test_shuffle_shards_string_id_oracle_parity(spark):
    """String ids (urls, incl. replica '#' suffixes) hash identically on
    both sides — the bench path shards by url, not a bigint."""
    from security_log_analysis_rust_spark.textops.shard import (
        shuffle_shards,
        shuffle_shards_oracle_sql,
    )

    docs = spark.read.parquet(f"{TESTDATA}/documents.parquet").selectExpr(
        "concat('https://ex.com/', doc_id, '#', source) AS url", "source"
    )
    got = shuffle_shards(docs, n_shards=4, id_col="url", salt="s").toPandas()
    con = duck_connection(TESTDATA)
    try:
        oracle = con.sql(
            shuffle_shards_oracle_sql(
                "SELECT 'https://ex.com/' || doc_id || '#' || source AS url,"
                " source FROM documents",
                n_shards=4, id_col="url", salt="s",
            )
        ).df()
    finally:
        con.close()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)
    assert len(got) == 500


def test_shuffle_is_partitioning_invariant_and_balanced(spark):
    from security_log_analysis_rust_spark.textops.shard import shuffle_shards

    docs = _docs(spark).select("doc_id", "source")
    a = sorted(
        map(tuple, shuffle_shards(docs, 8).select(
            "doc_id", "shard", "pos").collect())
    )
    b = sorted(
        map(tuple, shuffle_shards(docs.repartition(13), 8).select(
            "doc_id", "shard", "pos").collect())
    )
    assert a == b

    sizes = {}
    for _, s, _ in a:
        sizes[s] = sizes.get(s, 0) + 1
    assert len(sizes) == 8  # every shard populated
    assert max(sizes.values()) < 2.5 * min(sizes.values()), sizes

    # each shard is an unbiased sample: sources interleave inside a shard
    shard0 = shuffle_shards(docs, 8).filter("shard = 0")
    n_sources = shard0.select("source").distinct().count()
    assert n_sources >= 10  # 20 sources at sf0.01


def test_epoch_salts_give_independent_orders(spark):
    from security_log_analysis_rust_spark.textops.shard import shuffle_shards

    docs = _docs(spark).select("doc_id")
    e1 = {r.doc_id: (r.shard, r.pos)
          for r in shuffle_shards(docs, 8, salt="e1").collect()}
    e2 = {r.doc_id: (r.shard, r.pos)
          for r in shuffle_shards(docs, 8, salt="e2").collect()}
    moved = sum(1 for d in e1 if e1[d] != e2[d])
    assert moved > 450  # re-salting re-permutes essentially everything


def test_single_shuffle_plan(spark):
    """The whole shuffle+order is ONE exchange (the window's hash
    partition on shard) — no global sort, no second shuffle."""
    from security_log_analysis_rust_spark.textops.shard import shuffle_shards

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        shuffle_shards(_docs(spark), 16).explain("formatted")
    plan = buf.getvalue()
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_write_shards_replayable_order(spark, tmp_path):
    from security_log_analysis_rust_spark.textops.shard import write_shards

    out = str(tmp_path / "shards")
    write_shards(_docs(spark).select("doc_id"), out, n_shards=4)
    back = spark.read.parquet(out)
    assert back.count() == 500
    # pos is contiguous 1..n within every shard
    agg = back.groupBy("shard").agg(
        F.count("*").alias("n"),
        F.min("pos").alias("lo"),
        F.max("pos").alias("hi"),
        F.countDistinct("pos").alias("d"),
    ).collect()
    assert len(agg) == 4
    for r in agg:
        assert (r.lo, r.hi, r.d) == (1, r.n, r.n)
    # physical row order within a shard's files replays pos order
    one = spark.read.parquet(f"{out}/shard=0").select("pos").collect()
    vals = [r.pos for r in one]
    assert vals == sorted(vals)


def test_plan_mixture_waterfilling():
    from security_log_analysis_rust_spark.textops.domains import plan_mixture

    avail = {"web": 1000, "code": 100, "books": 400}
    # target 50/25/25 with budget 600: code wants 150 but has 100 ->
    # saturates; its unmet 50 re-spreads over web/books at 2:1
    rates = plan_mixture(avail, {"web": 0.5, "code": 0.25, "books": 0.25}, 600)
    takes = {s: rates[s] * avail[s] for s in avail}
    assert rates["code"] == 1.0
    assert math.isclose(sum(takes.values()), 600)
    # web:books stays 2:1 after code saturates
    assert math.isclose(takes["web"] / takes["books"], 2.0)

    # infeasible budget -> keep everything with positive weight
    r2 = plan_mixture(avail, {"web": 1, "code": 1, "books": 1}, 10_000)
    assert r2 == {"web": 1.0, "code": 1.0, "books": 1.0}

    # zero weight excluded; zero budget keeps nothing
    r3 = plan_mixture(avail, {"web": 1.0, "code": 0.0, "books": 1.0}, 200)
    assert r3["code"] == 0.0
    assert math.isclose(sum(r3[s] * avail[s] for s in avail), 200)
    assert plan_mixture(avail, {"web": 1.0}, 0) == {
        "web": 0.0, "code": 0.0, "books": 0.0}


def test_plan_mixture_properties_hypothesis():
    """Waterfilling invariants on random instances: rates in [0,1];
    takes conserve the budget when feasible (everything kept when not);
    unsaturated sources keep exact target proportions."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from security_log_analysis_rust_spark.textops.domains import plan_mixture

    @settings(max_examples=200, deadline=None)
    @given(
        st.dictionaries(
            st.sampled_from([f"s{i}" for i in range(8)]),
            st.tuples(
                st.integers(min_value=1, max_value=10_000),   # avail
                st.floats(min_value=0.01, max_value=10.0),    # weight
            ),
            min_size=1,
            max_size=8,
        ),
        st.integers(min_value=0, max_value=40_000),
    )
    def check(cfg, budget):
        avail = {s: a for s, (a, _) in cfg.items()}
        weights = {s: w for s, (_, w) in cfg.items()}
        rates = plan_mixture(avail, weights, budget)
        assert set(rates) == set(avail)
        assert all(0.0 <= r <= 1.0 + 1e-12 for r in rates.values())
        takes = {s: rates[s] * avail[s] for s in avail}
        total_avail = sum(avail.values())
        if budget >= total_avail:
            assert all(rates[s] == 1.0 for s in avail)
        else:
            assert math.isclose(
                sum(takes.values()), budget, rel_tol=1e-9, abs_tol=1e-6
            )
            # unsaturated sources match target proportions exactly
            unsat = [s for s in avail if rates[s] < 1.0 - 1e-12]
            for x in unsat:
                for y in unsat:
                    assert math.isclose(
                        takes[x] * weights[y],
                        takes[y] * weights[x],
                        rel_tol=1e-9,
                        abs_tol=1e-6,
                    )

    check()


def test_plan_mixture_feeds_mixture_thin(spark):
    """Composed end-to-end: plan rates from real per-source counts, thin
    with them, and land within the binomial tolerance of the budget."""
    from security_log_analysis_rust_spark.textops.domains import (
        mixture_thin,
        plan_mixture,
    )

    docs = _docs(spark)
    avail = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    weights = {s: 1.0 for s in avail}
    rates = plan_mixture(avail, weights, budget=250)
    kept = mixture_thin(docs, rates).count()
    assert abs(kept - 250) < 60  # md5 buckets approximate the rates
