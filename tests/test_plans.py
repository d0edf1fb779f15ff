"""Plan-quality and plan-equivalence tests.

The fused single-pass parse must be row-identical to the definitional
per-branch union, and the physical plans must show the properties the scale
design depends on: column pruning at the scan, broadcast joins for
enrichment, no extra shuffles in the narrow stage.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from conftest import TESTDATA_SF_SMALL

from security_log_analysis_rust_spark.pipeline.enrich import enrich_events
from security_log_analysis_rust_spark.pipeline.parse import (
    extract_events,
    extract_events_union,
)
from security_log_analysis_rust_spark.synth import ensure_synthetic


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _pages(spark):
    return spark.read.parquet(ensure_synthetic(TESTDATA_SF_SMALL)["pages"])


def test_fused_equals_union(spark):
    pages = _pages(spark)
    cols = ["url", "line_no", "service", "server", "datetime", "host", "username"]
    fused = {tuple(r) for r in extract_events(pages)["events"].select(*cols).collect()}
    union = {tuple(r) for r in extract_events_union(pages)["events"].select(*cols).collect()}
    assert fused == union
    scols = ["url", "line_no", "log_level", "log_unit", "log_message", "log_timestamp"]
    f_sys = {tuple(r) for r in extract_events(pages)["systemd"].select(*scols).collect()}
    u_sys = {tuple(r) for r in extract_events_union(pages)["systemd"].select(*scols).collect()}
    assert f_sys == u_sys


def test_scan_prunes_html_column(spark):
    plan = _plan(extract_events(_pages(spark))["events"])
    # ReadSchema must not include the big binary column we never touch
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, plan
    assert all("html" not in l for l in read_schema), read_schema


def test_fused_parse_is_single_scan_no_shuffle(spark):
    import re

    plan = _plan(extract_events(_pages(spark))["events"])
    # formatted output lists each node twice (tree + detail section)
    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    assert len(scans) == 1, plan
    assert "Exchange" not in plan, "parse stage must stay narrow"


def test_enrichment_uses_broadcast_joins(spark):
    paths = ensure_synthetic(TESTDATA_SF_SMALL)
    pages = spark.read.parquet(paths["pages"])
    hc = spark.read.parquet(paths["host_country"])
    cc = spark.read.parquet(paths["country_code"])
    enriched = enrich_events(extract_events(pages)["events"], hc, cc)
    plan = _plan(enriched)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "dims must broadcast, never sort-merge"


def test_filter_pushdown_on_sink_read(spark, tmp_path):
    """Predicate pushdown reaches the parquet scan on sink reads."""
    pages = _pages(spark)
    out = str(tmp_path / "intr")
    extract_events(pages)["events"].write.parquet(out)
    df = spark.read.parquet(out).filter(F.col("service") == "ssh")
    plan = _plan(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "service" in pushed[0], plan


def test_incremental_antijoin_prunes_sink_partitions(spark, tmp_path):
    """The ON-CONFLICT anti-join's sink scan must partition-prune to the
    incremental months (VERDICT r1 #4), not re-scan the full sink."""
    from security_log_analysis_rust_spark.pipeline.route import (
        append_dedup,
        dedup_intrusions,
        sink_month_filter,
        to_intrusion_log,
    )

    sink = str(tmp_path / "intrusion_log")
    events = dedup_intrusions(extract_events(_pages(spark))["events"])
    append_dedup(spark, sink, to_intrusion_log(events))
    pruned = sink_month_filter(spark.read.parquet(sink), "2024-07-01 00:00:00")
    plan = _plan(pruned)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "dt_month" in pf[0], plan


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def test_similarity_joins_carry_no_broadcast_hints(spark):
    """The shingle/band/bucket self-joins must not hard-hint a broadcast of a
    corpus-sized frame (VERDICT r1 'What's wrong' #1): the strategy choice is
    left to Catalyst/AQE, which can see measured sizes."""
    import __spark_entry__ as E
    from conftest import TESTDATA_SF_ORACLE

    for q in (E.q_docs_jaccard_pairs, E.q_docs_minhash_lsh, E.q_docs_simhash_dups):
        logical = _analyzed(q(spark, TESTDATA_SF_ORACLE))
        assert "ResolvedHint" not in logical, f"{q.__name__}:\n{logical[:2000]}"


def test_lsh_topk_has_no_joins_and_two_exchanges(spark):
    """lsh_topk (r6 shape): bucketing is a narrow map over plane LITERALS —
    no join, no broadcast, no Window anywhere in the plan — and the whole
    query is exactly two exchanges (bucket groupBy into the kernel, vec_id
    groupBy for the merge). The per-bucket kernel pre-reduces before the
    single-exchange array merge."""
    import re

    from conftest import TESTDATA_SF_ORACLE
    from security_log_analysis_rust_spark.textops.ann import lsh_topk

    emb = spark.read.parquet(f"{TESTDATA_SF_ORACLE}/embeddings.parquet")
    df = lsh_topk(emb, k=3, n_bits=4, n_tables=2)
    logical = _analyzed(df)
    assert "ResolvedHint" not in logical  # nothing needs a broadcast at all
    assert "Join" not in logical, logical[:2000]
    plan = _plan(df)
    assert "FlatMapGroupsInPandas" in plan  # per-bucket kernel present
    assert "Window" not in plan, "merge must be the single-exchange array fold"
    # exactly two HASH exchanges (kernel groupBy + merge groupBy); the only
    # other allowed exchange is spread_small_input's round-robin, which is a
    # no-op on many-split production inputs
    assert plan.count("hashpartitioning") == 2, plan[:2000]
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 3, plan[:2000]


def test_winnow_keys_materialized_behind_barrier(spark):
    """The winnow keys array (all the k-gram md5s) must be computed in a
    DIFFERENT plan node from the window-min lambda: if CollapseProject ever
    inlines it into the mins transform, Catalyst re-evaluates the whole
    array per window — O(n_grams x n_windows) hashing (the r2 bug)."""
    from conftest import TESTDATA_SF_ORACLE
    from security_log_analysis_rust_spark.textops.winnow import (
        winnow_fingerprints,
    )

    docs = spark.read.parquet(f"{TESTDATA_SF_ORACLE}/documents.parquet")
    plan = _plan(winnow_fingerprints(docs))
    # the hashing expression and the window-min expression never share a line
    bad = [
        l for l in plan.splitlines() if "array_min" in l and "md5" in l
    ]
    assert not bad, bad[:2]
    # two generators: the materialization barrier and the fps explode
    assert plan.count("Generate") >= 2, plan[:1500]
