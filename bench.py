#!/usr/bin/env python3
"""Benchmark harness.

Default: run the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON
line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "docs_per_sec": ..., "lines_per_sec": ...}

``--scaling``: run the same parse+enrich+aggregate job at two parallelism
levels (local[8] vs local[32]) over an input replicated large enough to be
compute-bound, and report throughput at both plus scaling efficiency
(the in-sandbox stand-in for the north rule's N -> 4N executor criterion).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _spark(cpus: int, shuffle: int):
    from security_log_analysis_rust_spark.session import get_spark

    return get_spark(
        app_name=f"sla-bench-{cpus}", cpus=cpus, shuffle_partitions=shuffle
    )


def _pipeline_dfs(spark, sf_dir, replicate: int = 1):
    from security_log_analysis_rust_spark.pipeline.parse import extract_events
    from security_log_analysis_rust_spark.synth import ensure_synthetic

    paths = ensure_synthetic(sf_dir)
    pages = spark.read.parquet(*([paths["pages"]] * replicate))
    hc = spark.read.parquet(paths["host_country"])
    cc = spark.read.parquet(paths["country_code"])
    out = extract_events(pages)
    return pages, out["events"], out["systemd"], hc, cc


def run_headline(spark, sf_dir: str) -> dict:
    """Each query timed end-to-end (scan -> result), cold plans."""
    from pyspark.sql import functions as F

    from security_log_analysis_rust_spark.pipeline.aggregate import (
        per_country_counts,
        per_day_counts,
        per_host_counts,
    )
    from security_log_analysis_rust_spark.pipeline.enrich import enrich_events
    from security_log_analysis_rust_spark.pipeline.route import dedup_intrusions

    times, extras = {}, {}

    def timed(name, fn):
        t0 = time.time()
        r = fn()
        times[name] = round(time.time() - t0, 3)
        return r

    pages, events, systemd, hc, cc = _pipeline_dfs(spark, sf_dir)
    extras["pages"] = pages.count()
    extras["lines"] = pages.select(
        F.sum(F.size(F.split(F.coalesce("text", F.lit("")), "\n")))
    ).collect()[0][0]

    # q1: full parse -> dedup -> intrusion_log rows (parse+route)
    extras["intrusion_rows"] = timed(
        "q1_parse_route", lambda: dedup_intrusions(events).count()
    )
    # q2: parse -> enrich -> per-country counts (the flagship A1)
    timed(
        "q2_per_country",
        lambda: per_country_counts(
            enrich_events(dedup_intrusions(events), hc, cc, how="inner")
        ).collect(),
    )
    # q3: per-host counts (skewed key aggregation)
    timed("q3_per_host", lambda: per_host_counts(events).collect())
    # q4: per-day counts
    timed("q4_per_day", lambda: per_day_counts(events).collect())
    # q5: systemd routing
    extras["systemd_rows"] = timed("q5_systemd_route", lambda: systemd.count())

    # q6-q8: training-data ops on the driver's testdata tables
    import __spark_entry__ as E

    timed("q6_minhash_lsh", lambda: E.q_docs_minhash_lsh(spark, sf_dir).count())
    timed("q7_emb_top1", lambda: E.q_emb_top1(spark, sf_dir).count())
    timed("q8_jaccard", lambda: E.q_docs_jaccard_pairs(spark, sf_dir).count())

    return {"times": times, "extras": extras}


def run_scaling(
    sf_dir: str, replicate: int = 24, levels=(8, 32), trials: int = 2
) -> dict:
    """Same job, two parallelism levels, identical input, steady-state.

    Methodology: per level, run the full measured job once unmeasured
    (JIT, code cache, python daemon spawn, parquet footer cache), then take
    the best of ``trials`` measured runs. This is the honest stand-in for
    N vs 4N executors on a long-running cluster, where per-job cold costs
    are amortized away; cold-start costs are reported separately.
    """
    from security_log_analysis_rust_spark.pipeline.aggregate import per_country_counts
    from security_log_analysis_rust_spark.pipeline.enrich import enrich_events
    from security_log_analysis_rust_spark.pipeline.route import dedup_intrusions

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    results = {}
    for cpus in levels:
        spark = _spark(cpus, shuffle=max(cpus * 2, 16))
        # make input splittable enough for the widest level
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        try:
            pages, events, systemd, hc, cc = _pipeline_dfs(
                spark, sf_dir, replicate=replicate
            )
            n_pages = pages.count()

            def job():
                n_intr = dedup_intrusions(events).count()
                per_country_counts(
                    enrich_events(dedup_intrusions(events), hc, cc, how="inner")
                ).collect()
                n_sys = systemd.count()
                return n_intr, n_sys

            t0 = time.time()
            n_intr, n_sys = job()  # cold pass, not measured
            cold = time.time() - t0
            best = float("inf")
            for _ in range(trials):
                t0 = time.time()
                job()
                best = min(best, time.time() - t0)
            results[f"local[{cpus}]"] = {
                "seconds": round(best, 2),
                "cold_seconds": round(cold, 2),
                "pages": n_pages,
                "docs_per_sec": round(n_pages / best, 1),
                "intrusion_rows": n_intr,
                "systemd_rows": n_sys,
            }
        finally:
            spark.stop()
    lo, hi = f"local[{levels[0]}]", f"local[{levels[1]}]"
    speedup = results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]
    results["speedup"] = round(speedup, 3)
    results["core_ratio"] = levels[1] / levels[0]
    results["scaling_efficiency"] = round(speedup / (levels[1] / levels[0]), 3)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--replicate", type=int, default=16)
    args = ap.parse_args()

    sf = os.path.basename(os.path.normpath(args.sf_dir))
    result = {
        "metric": "parse+enrich+route+aggregate end-to-end seconds (synthetic pages pipeline + training-data ops)",
        "unit": "sec",
        "sf": sf,
    }

    if args.scaling:
        scaling = run_scaling(args.sf_dir, replicate=args.replicate)
        result["scaling"] = scaling
        result["value"] = scaling[f"local[{32}]"]["seconds"]
        result["queries"] = {}
    else:
        spark = _spark(args.cpus, shuffle=max(args.cpus, 16))
        try:
            r = run_headline(spark, args.sf_dir)
        finally:
            spark.stop()
        times = r["times"]
        result["queries"] = times
        result["value"] = round(sum(times.values()), 3)
        result.update(r["extras"])
        pipeline_sec = sum(
            times[k] for k in times if k.startswith(("q1", "q2", "q3", "q4", "q5"))
        )
        result["docs_per_sec"] = round(r["extras"]["pages"] * 5 / pipeline_sec, 1)
        result["lines_per_sec"] = round(r["extras"]["lines"] * 5 / pipeline_sec, 1)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
