"""Two-parallelism scaling evidence for the quality-classifier pipeline
(train + score + Pareto select).

Same protocol as the engine's other scaling artifacts: the input corpus
is materialized to parquet once (sf0.1 documents replicated R times with
replica-distinct doc_ids; text and source labels repeat, so the model
learns the same separable signal at every scale) and each parallelism
level runs in its own cold subprocess over the identical on-disk files
with 16 MB splits. The measured job is the full filter pipeline: 3
full-batch GD iterations (each = broadcast weight join + two partial-agg
shuffles + a vocabulary-bounded gradient collect) followed by scoring
and the Pareto selection count.

Determinism note: distributed float sums commute only up to rounding, so
trained weights can differ in the last ulps across trials; the scored
row count is asserted exactly, the Pareto-kept count within a +-5 band
(scores sit nowhere near the acceptance boundary except by luck).

Run with no args for the 4-vs-16 comparison; ``--cpus N`` acts as one
measured level (used by the parent).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _materialize_corpus(spark, sf_dir: str, replicate: int) -> str:
    from pyspark.sql import functions as F

    out = os.path.join(REPO, "data", f"clf_bench_corpus_x{replicate}.parquet")
    if not os.path.exists(out):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "source", "text"
        )
        n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
        (
            docs.repartition(32)
            .select(
                F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))).alias(
                    "rep"
                ),
                "doc_id",
                "source",
                "text",
            )
            .select(
                (F.col("doc_id") + F.col("rep") * F.lit(n)).alias("doc_id"),
                "source",
                "text",
            )
            .write.mode("overwrite")
            .parquet(out)
        )
    return out


def run_level(cpus: int, sf_dir: str, replicate: int, trials: int) -> None:
    sys.path.insert(0, REPO)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from pyspark.sql import functions as F

    from security_log_analysis_rust_spark.session import get_spark
    from security_log_analysis_rust_spark.textops.classifier import (
        pareto_select,
        score_docs_classifier,
        train_classifier,
    )

    spark = get_spark(cpus=cpus, shuffle_partitions=max(cpus * 2, 16))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
    corpus_path = _materialize_corpus(spark, sf_dir, replicate)
    docs = spark.read.parquet(corpus_path)
    n_docs = docs.count()
    times = []

    def job():
        model = train_classifier(
            docs.withColumn(
                "label", F.col("source").isin("src0", "src1").cast("int")
            ),
            dim=4096, lr=2.0, iters=3, l2=1e-4,
        )
        scored = score_docs_classifier(docs, model)
        kept = pareto_select(scored).count()
        return n_docs, kept

    t0 = time.time()
    warm = job()
    warm_s = time.time() - t0
    for _ in range(trials):
        t0 = time.time()
        got = job()
        times.append(round(time.time() - t0, 2))
        assert got[0] == warm[0], "scored-row count must be deterministic"
        assert abs(got[1] - warm[1]) <= 5, f"kept drifted: {got[1]} vs {warm[1]}"
    best = min(times)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "docs": n_docs,
                "pareto_kept": warm[1],
                "warm_seconds": round(warm_s, 2),
                "trial_seconds": times,
                "best_seconds": best,
                "docs_per_sec": round(n_docs / best, 1),
            }
        )
    )
    spark.stop()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicate", type=int, default=64)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--levels", default="4,16")
    ap.add_argument(
        "--out", default=os.path.join(REPO, "SCALING_CLASSIFIER_R5.json")
    )
    args = ap.parse_args()

    if args.cpus is not None:
        run_level(args.cpus, args.sf_dir, args.replicate, args.trials)
        return

    levels = [int(x) for x in args.levels.split(",")]
    results = {}
    for cpus in levels:
        proc = subprocess.run(
            [
                sys.executable, os.path.abspath(__file__),
                "--cpus", str(cpus),
                "--sf-dir", args.sf_dir,
                "--replicate", str(args.replicate),
                "--trials", str(args.trials),
            ],
            capture_output=True, text=True, cwd=REPO,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"level {cpus} failed: {proc.stderr[-2000:]}"
            )
        results[f"local[{cpus}]"] = json.loads(
            proc.stdout.strip().splitlines()[-1]
        )

    lo, hi = levels
    tlo = results[f"local[{lo}]"]["docs_per_sec"]
    thi = results[f"local[{hi}]"]["docs_per_sec"]
    out = {
        "metric": (
            "quality-classifier pipeline scaling "
            "(train 3 GD iters + score + Pareto select, two parallelism levels)"
        ),
        "workload": f"sf0.1 documents x{args.replicate}, dim=4096",
        "levels": results,
        "speedup": round(thi / tlo, 3),
        "efficiency": round((thi / tlo) / (hi / lo), 3),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
