"""Two-parallelism scaling evidence for the ExactSubstr span-dedup operator.

Same protocol as SCALING_C4_R5_1TO4: the input corpus is materialized to
parquet once (sf0.1 pages replicated R times with replica-distinct urls)
and each parallelism level runs in its own cold subprocess over the
identical on-disk files with 16 MB splits. The replicas make the dedup do
real cross-replica work — every window in replica k>0 duplicates replica
0's copy, so the span machinery fires on the whole corpus.

Run with no args for the 1-vs-4 comparison; ``--cpus N`` acts as one
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
MIN_LEN = 8


def _materialize_corpus(spark, sf_dir: str, replicate: int) -> str:
    from pyspark.sql import functions as F

    from security_log_analysis_rust_spark.synth import ensure_synthetic

    out = os.path.join(REPO, "data", f"es_bench_corpus_x{replicate}.parquet")
    if not os.path.exists(out):
        pages = spark.read.parquet(ensure_synthetic(sf_dir)["pages"]).select(
            "url", "text"
        )
        (
            pages.repartition(32)
            .select(
                F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))).alias(
                    "rep"
                ),
                "url",
                "text",
            )
            .select(
                F.concat_ws("#", "url", F.col("rep").cast("string")).alias(
                    "url"
                ),
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
    from security_log_analysis_rust_spark.textops.exactsubstr import (
        exact_substr_dedup,
    )

    spark = get_spark(cpus=cpus, shuffle_partitions=max(cpus * 2, 16))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
    corpus_path = _materialize_corpus(spark, sf_dir, replicate)
    corpus = spark.read.parquet(corpus_path)
    times = []

    def job():
        out = exact_substr_dedup(corpus, min_len=MIN_LEN, id_col="url")
        row = out.agg(
            F.count("*").alias("docs"), F.sum("n_removed").alias("removed")
        ).collect()[0]
        return int(row["docs"]), int(row["removed"])

    t0 = time.time()
    warm = job()
    warm_s = time.time() - t0
    n_pages = corpus.count()
    for _ in range(trials):
        t0 = time.time()
        got = job()
        times.append(round(time.time() - t0, 2))
        assert got == warm, "nondeterministic result across trials"
    best = min(times)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "pages": n_pages,
                "kept_docs": warm[0],
                "tokens_removed": warm[1],
                "warm_seconds": round(warm_s, 2),
                "trial_seconds": times,
                "best_seconds": best,
                "pages_per_sec": round(n_pages / best, 1),
            }
        )
    )
    spark.stop()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicate", type=int, default=4)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--levels", default="1,4")
    ap.add_argument(
        "--out", default=os.path.join(REPO, "SCALING_EXACTSUBSTR_R5.json")
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
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        results[f"local[{cpus}]"] = json.loads(line)
        print(line)
    lo, hi = levels[0], levels[-1]
    a, b = results[f"local[{lo}]"], results[f"local[{hi}]"]
    speedup = a["best_seconds"] / b["best_seconds"]
    efficiency = speedup / (hi / lo)
    out = {
        "metric": "exactsubstr span dedup scaling (same input, two parallelism levels)",
        "workload": f"sf0.1 pages x{args.replicate} replicas, min_len={MIN_LEN}",
        "levels": results,
        "speedup": round(speedup, 3),
        "efficiency": round(efficiency, 3),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"speedup": out["speedup"], "efficiency": out["efficiency"]}))


if __name__ == "__main__":
    main()
