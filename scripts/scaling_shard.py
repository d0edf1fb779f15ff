"""Two-parallelism scaling evidence for the shuffle-shard output step.

Same protocol as the engine's other scaling artifacts: the input corpus
(sf0.1 pages replicated R times with replica-distinct urls, shared
on-disk parquet) is shuffled into 256 shards with a salted-md5
within-shard order; the measured job forces the full window (count +
max(pos)). The op is ONE exchange + per-shard sort — the purest
shuffle-bound workload in the engine, so this artifact is effectively a
shuffle-bandwidth scaling measurement.

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

    from security_log_analysis_rust_spark.synth import ensure_synthetic

    out = os.path.join(REPO, "data", f"shard_bench_corpus_x{replicate}.parquet")
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
    from security_log_analysis_rust_spark.textops.shard import shuffle_shards

    spark = get_spark(cpus=cpus, shuffle_partitions=max(cpus * 2, 16))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
    corpus_path = _materialize_corpus(spark, sf_dir, replicate)
    corpus = spark.read.parquet(corpus_path)
    times = []

    def job():
        # sum(length(text)) keeps the payload column alive through the
        # exchange — without it Catalyst prunes text and the measured
        # shuffle carries only urls, nothing like a real shard write
        row = (
            shuffle_shards(corpus, n_shards=256, id_col="url")
            .agg(
                F.count("*").alias("n"),
                F.max("pos").alias("mp"),
                F.sum(F.length("text")).alias("bytes"),
            )
            .collect()[0]
        )
        return int(row["n"]), int(row["mp"]), int(row["bytes"])

    t0 = time.time()
    warm = job()
    warm_s = time.time() - t0
    for _ in range(trials):
        t0 = time.time()
        got = job()
        times.append(round(time.time() - t0, 2))
        assert got == warm, "nondeterministic shuffle across trials"
    best = min(times)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "pages": warm[0],
                "max_shard_pos": warm[1],
                "warm_seconds": round(warm_s, 2),
                "trial_seconds": times,
                "best_seconds": best,
                "pages_per_sec": round(warm[0] / best, 1),
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
        "--out", default=os.path.join(REPO, "SCALING_SHARD_R5.json")
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
            raise RuntimeError(f"level {cpus} failed: {proc.stderr[-2000:]}")
        results[f"local[{cpus}]"] = json.loads(
            proc.stdout.strip().splitlines()[-1]
        )

    lo, hi = levels
    tlo = results[f"local[{lo}]"]["pages_per_sec"]
    thi = results[f"local[{hi}]"]["pages_per_sec"]
    out = {
        "metric": (
            "shuffle-shard output scaling "
            "(one exchange + per-shard sort, two parallelism levels)"
        ),
        "workload": f"sf0.1 pages x{args.replicate}, n_shards=256",
        "levels": results,
        "speedup": round(thi / tlo, 3),
        "efficiency": round((thi / tlo) / (hi / lo), 3),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
