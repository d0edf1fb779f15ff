"""Two-parallelism scaling evidence for the image dHash signature stage
(the Arrow-batched Python decode path — a different execution shape from
the pure-JVM operators: per-task Python workers + Arrow transfer).

Corpus: ``n_base`` distinct images are generated ONCE driver-side (PNG,
smooth sinusoids — the test-suite generator) and replicated R times with
distinct media_ids but identical payloads; decode cost is per-payload,
so identical bytes measure the decode path honestly while keeping
corpus materialization cheap. The measured job is
``dhash_images(...)`` forced through count + a signature checksum
(deterministic across levels and trials). Pairing is NOT measured here
— on this corpus every replica group would explode one bucket; the
pair join's scaling is the already-measured simhash blocking shape.

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
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def _materialize_corpus(spark, n_base: int, replicate: int) -> str:
    out = os.path.join(
        REPO, "data", f"img_bench_corpus_b{n_base}_x{replicate}.parquet"
    )
    if not os.path.exists(out):
        import numpy as np

        from test_textops import _encode_png

        rng = np.random.default_rng(11)
        rows = []
        for i in range(n_base):
            yy, xx = np.mgrid[0:96, 0:128].astype(np.float64)
            img = np.clip(
                128
                + 100
                * np.sin(2 * np.pi * rng.uniform(0.5, 2.5) * xx / 128
                         + rng.uniform(0, 6))
                * np.cos(2 * np.pi * rng.uniform(0.5, 2.5) * yy / 96
                         + rng.uniform(0, 6)),
                0, 255,
            ).astype(np.uint8)
            rows.append((i, bytearray(_encode_png(np.stack([img] * 3, 2),
                                                  filters=[0, 2]))))
        base = spark.createDataFrame(rows, "base_id: long, payload: binary")
        from pyspark.sql import functions as F

        (
            base.repartition(8)
            .select(
                F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))).alias(
                    "rep"
                ),
                "base_id",
                "payload",
            )
            .select(
                (F.col("base_id") + F.col("rep") * F.lit(n_base)).alias(
                    "media_id"
                ),
                "payload",
            )
            .write.mode("overwrite")
            .parquet(out)
        )
    return out


def run_level(cpus: int, n_base: int, replicate: int, trials: int) -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from pyspark.sql import functions as F

    from security_log_analysis_rust_spark.session import get_spark
    from security_log_analysis_rust_spark.textops.imagedup import dhash_images

    spark = get_spark(cpus=cpus, shuffle_partitions=max(cpus * 2, 16))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    corpus_path = _materialize_corpus(spark, n_base, replicate)
    media = spark.read.parquet(corpus_path)
    times = []

    def job():
        row = dhash_images(media).agg(
            F.count("*").alias("n"),
            F.sum(F.pmod(F.col("dhash"), F.lit(1_000_003))).alias("s"),
        ).collect()[0]
        return int(row["n"]), int(row["s"])

    t0 = time.time()
    warm = job()
    warm_s = time.time() - t0
    for _ in range(trials):
        t0 = time.time()
        got = job()
        times.append(round(time.time() - t0, 2))
        assert got == warm, "nondeterministic signatures across trials"
    best = min(times)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "images": warm[0],
                "sig_checksum": warm[1],
                "warm_seconds": round(warm_s, 2),
                "trial_seconds": times,
                "best_seconds": best,
                "images_per_sec": round(warm[0] / best, 1),
            }
        )
    )
    spark.stop()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--n-base", type=int, default=400)
    ap.add_argument("--replicate", type=int, default=96)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--levels", default="4,16")
    ap.add_argument(
        "--out", default=os.path.join(REPO, "SCALING_IMAGEDUP_R5.json")
    )
    args = ap.parse_args()

    if args.cpus is not None:
        run_level(args.cpus, args.n_base, args.replicate, args.trials)
        return

    levels = [int(x) for x in args.levels.split(",")]
    results = {}
    for cpus in levels:
        proc = subprocess.run(
            [
                sys.executable, os.path.abspath(__file__),
                "--cpus", str(cpus),
                "--n-base", str(args.n_base),
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
    tlo = results[f"local[{lo}]"]["images_per_sec"]
    thi = results[f"local[{hi}]"]["images_per_sec"]
    out = {
        "metric": (
            "image dHash signature scaling "
            "(Arrow-batched Python decode path, two parallelism levels)"
        ),
        "workload": (
            f"{args.n_base} base 128x96 PNGs x{args.replicate} replicas"
        ),
        "levels": results,
        "speedup": round(thi / tlo, 3),
        "efficiency": round((thi / tlo) / (hi / lo), 3),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
