"""sf0.1 oracle self-run for the pytest-oracle corpus operators.

The driver's correctness artifact compares the 50 registry queries at
sf0.01; the corpus-assembly operators that live beyond the registry cap
(C4, ExactSubstr, SemDeDup, URL dedup, DSIR, BPE, decontamination) are
oracle-certified in pytest at sf0.001/sf0.01. This script re-runs each
against its independent oracle at sf0.1 — 10x the driver's comparison
scale, where partition-count-sensitive bugs hide — and writes one JSON
artifact mirroring the driver's row format.

Usage: python3 scripts/selfcheck_corpus_ops.py [--sf-dir DIR] [--out F]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--out", default=os.path.join(REPO, "CORPUS_OPS_SELF_SF01_R5.json")
    )
    args = ap.parse_args()
    sf = args.sf_dir

    import duckdb
    from pyspark.sql import functions as F

    from security_log_analysis_rust_spark.session import get_spark
    from security_log_analysis_rust_spark.synth import ensure_synthetic
    from util_compare import compare_frames, duck_connection

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      shuffle_partitions=32)
    pages_path = ensure_synthetic(sf)["pages"]
    pages_glob = f"{pages_path}/*.parquet"
    results: dict[str, dict] = {}

    def record(name, got, oracle, t0):
        problems = compare_frames(got, oracle)
        results[name] = {
            "rows_match": len(got) == len(oracle),
            "hash_match": not problems,
            "spark_rows": int(len(got)),
            "oracle_rows": int(len(oracle)),
            "sec": round(time.time() - t0, 2),
            "err": "; ".join(p[:200] for p in problems) or None,
        }
        print(name, "OK" if not problems else "FAIL", results[name]["sec"], "s")

    con = duck_connection(sf)
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    pages = spark.read.parquet(pages_path).select("url", "text")

    # --- C4 clean (log mode) over raw pages
    from security_log_analysis_rust_spark.textops.c4 import (
        c4_clean,
        c4_clean_oracle_sql,
    )

    t0 = time.time()
    got = c4_clean(
        pages, id_col="url", min_words=1, min_lines=1,
        require_terminal_punct=False, ban_brace=False, policy_markers=(),
    ).toPandas()
    oracle = con.sql(
        c4_clean_oracle_sql(
            f"SELECT url, text FROM read_parquet('{pages_glob}')",
            id_col="url", min_words=1, min_lines=1,
            require_terminal_punct=False, ban_brace=False, policy_markers=(),
        )
    ).df()
    record("c4_clean_pages", got, oracle, t0)

    # --- ExactSubstr over documents
    from security_log_analysis_rust_spark.textops.exactsubstr import (
        decontaminate,
        decontaminate_oracle_sql,
        exact_substr_dedup,
        exact_substr_oracle_sql,
    )

    t0 = time.time()
    got = exact_substr_dedup(docs.select("doc_id", "text"), min_len=3).toPandas()
    oracle = con.sql(
        exact_substr_oracle_sql("SELECT doc_id, text FROM documents", min_len=3)
    ).df()
    record("exactsubstr_documents", got, oracle, t0)

    # --- Decontamination (both modes) vs a 5-doc bench set
    bench = docs.orderBy("doc_id").limit(5).select("text")
    bsql = "SELECT text FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 5)"
    for mode in ("excise", "drop"):
        t0 = time.time()
        got = decontaminate(
            docs.select("doc_id", "text"), bench, n=5, mode=mode
        ).toPandas()
        oracle = con.sql(
            decontaminate_oracle_sql(
                "SELECT doc_id, text FROM documents", bsql, n=5, mode=mode
            )
        ).df()
        record(f"decontaminate_{mode}", got, oracle, t0)

    # --- SemDeDup over embeddings (auto centroid count)
    from security_log_analysis_rust_spark.textops.semdedup import (
        semdedup,
        semdedup_oracle_sql,
    )

    t0 = time.time()
    got = semdedup(
        emb, threshold=0.35, n_centroids=None, target_cluster=256
    ).toPandas()
    oracle = con.sql(
        semdedup_oracle_sql(threshold=0.35, n_centroids=None, target_cluster=256)
    ).df()
    record("semdedup_auto", got, oracle, t0)

    # --- URL dedup over pages + crafted variants
    from security_log_analysis_rust_spark.textops.domains import (
        url_dedup,
        url_dedup_oracle_sql,
    )

    t0 = time.time()
    corpus = pages.unionByName(
        pages.orderBy("url").limit(200).selectExpr(
            "concat(url, '?utm_source=feed#top') AS url", "text"
        )
    )
    got = url_dedup(corpus).select("url").toPandas()
    base_sql = (
        f"SELECT url, text FROM read_parquet('{pages_glob}') UNION ALL "
        f"SELECT url || '?utm_source=feed#top', text FROM "
        f"(SELECT * FROM read_parquet('{pages_glob}') ORDER BY url LIMIT 200)"
    )
    oracle = con.sql(url_dedup_oracle_sql(base_sql)).df()
    record("url_dedup_pages", got, oracle, t0)

    # --- DSIR selection (target = src0 documents)
    from security_log_analysis_rust_spark.textops.dsir import (
        dsir_select,
        dsir_select_oracle_sql,
    )

    t0 = time.time()
    got = dsir_select(
        docs.select("doc_id", "text"),
        docs.filter(F.col("source") == "src0").select("doc_id", "text"),
        k=500,
    ).toPandas()
    oracle = con.sql(
        dsir_select_oracle_sql(
            "SELECT doc_id, text FROM documents",
            "SELECT doc_id, text FROM documents WHERE source = 'src0'",
            k=500,
        )
    ).df()
    record("dsir_select", got, oracle, t0)

    # --- BPE merge sequence vs the reference trainer
    from security_log_analysis_rust_spark.textops.bpe import (
        bpe_train,
        bpe_train_reference,
        word_counts,
    )

    t0 = time.time()
    got_merges = bpe_train(docs.select("doc_id", "text"), n_merges=30)
    wc = {r.word: r.n for r in word_counts(docs.select("doc_id", "text")).collect()}
    want_merges = bpe_train_reference(wc, n_merges=30)
    ok = got_merges == want_merges
    results["bpe_train_vs_reference"] = {
        "rows_match": ok,
        "hash_match": ok,
        "spark_rows": len(got_merges),
        "oracle_rows": len(want_merges),
        "sec": round(time.time() - t0, 2),
        "err": None if ok else "merge sequences differ",
    }
    print("bpe_train_vs_reference", "OK" if ok else "FAIL",
          results["bpe_train_vs_reference"]["sec"], "s")

    # --- Quality classifier: train on source labels, score+select ALL docs,
    # composed score->pareto oracle with the trained weights pinned in SQL
    from security_log_analysis_rust_spark.textops.classifier import (
        pareto_select,
        pareto_select_oracle_sql,
        score_docs_classifier,
        score_oracle_sql,
        train_classifier,
    )

    t0 = time.time()
    train = docs.withColumn(
        "label", F.col("source").isin("src0", "src1").cast("int")
    )
    model = train_classifier(train, dim=4096, lr=2.0, iters=5, l2=1e-4)
    got = pareto_select(score_docs_classifier(docs, model)).toPandas()
    oracle = con.sql(
        pareto_select_oracle_sql(
            score_oracle_sql("SELECT doc_id, text FROM documents", model)
        )
    ).df()
    record("quality_classifier_select", got, oracle, t0)

    # --- HTML -> text extraction over the real binary html column
    from security_log_analysis_rust_spark.textops.html import (
        extract_text,
        extract_text_oracle_sql,
    )

    t0 = time.time()
    got = extract_text(
        spark.read.parquet(pages_path).select("url", "html")
    ).toPandas()
    oracle = con.sql(
        extract_text_oracle_sql(
            f"SELECT url, html FROM read_parquet('{pages_glob}')"
        )
    ).df()
    record("html_extract_text", got, oracle, t0)

    con.close()
    n_ok = sum(1 for r in results.values() if r["hash_match"])
    out = {
        "sf_dir": sf,
        "n_ok": n_ok,
        "n_total": len(results),
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"ok": n_ok, "total": len(results), "out": args.out}))
    spark.stop()
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
