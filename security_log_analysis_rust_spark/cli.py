"""CLI — the reference's subcommand surface (``src/parse_opts.rs:34-87``)
re-expressed over the Spark engine. A user of the reference can run the same
verbs::

    python -m security_log_analysis_rust_spark parse   --pages DIR --sink DIR
    python -m security_log_analysis_rust_spark db      --sink DIR --out DIR
    python -m security_log_analysis_rust_spark read    --out DIR [--service s]
    python -m security_log_analysis_rust_spark export  --sink DIR --path P
    python -m security_log_analysis_rust_spark import  --sink DIR --path P
    python -m security_log_analysis_rust_spark report  --sink DIR --html P
    python -m security_log_analysis_rust_spark daemon  --in DIR --sink DIR

parse  = incremental checkpointed ingest (E1 analog)
db     = monthly enriched parquet export (E2 step 1, K5)
read   = per-country counts from the export, top-10 print (E2 step 2, A2/O3)
export/import = JSON out/in (K7/S9)
report = per-country counts + geochart HTML (E3/K8)
daemon = streaming journald follow (S5)
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def _spark(args):
    from .session import get_spark

    return get_spark(app_name="security-log-analysis", cpus=args.cpus)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="security_log_analysis_rust_spark")
    ap.add_argument("--cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("parse", help="incremental checkpointed ingest")
    p.add_argument("--pages", required=True)
    p.add_argument("--sink", required=True)
    p.add_argument("--files-per-split", type=int, default=4)
    p.add_argument("--watermark", action="store_true")

    p = sub.add_parser("db", help="monthly enriched parquet export")
    p.add_argument("--sink", required=True)
    p.add_argument("--dims", required=True, help="dir with host_country/country_code parquet")
    p.add_argument("--out", required=True)

    p = sub.add_parser("read", help="per-country counts from the export")
    p.add_argument("--out", required=True)
    p.add_argument("--service", default=None)
    p.add_argument("--server", default=None)

    p = sub.add_parser("export", help="intrusion rows -> JSON (limit 1000)")
    p.add_argument("--sink", required=True)
    p.add_argument("--path", required=True)
    p.add_argument("--limit", type=int, default=1000)

    p = sub.add_parser("import", help="JSON -> intrusion sink (dedup append)")
    p.add_argument("--sink", required=True)
    p.add_argument("--path", required=True)

    p = sub.add_parser("report", help="per-country counts + geochart HTML")
    p.add_argument("--sink", required=True)
    p.add_argument("--dims", required=True)
    p.add_argument("--html", default=None)

    p = sub.add_parser("daemon", help="streaming journald follow")
    p.add_argument("--input", required=True)
    p.add_argument("--sink", required=True)
    p.add_argument("--server", default="home.ddboline.net")
    p.add_argument("--follow", action="store_true", help="keep tailing")

    args = ap.parse_args(argv)
    spark = _spark(args)
    try:
        return _dispatch(spark, args)
    finally:
        spark.stop()


def _dispatch(spark, args) -> int:
    if args.cmd == "parse":
        from .pipeline.checkpoint import metrics, run_incremental

        r = run_incremental(
            spark,
            args.pages,
            args.sink,
            files_per_split=args.files_per_split,
            watermark=args.watermark,
        )
        print(json.dumps({"completed": r.splits_completed, "skipped": r.splits_skipped,
                          "rows": r.rows, "metrics": metrics(args.sink)}))
        return 0

    if args.cmd == "db":
        import os

        from .pipeline.enrich import enrich_events
        from .pipeline.export import export_monthly

        intr = spark.read.parquet(os.path.join(args.sink, "intrusion_log"))
        hc = spark.read.parquet(os.path.join(args.dims, "host_country.parquet"))
        cc = spark.read.parquet(os.path.join(args.dims, "country_code.parquet"))
        enriched = enrich_events(intr, hc, cc).select(
            "service", "server", "datetime", "host", "username", "code", "country"
        )
        export_monthly(enriched, args.out)
        print(json.dumps({"exported": spark.read.parquet(args.out).count()}))
        return 0

    if args.cmd == "read":
        from .pipeline.aggregate import per_country_counts

        df = spark.read.parquet(args.out)
        pc = per_country_counts(
            df.filter(F.col("country").isNotNull()),
            service=args.service,
            server=args.server,
        )
        for r in pc.limit(10).collect():  # O3 top-10 print
            print(f"{r['country']}\t{r['count']}")
        return 0

    if args.cmd == "export":
        import os

        from .sources.logfiles import export_json

        intr = spark.read.parquet(os.path.join(args.sink, "intrusion_log"))
        export_json(intr, args.path, limit=args.limit)
        print(json.dumps({"exported": min(args.limit, intr.count())}))
        return 0

    if args.cmd == "import":
        import os

        from .pipeline.route import append_dedup
        from .sources.logfiles import import_json

        rows = import_json(spark, args.path)
        n = append_dedup(spark, os.path.join(args.sink, "intrusion_log"), rows)
        print(json.dumps({"appended": n}))
        return 0

    if args.cmd == "report":
        import os

        from .pipeline.aggregate import per_country_counts
        from .pipeline.enrich import enrich_events
        from .pipeline.export import country_report_html

        intr = spark.read.parquet(os.path.join(args.sink, "intrusion_log"))
        hc = spark.read.parquet(os.path.join(args.dims, "host_country.parquet"))
        cc = spark.read.parquet(os.path.join(args.dims, "country_code.parquet"))
        pc = per_country_counts(enrich_events(intr, hc, cc, how="inner"))
        if args.html:
            country_report_html(pc, args.html)
            print(json.dumps({"html": args.html}))
        else:
            for r in pc.limit(10).collect():
                print(f"{r['country']}\t{r['count']}")
        return 0

    if args.cmd == "daemon":
        from .streaming.journald_stream import start_journald_ingest

        q = start_journald_ingest(
            spark,
            args.input,
            args.sink,
            available_now=not args.follow,
            server=args.server,
        )
        q.awaitTermination()
        print(json.dumps({"stopped": True}))
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
