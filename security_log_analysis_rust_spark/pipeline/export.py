"""Analytics export sinks — the reference's Parquet/reporting side.

* ``export_monthly`` = K5 (``src/polars_analysis.rs:34-165``): the reference
  rebuilds one Parquet file per (year, month) by reading, v-stacking,
  deduping and rewriting. Spark replaces that read-merge-rewrite dance with
  a table partitioned by month + **dynamic partition overwrite** (the
  Iceberg ``overwritePartitions`` analog): only touched months rewrite.
* ``merge_parquet_files`` = K6 (``:169-195``): union + keep-first dedup.
* ``country_report_html`` = K8 (``src/parse_opts.rs:176-204``): tiny
  driver-side HTML geochart (results are a few hundred rows by construction).
"""

from __future__ import annotations

import html as _html
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def export_monthly(enriched: DataFrame, out_dir: str) -> None:
    """Write the J1-enriched event stream partitioned by (year, month).

    Dynamic mode only overwrites partitions present in this batch — an
    incremental month export never touches historical months.
    """
    spark = enriched.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        enriched.withColumn("year", F.year("datetime"))
        .withColumn("month", F.month("datetime"))
        .repartition("year", "month")
        .write.mode("overwrite")
        .partitionBy("year", "month")
        .parquet(out_dir)
    )


def merge_parquet_files(
    spark: SparkSession, inputs: list, output: str, key: Optional[list] = None
) -> int:
    """K6: union inputs, keep-first dedup (all columns unless ``key``),
    rewrite. Returns row count."""
    df = spark.read.parquet(inputs[0])
    for p in inputs[1:]:
        df = df.unionByName(spark.read.parquet(p), allowMissingColumns=True)
    df = df.dropDuplicates(key) if key else df.dropDuplicates()
    tmp = output + ".tmp"
    df.write.mode("overwrite").parquet(tmp)
    out_df = spark.read.parquet(tmp)
    n = out_df.count()
    out_df.write.mode("overwrite").parquet(output)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return n


_HTML_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>Intrusion attempts by country</title>
<script src="https://www.gstatic.com/charts/loader.js"></script>
<script>
google.charts.load('current', {{'packages': ['geochart']}});
google.charts.setOnLoadCallback(function() {{
  var data = google.visualization.arrayToDataTable([['Country','Attempts'],{rows}]);
  var chart = new google.visualization.GeoChart(document.getElementById('map'));
  chart.draw(data, {{}});
}});
</script></head>
<body><h1>{title}</h1><div id="map" style="width:900px;height:500px"></div>
<table border="1"><tr><th>country</th><th>count</th></tr>{table}</table>
</body></html>
"""


def country_report_html(
    per_country: DataFrame, out_path: str, title: str = "Intrusion attempts"
) -> str:
    """Collect the (small) per-country counts and render a geochart page."""
    rows = per_country.collect()
    js_rows = ",".join(
        f"['{_html.escape(str(r['country']))}',{int(r['count'])}]" for r in rows
    )
    table = "".join(
        f"<tr><td>{_html.escape(str(r['country']))}</td><td>{int(r['count'])}</td></tr>"
        for r in rows
    )
    page = _HTML_PAGE.format(rows=js_rows, table=table, title=_html.escape(title))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        f.write(page)
    return out_path
