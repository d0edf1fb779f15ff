"""Local emulation of the driver's Spark-vs-DuckDB correctness comparison."""

from __future__ import annotations

import duckdb
import pandas as pd

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            dt = df[c]
            if getattr(dt.dtype, "tz", None) is not None:
                dt = dt.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = dt.astype("datetime64[us]")
        elif df[c].dtype == object:
            # Spark DATE columns land as object-of-datetime.date while
            # DuckDB DATE lands as datetime64 — the driver treats them as
            # the same (per_day was green in r4); unify to datetime64
            import datetime as _dt

            nonnull = df[c].dropna()
            if len(nonnull) and all(
                isinstance(v, _dt.date) and not isinstance(v, _dt.datetime)
                for v in nonnull
            ):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            else:
                df[c] = df[c].where(pd.notna(df[c]), None)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
    return df.sort_values(by=list(df.columns), ignore_index=True, na_position="first")


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Returns a list of mismatch descriptions (empty = equal)."""
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"schema: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s = normalize(spark_pdf)
    d = normalize(duck_pdf)
    # The driver hashes canonical value STRINGS per side, so an int64 7949
    # vs a float64 7949.0 (e.g. DuckDB sum(int32) -> HUGEINT -> pandas
    # float64) hash-mismatches even though pandas' elementwise eq coerces
    # them equal. Mirror that: a dtype-KIND divergence is a failure here
    # even when every value compares numerically equal. (normalize already
    # unifies integer widths / tz-awareness, which the driver tolerates.)
    for c in s.columns:
        ks, kd = s[c].dtype.kind, d[c].dtype.kind
        if ks != kd:
            problems.append(
                f"dtype-kind: col {c!r} spark={s[c].dtype} duck={d[c].dtype}"
                " (driver hashes canonical strings; int-vs-float typing"
                " fails even when values are numerically equal)"
            )
    if problems:
        return problems
    if len(s) == len(d):
        neq = ~(s.eq(d) | (s.isna() & d.isna()))
        if neq.any().any():
            bad_cols = [c for c in s.columns if neq[c].any()]
            idx = neq.any(axis=1)
            problems.append(
                f"values differ in cols {bad_cols}; first diffs:\n"
                f"spark:\n{s[idx].head(3)}\nduck:\n{d[idx].head(3)}"
            )
    return problems


def run_query_pair(spark, con, qfunc, sql, sf_dir) -> list[str]:
    spark_pdf = qfunc(spark, sf_dir).toPandas()
    duck_pdf = con.sql(sql).df()
    return compare_frames(spark_pdf, duck_pdf)
