"""Spark-vs-DuckDB parity for every queries()/oracle_sql() pair at sf0.01.

Emulates the driver's correctness gate: row count + schema (column names) +
order-insensitive value equality.
"""

from __future__ import annotations

import pytest

from conftest import TESTDATA_SF_ORACLE
from util_compare import duck_connection, run_query_pair

import __spark_entry__ as E

_QUERIES = E.queries()
_ORACLES = E.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(TESTDATA_SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sql = _ORACLES.get(name)
    if sql is None:
        # rows-only contract: must run and return a stable schema
        df = _QUERIES[name](spark, TESTDATA_SF_ORACLE)
        assert df.count() >= 0
        return
    problems = run_query_pair(spark, duck, _QUERIES[name], sql, TESTDATA_SF_ORACLE)
    assert not problems, f"{name}: " + "; ".join(p[:500] for p in problems)


def test_registry_fits_driver_cap():
    """r4 regression: the driver records at most 50 correctness rows; the
    51st registered query (emb_near_dups_auto) silently had NO row. Keep
    the registry at/below the cap and keep every oracle key paired."""
    assert len(_QUERIES) <= E.DRIVER_QUERY_CAP
    assert set(_ORACLES) <= set(_QUERIES)


def test_comparator_flags_int_vs_float():
    """r4 regression (corpus_source_stats): DuckDB sum(int32) -> HUGEINT ->
    pandas float64 hash-mismatched against Spark's int64 in the DRIVER while
    the local comparator's pandas eq coerced them equal. The comparator must
    now fail on dtype-kind divergence even when values match numerically."""
    import pandas as pd

    from util_compare import compare_frames

    s = pd.DataFrame({"g": ["a", "b"], "total": pd.array([7949, 12], dtype="int64")})
    d = pd.DataFrame({"g": ["a", "b"], "total": pd.array([7949.0, 12.0], dtype="float64")})
    problems = compare_frames(s, d)
    assert problems and "dtype-kind" in problems[0]
    # and identical-kind frames still pass
    assert not compare_frames(s, s.copy())


def test_comparator_flags_prefix_corpus_source_stats_sql(spark, duck):
    """The exact pre-fix oracle SQL (bare sum(n_chars)) must FAIL locally
    now — this is the bug that shipped green through local emulation in r4."""
    old_sql = (
        "SELECT source, count(*) AS n_docs, sum(n_chars) AS total_chars, "
        "round(avg(n_chars), 6) AS avg_chars, min(n_chars) AS min_chars, "
        "max(n_chars) AS max_chars FROM documents GROUP BY source"
    )
    problems = run_query_pair(
        spark, duck, _QUERIES["corpus_source_stats"], old_sql, TESTDATA_SF_ORACLE
    )
    assert problems and any("dtype-kind" in p for p in problems)


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"country", "count"}
