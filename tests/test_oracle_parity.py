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


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"country", "count"}
