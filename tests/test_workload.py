"""Differential tests: every oracle-paired workload query must match
DuckDB on sf0.001 — the same check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from nowdb_spark.workload import QUERIES
from tests.conftest import SF_DIR, assert_query_matches

ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_matches_oracle(spark, oracle, name):
    assert_query_matches(spark, oracle, QUERIES[name])


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_runs_and_schema_stable(spark, name):
    df = QUERIES[name].spark(spark, SF_DIR)
    rows = df.collect()
    assert df.columns, "query must have a schema"
    assert rows is not None


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0
    qs = E.queries()
    os_ = E.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 20
