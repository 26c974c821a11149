"""The primary correctness gate, mirrored locally: every queries() entry
with an oracle must match DuckDB exactly at the test scale factor."""

from __future__ import annotations

import pytest

from etl_gcp_function_tmabrasil_spark.queries import all_oracle_sql, all_queries
from tests.oracle_check import compare, duckdb_connection

QUERIES = all_queries()
ORACLE = all_oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLE:
        # rows-only check (non-SQL-expressible operator)
        assert df.count() >= 0
        return
    oracle_df = duck.execute(ORACLE[name]).fetchdf()
    problems = compare(df, oracle_df, name)
    assert not problems, "\n".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"event_type", "n_events", "n_users", "total_value"}


def test_registry_consistency():
    assert set(ORACLE) <= set(QUERIES), "oracle entries without a query"
