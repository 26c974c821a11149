"""sql_recursive_cte_index: the r16 row-local fold must compute the
EXACT chain the recursive-CTE form computes.

The query path no longer executes WITH RECURSIVE (the fold removed
~0.14 s/level of UnionLoopExec driver replanning), so these tests are
what keeps the Spark recursive-CTE surface exercised AND pins the
fold's bit-identity to it: same anchor, same per-step
ROUND(double, 8), same +1-DAY gap-stop.
"""

from __future__ import annotations

import pytest

from etl_gcp_function_tmabrasil_spark.catalog import register_views
from etl_gcp_function_tmabrasil_spark.queries.sql_api import (
    _DAILY_SQL,
    _FOLD_CHAIN_SQL,
    _RECURSION_BC_SQL,
    sql_recursive_cte_index,
)


def _run_recursive(spark, daily_df):
    daily_df.coalesce(1).createOrReplaceTempView("rec_fold_test_daily")
    return spark.sql(
        _RECURSION_BC_SQL.format(daily="rec_fold_test_daily")
    ).collect()


def _run_fold(spark, daily_sql: str):
    return spark.sql(_FOLD_CHAIN_SQL.format(daily=daily_sql)).collect()


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_fold_equals_executed_recursion(spark, sf):
    """Fold output ≡ the executed WITH RECURSIVE output, row for row
    (values, not just rounded prints — Row equality compares the
    doubles bit-for-bit after the 8-dp rounds)."""
    register_views(spark, sf, ["events"])
    daily = spark.sql(_DAILY_SQL)
    expected = _run_recursive(spark, daily)
    got = _run_fold(spark, _DAILY_SQL)
    assert got == expected
    assert len(got) > 1  # the chain actually ran


def test_fold_equals_query_path(spark, sf_dir):
    """The registered query is exactly the fold form."""
    register_views(spark, sf_dir, ["events"])
    assert (
        sql_recursive_cte_index(spark, sf_dir).collect()
        == _run_fold(spark, _DAILY_SQL)
    )


def test_gap_stops_the_chain_like_the_recursion(spark):
    """A missing day freezes the chain in BOTH forms: the recursion's
    frontier empties (no +1-DAY match), the fold's consecutive test
    fails for every later day (sorted distinct days can never fall
    back to last_d + 1). Also covers the fold's no-flag design."""
    rows = [
        ("2031-01-01", 0.01),
        ("2031-01-02", 0.02),
        # gap: 2031-01-03 missing
        ("2031-01-04", 0.03),
        ("2031-01-05", 0.04),
    ]
    daily = spark.createDataFrame(rows, "d_s string, r double").selectExpr(
        "CAST(d_s AS TIMESTAMP) AS d", "r"
    )
    expected = _run_recursive(spark, daily)
    daily.createOrReplaceTempView("rec_fold_test_daily2")
    got = _run_fold(spark, "SELECT d, r FROM rec_fold_test_daily2")
    assert got == expected
    assert [r["day"] for r in got] == ["2031-01-01", "2031-01-02"]


def test_empty_daily_yields_empty_chain(spark):
    daily = spark.createDataFrame(
        [], "d timestamp, r double"
    )
    daily.createOrReplaceTempView("rec_fold_test_daily3")
    got = _run_fold(spark, "SELECT d, r FROM rec_fold_test_daily3")
    assert got == []
