"""The SQL entry path (SURVEY.md §2.2 preamble: "spark.sql(...)"):
one query expressed as a SQL string over registered temp views, proving
the engine's second API surface end-to-end (parser → Catalyst → same
physical planning as the DataFrame API).

The statement is written in the ANSI subset both Spark and DuckDB parse,
so the SAME string is its own oracle — zero drift by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_gcp_function_tmabrasil_spark.catalog import register_views

_SQL = """
SELECT c_mktsegment,
  o_orderstatus,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
  CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
  CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
FROM orders
JOIN customer ON o_custkey = c_custkey
WHERE o_totalprice > 1000
GROUP BY c_mktsegment, o_orderstatus
ORDER BY c_mktsegment, o_orderstatus
"""


def sql_segment_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue rollup per market segment × order status, via spark.sql
    over registered views — dialect-neutral SQL, shared verbatim with
    the oracle."""
    register_views(spark, sf_dir, ["orders", "customer"])
    return spark.sql(_SQL)


QUERIES = {"sql_segment_status_rollup": sql_segment_status_rollup}
ORACLE = {"sql_segment_status_rollup": _SQL}
