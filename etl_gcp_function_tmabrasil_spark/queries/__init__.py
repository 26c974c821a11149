"""Query registry — the SURVEY.md §2.2 operator inventory, one entry per
operator, each with a Spark implementation and (where SQL-expressible) a
DuckDB oracle twin.

Each submodule exports ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLE: dict[str, str]``; this package merges them.
Names are stable contract keys checked by the driver
(``__spark_entry__.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_gcp_function_tmabrasil_spark.pipelines import traindata
from etl_gcp_function_tmabrasil_spark.queries import (
    aggregates,
    cdc,
    curation_ops,
    dedup_approx,
    events_json,
    expr_gaps,
    ingest_xlsx,
    joins,
    mllib_lsh,
    multimodal_q,
    relational,
    relational2,
    relational3,
    scalar_funcs,
    setops_dedup,
    similarity,
    sql_api,
    text_analysis,
    tfidf_udf,
    windows,
)

_MODULES = [
    relational,
    relational2,
    relational3,
    joins,
    aggregates,
    cdc,
    windows,
    setops_dedup,
    scalar_funcs,
    expr_gaps,
    events_json,
    ingest_xlsx,
    text_analysis,
    dedup_approx,
    curation_ops,
    similarity,
    mllib_lsh,
    tfidf_udf,
    sql_api,
    multimodal_q,
    traindata,
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
