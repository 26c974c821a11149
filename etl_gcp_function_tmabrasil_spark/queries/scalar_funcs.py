"""Scalar expression surface (SURVEY.md §2.2 "Projection / filter /
scalar expressions"): string/date/math/conditional functions, casting,
and the reference's null-safe path-predicate filter (R4,
``/root/reference/main.py:12``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_gcp_function_tmabrasil_spark.catalog import load_table
from etl_gcp_function_tmabrasil_spark.queries._util import day


def filter_reference_path_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's accept/reject filter made columnar (R4).

    Reference semantics (``/root/reference/main.py:12``): keep an object
    only if name is non-null AND endswith '.xlsx' AND startswith
    'minha-pasta/'. Here object names are derived deterministically from
    `documents` rows; the filter is pure built-in Column ops, fully
    codegen'd, and pushable when the name is a physical column.
    """
    docs = load_table(spark, sf_dir, "documents")
    named = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.lit(None).cast("string")
        )  # exercise the null branch (`if not name`)
        .otherwise(
            F.concat(
                F.when(F.col("doc_id") % 3 == 0, F.lit("minha-pasta/")).otherwise(
                    F.lit("outra-pasta/")
                ),
                F.col("source"),
                F.lit("/doc_"),
                F.col("doc_id").cast("string"),
                F.when(F.col("doc_id") % 2 == 0, F.lit(".xlsx")).otherwise(F.lit(".csv")),
            )
        )
        .alias("name"),
        F.col("n_chars").alias("size"),
    )
    return (
        named.filter(
            F.col("name").isNotNull()
            & F.col("name").endswith(".xlsx")
            & F.col("name").startswith("minha-pasta/")
        )
        .select(
            "doc_id",
            "name",
            "size",
            F.format_string("Novo XLSX: gs://%s/%s (size=%s)", F.lit("bkt"), "name", "size")
            .alias("log_line"),
        )
    )


_REF_FILTER_SQL = """
WITH named AS (
  SELECT doc_id,
    CASE WHEN doc_id % 7 = 0 THEN NULL
         ELSE concat(
           CASE WHEN doc_id % 3 = 0 THEN 'minha-pasta/' ELSE 'outra-pasta/' END,
           source, '/doc_', CAST(doc_id AS VARCHAR),
           CASE WHEN doc_id % 2 = 0 THEN '.xlsx' ELSE '.csv' END)
    END AS name,
    n_chars AS size
  FROM documents
)
SELECT doc_id, name, size,
  printf('Novo XLSX: gs://%s/%s (size=%d)', 'bkt', name, size) AS log_line
FROM named
WHERE name IS NOT NULL
  AND name LIKE '%.xlsx'
  AND name LIKE 'minha-pasta/%'
ORDER BY doc_id
"""


def func_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery over part names."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("upper_name"),
        F.lower("p_brand").alias("lower_brand"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit("  "))).alias("trimmed_type"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
    )


_STRINGS_SQL = """
SELECT p_partkey,
  UPPER(p_name) AS upper_name,
  LOWER(p_brand) AS lower_brand,
  LENGTH(p_name) AS name_len,
  SUBSTRING(p_name, 1, 5) AS name_prefix,
  TRIM(concat('  ', p_type, '  ')) AS trimmed_type,
  CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INT) AS brand_num,
  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
  concat_ws('|', p_brand, p_type) AS brand_type,
  string_split(p_name, ' ')[1] AS first_word
FROM part ORDER BY p_partkey
"""


def func_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery over orders: truncation, extraction,
    arithmetic, epoch conversion."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        day("o_orderdate").alias("order_day"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .alias("days_to_2002"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 90), "yyyy-MM-dd")
        .alias("due_day"),
    )


_DATES_SQL = """
SELECT o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS order_day,
  CAST(year(o_orderdate) AS INT) AS yr,
  CAST(month(o_orderdate) AS INT) AS mo,
  CAST(day(o_orderdate) AS INT) AS dom,
  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
  CAST(quarter(o_orderdate) AS INT) AS qtr,
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
  strftime(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY, '%Y-%m-%d') AS due_day
FROM orders ORDER BY o_orderkey
"""


def func_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function battery over lineitem prices."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.pow(F.col("l_tax") + 1.0, 2), 6).alias("tax_sq"),
        F.round(F.log(F.col("l_extendedprice") + 1.0), 6).alias("price_ln"),
        (F.col("l_quantity").cast("int") % 5).alias("qty_mod5"),
    )


_MATH_SQL = """
SELECT l_orderkey, l_linenumber,
  ROUND(l_extendedprice, 1) AS price_r1,
  CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
  CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
  ABS(l_discount - 0.05) AS disc_dev,
  ROUND(SQRT(l_quantity), 6) AS qty_sqrt,
  ROUND(POW(l_tax + 1.0, 2), 6) AS tax_sq,
  ROUND(LN(l_extendedprice + 1.0), 6) AS price_ln,
  CAST(l_quantity AS INT) % 5 AS qty_mod5
FROM lineitem ORDER BY l_orderkey, l_linenumber
"""


def func_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise, coalesce, nullif, nvl — the reference's defensive
    null handling (``main.py:6``: `event.data or {}`) as column ops."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "segment_masked"
        ),
        F.when(F.col("c_acctbal") > 0, F.col("c_acctbal")).alias("pos_bal_or_null"),
        F.coalesce(
            F.when(F.col("c_acctbal") > 0, F.col("c_acctbal")), F.lit(0.0)
        ).alias("pos_bal"),
    )


_CONDITIONAL_SQL = """
SELECT c_custkey,
  CASE WHEN c_acctbal < 0 THEN 'overdrawn'
       WHEN c_acctbal < 5000 THEN 'standard'
       ELSE 'premium' END AS tier,
  COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_masked,
  CASE WHEN c_acctbal > 0 THEN c_acctbal END AS pos_bal_or_null,
  COALESCE(CASE WHEN c_acctbal > 0 THEN c_acctbal END, 0.0) AS pos_bal
FROM customer ORDER BY c_custkey
"""


def func_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast battery: numeric↔string↔timestamp↔decimal round-trips."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("value").cast("int").alias("value_int"),
        F.col("value").cast("string").alias("value_str"),
        F.col("value").cast("decimal(12,2)").cast("string").alias("value_dec_str"),
        F.col("event_id").cast("double").alias("id_dbl"),
        F.col("ts").cast("date").cast("string").alias("ts_date_str"),
        # ts is TIMESTAMP_LTZ engine-wide (session.py pins UTC and
        # disables NTZ inference), so the long cast is direct and the
        # epoch matches DuckDB's epoch() on the same naive value.
        F.col("ts").cast("timestamp").cast("long").alias("ts_epoch"),
        F.lit("42").cast("int").alias("str_to_int"),
    )


_CASTS_SQL = """
SELECT event_id,
  CAST(TRUNC(value) AS INT) AS value_int,  -- duckdb CAST rounds; Spark truncates
  CAST(value AS VARCHAR) AS value_str,
  CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR) AS value_dec_str,
  CAST(event_id AS DOUBLE) AS id_dbl,
  CAST(CAST(ts AS DATE) AS VARCHAR) AS ts_date_str,
  CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_epoch,  -- Spark cast floors sub-second

  CAST('42' AS INT) AS str_to_int
FROM events ORDER BY event_id
"""


QUERIES = {
    "filter_reference_path_predicate": filter_reference_path_predicate,
    "func_strings": func_strings,
    "func_dates": func_dates,
    "func_math": func_math,
    "func_conditional": func_conditional,
    "func_casts": func_casts,
}

ORACLE = {
    "filter_reference_path_predicate": _REF_FILTER_SQL,
    "func_strings": _STRINGS_SQL,
    "func_dates": _DATES_SQL,
    "func_math": _MATH_SQL,
    "func_conditional": _CONDITIONAL_SQL,
    "func_casts": _CASTS_SQL,
}
