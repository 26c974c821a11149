"""Second relational wave: subquery shapes (EXISTS / NOT EXISTS /
scalar), conditional aggregation, HAVING-style agg filters, pivot and
unpivot — rounding out SURVEY.md §2.2's relational contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_gcp_function_tmabrasil_spark.catalog import load_table
from etl_gcp_function_tmabrasil_spark.queries._util import cavg, csum


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS subquery → left-semi join.

    Scale notes: the semi join dedups lineitem on orderkey during the
    build — no fanout; both sides shuffle once on orderkey.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    # commit-before-receipt proxy: lineitems shipped before 1997
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional aggregation (CASE inside SUM)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


_Q12_SQL = """
SELECT l_returnflag,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
    AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
    AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: scalar ratio of conditional sums over a join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(promo.cast("decimal(18,6)")).cast("double")
            / F.sum(rev.cast("decimal(18,6)")).cast("double")
        ).alias("promo_revenue_pct")
    )


_Q14_SQL = """
SELECT 100.0
  * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                       THEN l_extendedprice * (1 - l_discount)
                       ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
  / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
  AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on an aggregate, joined back to detail.

    Scale notes: aggregate lineitem FIRST (map-side partials collapse the
    fact), filter with HAVING, then join the small surviving key set back
    — never join-then-aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(csum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
    )


_Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  o_totalprice, total_qty
FROM (
  SELECT l_orderkey,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 250
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey ASC
"""


def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-branch predicate over a join —
    exercises OR-predicate pushdown and CNF conversion."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#2") & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30))
        | ((F.col("p_size") >= 8) & (F.col("l_quantity") > 40))
    )
    return joined.filter(cond).agg(
        csum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_Q19_SQL = """
SELECT
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
    AS revenue,
  COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_brand = 'Brand#2' AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_size >= 8 AND l_quantity > 40)
"""


def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above the global average price (the
    classic decorrelated-scalar shape; Spark broadcasts the 1-row agg)."""
    orders = load_table(spark, sf_dir, "orders")
    avg_price = orders.agg(cavg("o_totalprice").alias("a"))
    return (
        orders.crossJoin(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("a"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_above_avg"))
        .orderBy("o_orderstatus")
    )


_SCALAR_SUB_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_above_avg
FROM orders
WHERE o_totalprice > (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
  FROM orders)
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per market segment × order status (statuses
    become columns). Pivot values are declared explicitly — at scale an
    implicit pivot triggers a distinct scan to discover them."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "c_mktsegment",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
        .orderBy("c_mktsegment")
    )


_PIVOT_SQL = """
SELECT c_mktsegment,
  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def unpivot_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-nation customer/supplier counts back to
    long (entity, n) rows via stack()."""
    cust_n = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp_n = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    wide = (
        cust_n.join(supp_n, cust_n.c_nationkey == supp_n.s_nationkey, "full_outer")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )
    return (
        wide.selectExpr(
            "nationkey",
            "stack(2, 'customer', n_customers, 'supplier', n_suppliers) AS (entity, n)",
        )
        .filter(F.col("n") > 0)
        .orderBy("nationkey", "entity")
    )


_UNPIVOT_SQL = """
WITH wide AS (
  SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
    COALESCE(c.n_customers, 0) AS n_customers,
    COALESCE(s.n_suppliers, 0) AS n_suppliers
  FROM (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY 1) c
  FULL OUTER JOIN
       (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) s
    ON c.c_nationkey = s.s_nationkey
)
SELECT nationkey, entity, n FROM (
  SELECT nationkey, 'customer' AS entity, n_customers AS n FROM wide
  UNION ALL
  SELECT nationkey, 'supplier', n_suppliers FROM wide
) t WHERE n > 0
ORDER BY nationkey, entity
"""


QUERIES = {
    "q4_order_priority": q4_order_priority,
    "q12_shipmode_priority": q12_shipmode_priority,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive_filter": q19_disjunctive_filter,
    "scalar_subquery_above_avg": scalar_subquery_above_avg,
    "pivot_status_by_segment": pivot_status_by_segment,
    "unpivot_nation_counts": unpivot_nation_counts,
}

ORACLE = {
    "q4_order_priority": _Q4_SQL,
    "q12_shipmode_priority": _Q12_SQL,
    "q14_promo_revenue": _Q14_SQL,
    "q18_large_orders": _Q18_SQL,
    "q19_disjunctive_filter": _Q19_SQL,
    "scalar_subquery_above_avg": _SCALAR_SUB_SQL,
    "pivot_status_by_segment": _PIVOT_SQL,
    "unpivot_nation_counts": _UNPIVOT_SQL,
}
