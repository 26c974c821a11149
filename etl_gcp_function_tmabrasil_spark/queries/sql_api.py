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


_CTE_WINDOW_SQL = """
WITH ranked AS (
  SELECT l_partkey, l_orderkey, l_linenumber, l_quantity, l_extendedprice,
    ROW_NUMBER() OVER (PARTITION BY l_partkey
                       ORDER BY l_extendedprice DESC, l_orderkey ASC,
                                l_linenumber ASC) AS rn
  FROM lineitem
),
top3 AS (SELECT * FROM ranked WHERE rn <= 3)
SELECT p_brand,
  COUNT(*) AS n_top_items,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty,
  CASE WHEN COUNT(*) > 100 THEN 'major' ELSE 'minor' END AS brand_class
FROM top3 JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""


def sql_cte_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + ranking window + join + CASE in ONE dialect-neutral SQL
    text (shared verbatim with the oracle): per-part top-3 line items
    by price, rolled up per brand — the SQL-surface twin of the
    DataFrame per-group top-k, planned by Catalyst with the same
    WindowGroupLimit map-side pushdown."""
    register_views(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(_CTE_WINDOW_SQL)


_LATERAL_SQL = """
SELECT c_custkey, t.o_orderkey, CAST(t.o_totalprice AS DOUBLE) AS o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_orderdate DESC, o_orderkey ASC
  LIMIT 2
) t
ORDER BY c_custkey, o_orderkey
"""


def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (per-customer two most recent
    orders), one dialect-neutral text shared verbatim with the oracle.
    Catalyst DECORRELATES the per-row subquery into a set-based plan —
    a ranking window over the orders side joined back on o_custkey —
    so the correlated form costs one shuffle like the explicit
    window-top-k, NOT one subquery execution per outer row (the
    nested-loop reading of LATERAL would be O(customers × orders) at
    100 TB). Deterministic: the LIMIT's sort carries a full
    tie-breaker."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_LATERAL_SQL)


#: The daily-rate rollup and the recursion over it. The ORACLE runs
#: them as one text (DuckDB materializes the non-recursive `daily`
#: CTE once); Spark's recursive-CTE execution INLINES a non-recursive
#: CTE referenced from the recursive member into EVERY level —
#: measured: the one-text form re-aggregated the 1M-event fact table
#: 30 times (sf0.1 8–10 s vs ~4 s over a materialized rollup) — so
#: the Spark side materializes `daily` first and recurses over the
#: persisted 30-row view. Semantics identical; the split is the
#: scale-correct form (at 100 TB, 30 re-scans of the fact table is
#: the difference between a depth-bound recursion and a disaster).
_DAILY_SQL = """
SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS d,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / 1000000.0, 8) AS r
FROM events GROUP BY CAST(CAST(ts AS DATE) AS TIMESTAMP)
"""

#: idx definition + final select, parameterized on the rollup's name —
#: the SHARED recursion text (formatted with "daily" for the one-text
#: oracle, with the persisted view's name for the Spark side)
_IDX_SQL = """idx AS (
  SELECT d, r, CAST(ROUND(1.0 + r, 8) AS DOUBLE) AS growth_index
  FROM {daily} WHERE d = (SELECT MIN(d) FROM {daily})
  UNION ALL
  SELECT {daily}.d, {daily}.r,
    CAST(ROUND(idx.growth_index * (1.0 + {daily}.r), 8) AS DOUBLE)
      AS growth_index
  FROM idx JOIN {daily} ON idx.d + INTERVAL '1' DAY = {daily}.d
)
SELECT CAST(CAST(d AS DATE) AS STRING) AS day, r AS daily_rate, growth_index
FROM idx ORDER BY day
"""

_RECURSION_SQL = "WITH RECURSIVE " + _IDX_SQL

#: Spark-side-only recursion text: same string with a BROADCAST hint on
#: the day-rollup side of the per-level join. Each recursion level is a
#: freshly planned query whose frontier (the UnionLoopRef) carries no
#: stats; the hint pins the ONLY acceptable strategy — broadcast the
#: bounded rollup (timeline-days rows), stream the 1-row frontier — so
#: no stats estimate can ever flip it. Measured at sf0.1 (r15,
#: alternating head-to-head, min-of-4): pinned form 4.17 s vs 4.25 s
#: unpinned (the optimizer already picks this side locally — the hint
#: is strategy insurance, not a local win) vs 9.3 s with the frontier
#: side broadcast (the flip the hint forecloses — a per-level exchange
#: job on the 1-row side while the rollup re-scans). The dominant cost
#: is UnionLoopExec's per-level driver replanning (~0.14 s/level x 30
#: levels), which no join choice removes — see the docstring's scale
#: notes. The oracle text is unchanged — hints and partitioning cannot
#: move a value.
_RECURSION_BC_SQL = "WITH RECURSIVE " + _IDX_SQL.replace(
    "SELECT {daily}.d, {daily}.r,",
    "SELECT /*+ BROADCAST({daily}) */ {daily}.d, {daily}.r,",
)

_RECURSIVE_SQL = (
    "WITH RECURSIVE daily AS (" + _DAILY_SQL + "),\n" + _IDX_SQL.format(daily="daily")
)


def sql_recursive_cte_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE (Spark 4's WITH RECURSIVE): a daily compounded
    growth index over the events timeline — index_d = index_{d-1} ×
    (1 + rate_d), a genuinely ITERATIVE linear recurrence no
    window/aggregate closed form expresses without the
    numerically-dead prefix-product trick (timeseries_ewma documents
    the same boundary for the per-key case; this is the global-chain
    case through the SQL surface). Both engines walk the identical
    30-level recursion with each step's product ROUNDED to 8 dp (the
    PageRank trick), so the chain is bit-identical; the recursion
    text is shared, with the day-rate rollup materialized first on
    the Spark side (see the note above _DAILY_SQL — Spark inlines a
    non-recursive CTE into every recursion level, re-aggregating the
    fact table depth× in the one-text form).

    Scale notes: each recursion level is one join of the
    single-row-per-day frontier against the PERSISTED day rollup —
    recursion depth = timeline days, NOT data size; the events scan
    and the per-day aggregation happen exactly once. Spark's
    recursion guard (`spark.sql.cteRecursionLevelLimit`, default 100)
    bounds runaway chains; level-sequential scheduling (~0.13 s/level
    here) is the fixed cost of true recursion — use the closed-form
    `sequence()` spine (resample_daily_locf) when no real recurrence
    is involved."""
    from etl_gcp_function_tmabrasil_spark.queries._util import managed_persist

    register_views(spark, sf_dir, ["events"])
    # coalesce(1): the rollup is bounded to timeline-days rows at ANY
    # scale factor (days, not data size), so a one-partition cached
    # layout is scale-correct and lets every recursion level read it
    # as a single task instead of scheduling shuffle-partition-many
    # empty tasks per level.
    daily = managed_persist(
        spark.sql(_DAILY_SQL).coalesce(1), f"recursive_daily:{sf_dir}"
    )
    daily.createOrReplaceTempView("recursive_daily_rates")
    return spark.sql(_RECURSION_BC_SQL.format(daily="recursive_daily_rates"))


QUERIES = {
    "sql_segment_status_rollup": sql_segment_status_rollup,
    "sql_cte_window_topk": sql_cte_window_topk,
    "sql_lateral_topk": sql_lateral_topk,
    "sql_recursive_cte_index": sql_recursive_cte_index,
}
ORACLE = {
    "sql_segment_status_rollup": _SQL,
    "sql_cte_window_topk": _CTE_WINDOW_SQL,
    "sql_lateral_topk": _LATERAL_SQL,
    "sql_recursive_cte_index": _RECURSIVE_SQL,
}
