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

#: Spark-side recursion text with a BROADCAST hint pinning the rollup
#: side of the per-level join (r15: 4.17 s pinned vs 9.3 s with the
#: frontier side broadcast). KEPT — no longer the query path, but the
#: r16 equivalence test executes it against the fold below, so the
#: WITH RECURSIVE surface stays exercised, and the level-cost
#: experiment (OPTIMIZATION_r16.md) runs through it.
_RECURSION_BC_SQL = "WITH RECURSIVE " + _IDX_SQL.replace(
    "SELECT {daily}.d, {daily}.r,",
    "SELECT /*+ BROADCAST({daily}) */ {daily}.d, {daily}.r,",
)

_RECURSIVE_SQL = (
    "WITH RECURSIVE daily AS (" + _DAILY_SQL + "),\n" + _IDX_SQL.format(daily="daily")
)

#: Row-local fold form of the SAME recurrence (r16). The recursion's
#: state space is bounded by construction — the frontier is one row
#: per level and depth = timeline days, never data size — so the whole
#: chain is a sequential scalar recurrence over the O(days) day
#: rollup: exactly the shape the repo already folds row-locally
#: (knn_mmr_rerank, banded_rank; guide §1.2 "change the algorithm").
#: Gather the rollup into ONE sorted array and fold it with the SAME
#: per-step arithmetic the recursive member applies:
#:   - anchor: the first (= MIN d) element seeds
#:     g = CAST(ROUND(1.0 + r, 8) AS DOUBLE);
#:   - step:   append only when d extends the chain by exactly
#:     INTERVAL '1' DAY (the recursive member's join condition), with
#:     g = CAST(ROUND(g_prev * (1.0 + r), 8) AS DOUBLE).
#: Gap-stop semantics need no "stopped" flag: days are sorted and
#: distinct, so once one day fails the +1-DAY test every later day is
#: strictly greater and can never equal last_d + 1 DAY either — the
#: chain freezes, exactly like an empty recursion frontier. Bit
#: identity: same ROUND(double, 8) calls in the same order, same
#: interval arithmetic, same final projection/sort — proven by the
#: r16 equivalence test (fold ≡ executed WITH RECURSIVE, sf0.001 +
#: sf0.01) and the shared-verbatim DuckDB oracle at all three SFs.
#: Measured (sf0.1, isolated noop A/B, same session): recursion
#: 6.03 s min (4.67 s in the r16 baseline bench) → fold 0.29 s min;
#: the removed cost is UnionLoopExec's per-level driver replanning +
#: job scheduling, measured LINEAR in depth (depth 5/10/20/30 →
#: 1.37/1.93/3.29/4.59 s, ~0.13 s/level — the level-count experiment
#: in OPTIMIZATION_r16.md).
_FOLD_CHAIN_SQL = """
WITH daily AS ({daily}),
gathered AS (
  SELECT array_sort(collect_list(struct(d, r))) AS days FROM daily
),
chain AS (
  SELECT aggregate(
    days,
    CAST(array() AS ARRAY<STRUCT<d: TIMESTAMP, r: DOUBLE, g: DOUBLE>>),
    (acc, x) -> CASE
      WHEN size(acc) = 0 THEN
        array(named_struct('d', x.d, 'r', x.r,
                           'g', CAST(ROUND(1.0 + x.r, 8) AS DOUBLE)))
      WHEN element_at(acc, -1).d + INTERVAL '1' DAY = x.d THEN
        concat(acc, array(named_struct('d', x.d, 'r', x.r,
          'g', CAST(ROUND(element_at(acc, -1).g * (1.0 + x.r), 8)
                    AS DOUBLE))))
      ELSE acc
    END
  ) AS idx
  FROM gathered
)
SELECT CAST(CAST(e.d AS DATE) AS STRING) AS day, e.r AS daily_rate,
  e.g AS growth_index
FROM chain LATERAL VIEW explode(idx) t AS e
ORDER BY day
"""


def sql_recursive_cte_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily compounded growth index over the events timeline —
    index_d = index_{d-1} × (1 + rate_d), a genuinely ITERATIVE linear
    recurrence with each step's product ROUNDED to 8 dp (the PageRank
    trick), so the chain is bit-identical across engines. The ORACLE
    expresses it as WITH RECURSIVE (one dialect-neutral text, DuckDB
    walks the identical 30-level recursion); the Spark side computes
    the SAME chain as a row-local `aggregate()` fold over the day
    rollup (see _FOLD_CHAIN_SQL — the r16 rewrite; the executed
    recursive-CTE form is kept in _RECURSION_BC_SQL and pinned
    equivalent by tests/test_recursive_fold.py).

    Why the fold is the scale-correct shape: recursion depth here is
    timeline DAYS, never data size — the recursive member joins a
    one-row frontier to the bounded day rollup, so Spark's
    UnionLoopExec pays per-level driver replanning + job scheduling
    (~0.14 s/level measured, linear in depth) to move O(days) total
    rows. The fold does the identical sequential arithmetic inside
    one task over one O(days) array: the events scan and the per-day
    aggregation happen exactly once either way, and the single-task
    state is O(days) — the same boundedness argument the coalesce(1)
    rollup already relied on. Use true recursion when the frontier is
    data-sized; use the closed-form `sequence()` spine
    (resample_daily_locf) when no real recurrence is involved."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_FOLD_CHAIN_SQL.format(daily=_DAILY_SQL))


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
