"""Sort/limit/top-k, set operations, and exact deduplication
(SURVEY.md §2.2 "Sort / limit / top-k / set ops / dedup").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from etl_gcp_function_tmabrasil_spark.catalog import load_table
from etl_gcp_function_tmabrasil_spark.queries._util import second


def sort_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-25 orders by price (deterministic tiebreak on key).

    Scale notes: Catalyst compiles orderBy+limit to TakeOrderedAndProject —
    each partition keeps its local top-25, the driver merges; no global
    sort, no full shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


_TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
"""


def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-key sort with explicit null-safe ordering.

    Scale notes: global orderBy range-partitions on a sampled key
    distribution — the one operator that legitimately needs a total
    order; everything else in the engine avoids it.
    """
    supp = load_table(spark, sf_dir, "supplier")
    return supp.select("s_suppkey", "s_nationkey", "s_acctbal").orderBy(
        F.asc("s_nationkey"), F.desc("s_acctbal"), F.asc("s_suppkey")
    )


_SORT_SQL = """
SELECT s_suppkey, s_nationkey, s_acctbal
FROM supplier ORDER BY s_nationkey ASC, s_acctbal DESC, s_suppkey ASC
"""


def setop_union_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with customers vs nations with suppliers: one row per set
    operation (union / intersect / except) with its cardinality."""
    cust_n = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp_n = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    # ONE lazy plan (union of three 1-row aggregates), not three eager
    # .count() jobs at construction time — the registry contract is
    # lazy DataFrames, and eager actions here triple the job count and
    # mis-attribute the cost to plan construction in any per-query
    # accounting (bench.py's laziness guard would trip on this shape).
    def tagged_count(op: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
            F.lit(op).alias("op"), "n"
        )

    return (
        tagged_count("union", cust_n.union(supp_n).distinct())
        .unionByName(tagged_count("intersect", cust_n.distinct().intersect(supp_n.distinct())))
        .unionByName(tagged_count("except", cust_n.distinct().exceptAll(supp_n.distinct())))
    )


_SETOP_SQL = """
SELECT 'union' AS op,
  (SELECT COUNT(*) FROM (SELECT c_nationkey FROM customer UNION SELECT s_nationkey FROM supplier) u)::BIGINT AS n
UNION ALL
SELECT 'intersect',
  (SELECT COUNT(*) FROM (SELECT DISTINCT c_nationkey FROM customer INTERSECT SELECT DISTINCT s_nationkey FROM supplier) i)::BIGINT
UNION ALL
SELECT 'except',
  (SELECT COUNT(*) FROM (SELECT DISTINCT c_nationkey FROM customer EXCEPT SELECT DISTINCT s_nationkey FROM supplier) e)::BIGINT
"""


def dedup_exact_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup of (user_id, event_type) pairs — hash-groupBy distinct.

    Scale notes: `distinct` on the projected keys is a map-side-combining
    shuffle on the pair — the canonical exact-dedup shape at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").distinct()


_DEDUP_EXACT_SQL = """
SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type
"""


def dedup_pick_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep each user's latest event per type (deterministic dedup via
    row_number, tiebreak on event_id — the scalable 'keep one row per
    key' pattern; dropDuplicates is non-deterministic about WHICH row)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", second("ts").alias("ts_s"), "value")
    )


_DEDUP_LATEST_SQL = """
SELECT user_id, event_type, event_id,
  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t WHERE rn = 1
ORDER BY user_id, event_type
"""


def distinct_count_full_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-row dedup cardinality on lineitem (dropDuplicates on all
    columns ≡ DISTINCT *)."""
    li = load_table(spark, sf_dir, "lineitem")
    # lazy 1×1 join of two scalar aggregates (broadcast nested loop over
    # one row) instead of two eager .count() jobs at construction time
    total = li.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    dist = li.dropDuplicates().agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct")
    )
    return total.join(F.broadcast(dist))


_DISTINCT_FULL_SQL = """
SELECT COUNT(*)::BIGINT AS n_total,
       (SELECT COUNT(*) FROM (SELECT DISTINCT * FROM lineitem) d)::BIGINT AS n_distinct
FROM lineitem
"""


QUERIES = {
    "sort_topk_orders": sort_topk_orders,
    "sort_multi_key": sort_multi_key,
    "setop_union_intersect_except": setop_union_intersect_except,
    "dedup_exact_rows": dedup_exact_rows,
    "dedup_pick_latest": dedup_pick_latest,
    "distinct_count_full_rows": distinct_count_full_rows,
}

ORACLE = {
    "sort_topk_orders": _TOPK_SQL,
    "sort_multi_key": _SORT_SQL,
    "setop_union_intersect_except": _SETOP_SQL,
    "dedup_exact_rows": _DEDUP_EXACT_SQL,
    "dedup_pick_latest": _DEDUP_LATEST_SQL,
    "distinct_count_full_rows": _DISTINCT_FULL_SQL,
}
