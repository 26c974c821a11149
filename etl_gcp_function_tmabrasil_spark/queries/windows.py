"""Window-function surface (SURVEY.md §2.2 "Window functions"): ranking,
analytic (lag/lead), frames (running aggregates), per-group top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from etl_gcp_function_tmabrasil_spark.catalog import load_table
from etl_gcp_function_tmabrasil_spark.queries._util import day


def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank of orders per customer by price.

    Scale notes: one shuffle on the partition key (o_custkey); the sort is
    per-partition. Skewed customers are handled by AQE; there is no global
    sort.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


_RANK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER w AS rn,
    RANK() OVER w AS rnk,
    DENSE_RANK() OVER w AS drnk
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
) t WHERE rn <= 3
ORDER BY o_custkey, rn
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order timeline: previous/next order price + day gap."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        day("o_orderdate").alias("orderdate"),
        F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)).alias("prev_price"),
        F.coalesce(F.lead("o_totalprice").over(w), F.lit(0.0)).alias("next_price"),
        F.coalesce(
            F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)), F.lit(-1)
        ).alias("days_since_prev"),
    )


_LAG_SQL = """
SELECT o_custkey, o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  COALESCE(LAG(o_totalprice) OVER w, 0.0) AS prev_price,
  COALESCE(LEAD(o_totalprice) OVER w, 0.0) AS next_price,
  COALESCE(CAST(date_diff('day', LAG(o_orderdate) OVER w, o_orderdate) AS INT), -1)
    AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer over order time (frame: unbounded
    preceding → current row). Long-cents accumulation (csum's trick,
    _util.py) keeps the running sum exact and engine-invariant without
    per-row decimal conversion inside the frame."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(w) / 100.0)
        .alias("running_total"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS running_total,
  COUNT(*) OVER w AS running_n
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey
"""


_RANGE_FRAME_SEC = 3600


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) frame: per event type, the rolling 1-hour
    event count and value sum ending at each event's timestamp —
    rangeBetween over epoch seconds (SURVEY.md §2.2 "frames:
    rowsBetween / rangeBetween").

    RANGE frames are tie-safe: co-timestamped events share one frame in
    both engines, so no tiebreaker is needed inside the frame (the
    output order still carries event_id).

    event_type has FIVE values, so a bare per-type window is a fifth of
    the corpus through one task. Ghost-bucket rewrite instead: bucket
    rows by hour (= the frame length), emit each row into its own
    bucket AND the next (the "ghost" copy a following row's lookback
    may need — any 1-hour frame spans ≤ 2 hour-buckets), run the same
    RANGE frame within (type, bucket), and keep only home-bucket rows.
    Identical output; 2× shuffle volume buys per-(type, hour)
    parallelism — the sliding-aggregate shape that survives any corpus
    size.
    """
    # ts IS NOT NULL in BOTH engines: a NULL ts would get a NULL bucket
    # here (the wb == bkt keep-home filter silently drops it) while the
    # oracle's window treats NULL-epoch rows as orderable peers — the
    # explicit shared filter pins one semantics ("events that have a
    # timestamp") instead of two divergent accidents.
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    sec = F.unix_timestamp("ts")
    d = ev.select("event_id", "event_type", "value", sec.alias("sec")).select(
        "*", F.expr(f"sec div {_RANGE_FRAME_SEC}").alias("bkt")
    )
    contrib = d.select(
        "*", F.explode(F.array(F.col("bkt"), F.col("bkt") + 1)).alias("wb")
    )
    w = (
        W.partitionBy("event_type", "wb")
        .orderBy("sec")
        .rangeBetween(-_RANGE_FRAME_SEC, 0)
    )
    return (
        contrib.select(
            "event_id",
            "event_type",
            "bkt",
            "wb",
            F.count(F.lit(1)).over(w).alias("n_last_hour"),
            F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double")
            .alias("sum_last_hour"),
        )
        .filter(F.col("wb") == F.col("bkt"))
        .select("event_id", "event_type", "n_last_hour", "sum_last_hour")
    )


# ORDER BY floor-epoch seconds, not raw ts: Spark's unix_timestamp()
# truncates to whole seconds, so the oracle frame must too (µs-precision
# interval frames disagree on rows within 1s of the boundary).
_RANGE_FRAME_SQL = f"""
SELECT event_id, event_type,
  COUNT(*) OVER w AS n_last_hour,
  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_last_hour
FROM events
WHERE ts IS NOT NULL
WINDOW w AS (PARTITION BY event_type ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
             RANGE BETWEEN {_RANGE_FRAME_SEC} PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 parts by retail price within each part type (per-group top-k
    via row_number — the scalable pattern: no global sort, one shuffle)."""
    part = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_type").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("p_type", "rn", "p_partkey", "p_name", "p_retailprice")
        .orderBy("p_type", "rn")
    )


_TOPK_GROUP_SQL = """
SELECT p_type, rn, p_partkey, p_name, p_retailprice FROM (
  SELECT p_type, p_partkey, p_name, p_retailprice,
    ROW_NUMBER() OVER (PARTITION BY p_type ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
  FROM part
) t WHERE rn <= 2
ORDER BY p_type, rn
"""


NTILE_N = 4

#: Balance-band width for the distributed global-rank computation. The
#: band table (one row per band) is the only single-task data; bands are
#: a monotone function of the sort key, so band order + within-band order
#: = total order.
_NTILE_BAND_WIDTH = 100.0


def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartiles of customers by account balance (global ntile).

    A bare ``ntile(4) OVER (ORDER BY ...)`` forces Spark to move every
    row through ONE window task (global total order). This computes the
    identical result as a distributed two-pass rank:

    1. band rows by ``floor(-c_acctbal / width)`` — monotone in the sort
       order (c_acctbal DESC), deterministic, data-independent;
    2. within-band row_number (shuffle on band key, parallel);
    3. per-band counts -> exclusive prefix over the tiny band table ->
       broadcast offsets; global rank r = band_offset + within-band rn;
    4. exact NTILE arithmetic from r and the broadcast total N: with
       q = N div n, m = N mod n, the first m tiles hold q+1 rows —
       tile = (r-1) div (q+1) + 1 for r <= m*(q+1), else
       m + (r-1-m*(q+1)) div q + 1. Bit-identical to ntile() semantics.

    Skewed balances pile into few bands in step 2; band width is the
    knob (value-range/width tasks) and AQE skew-split handles residue.
    """
    from etl_gcp_function_tmabrasil_spark.operators.banded_rank import (
        banded_global_rank,
    )

    cust = load_table(spark, sf_dir, "customer")
    d = cust.select(
        "c_custkey",
        "c_acctbal",
        F.floor(-F.col("c_acctbal") / _NTILE_BAND_WIDTH).cast("long").alias("bkt"),
    )
    ranked = banded_global_rank(
        d, "bkt", [F.desc("c_acctbal"), F.asc("c_custkey")]
    )
    r = F.col("r")
    q = F.expr(f"n_total div {NTILE_N}")
    m = F.col("n_total") % NTILE_N
    big = (q + 1) * m  # rows covered by the m larger (q+1-row) tiles
    tile = F.when(
        r <= big, F.expr(f"(r - 1) div ((n_total div {NTILE_N}) + 1)") + 1
    ).otherwise(
        m + F.expr(
            f"(r - 1 - ((n_total div {NTILE_N}) + 1)"
            f" * (n_total % {NTILE_N})) div (n_total div {NTILE_N})"
        ) + 1
    )
    return (
        ranked.select("c_custkey", "c_acctbal", tile.cast("int").alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c_acctbal"), 4).alias("min_bal"),
            F.round(F.max("c_acctbal"), 4).alias("max_bal"),
        )
        .orderBy("quartile")
    )


_NTILE_SQL = f"""
SELECT quartile, COUNT(*) AS n,
  ROUND(MIN(c_acctbal), 4) AS min_bal,
  ROUND(MAX(c_acctbal), 4) AS max_bal
FROM (
  SELECT c_custkey, c_acctbal,
    NTILE({NTILE_N}) OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS quartile
  FROM customer
) t GROUP BY quartile ORDER BY quartile
"""


def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value over the full partition frame: each order
    annotated with its customer's earliest- and latest-dated order price.

    Scale notes: same single shuffle on o_custkey as every window here;
    the unbounded-following frame needs the whole partition buffered,
    which is bounded by orders-per-customer (~tens), not table size.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
    )


_FIRST_LAST_SQL = """
SELECT o_custkey, o_orderkey,
  FIRST_VALUE(o_totalprice) OVER w AS first_price,
  LAST_VALUE(o_totalprice) OVER w AS last_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey, o_orderkey
"""


QUERIES = {
    "window_rank_orders": window_rank_orders,
    "window_first_last": window_first_last,
    "window_lag_lead": window_lag_lead,
    "window_running_sum": window_running_sum,
    "window_range_frame": window_range_frame,
    "window_topk_per_group": window_topk_per_group,
    "window_ntile": window_ntile,
}

ORACLE = {
    "window_rank_orders": _RANK_SQL,
    "window_first_last": _FIRST_LAST_SQL,
    "window_lag_lead": _LAG_SQL,
    "window_running_sum": _RUNNING_SQL,
    "window_range_frame": _RANGE_FRAME_SQL,
    "window_topk_per_group": _TOPK_GROUP_SQL,
    "window_ntile": _NTILE_SQL,
}


def window_global_rownum_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global CONTIGUOUS row numbering WITHOUT the single-task trap: a
    bare `row_number() OVER (ORDER BY …)` funnels the whole table
    through ONE partition (Exchange SinglePartition) — the classic
    100 TB killer. The scalable two-phase shape instead:

    1. `repartitionByRange` on the (unique) sort key — Spark's range
       partitioner assigns ORDERED key ranges to ascending partition
       ids, so partition id order IS global key order;
    2. per-partition local row_number (window partitioned by pid —
       parallel, no single task);
    3. per-partition counts (one row per partition) cumulated into
       offsets by a window over that BOUNDED tiny frame (the same
       provably-bounded single-task exception as the token-packing
       bucket table), broadcast-joined back.

    global_rn = offset(pid) + local_rn. Deterministic despite sampled
    range boundaries because the key is unique: wherever the
    boundaries land, ordered-disjoint ranges + in-partition ordering
    reproduce the exact global order. The result samples every 997th
    id (plus the ends) so the oracle checks numbering across the whole
    range without returning the full table.

    `ranged` is MATERIALIZED (managed_persist) before the two
    consumers fork: both the per-pid counts and the numbered join must
    see the SAME sampled range boundaries, and range-partitioner
    sampling is seeded by the physical RDD instance. The static plan
    builds two independent rangepartitioning exchanges (verified r7 —
    ReuseExchange does NOT dedupe them: the join's attribute
    dedup rewrites one side's exprIds), so without the persist the
    offsets from one partitioning could be applied to a differently
    partitioned dataset, corrupting the global ids (ADVICE r6). The
    persist also replaces the second full shuffle with a cache read —
    at 100 TB use MEMORY_AND_DISK, the same materialization cost class
    as the duplicate exchange it eliminates.
    tests/test_plans.py pins the single-exchange + InMemory plan."""
    from etl_gcp_function_tmabrasil_spark.queries._util import managed_persist

    ords = load_table(spark, sf_dir, "orders").select("o_orderkey")
    parts = 16
    ranged = managed_persist(
        ords.repartitionByRange(parts, "o_orderkey").withColumn(
            "pid", F.spark_partition_id()
        ),
        "windows.global_rownum.ranged",
    )
    counts = ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    offsets = counts.select(
        "pid",
        (
            F.sum("cnt").over(
                W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
            )
        ).alias("offset"),
    ).fillna({"offset": 0})
    numbered = (
        ranged.join(F.broadcast(offsets), "pid")
        .select(
            "o_orderkey",
            (
                F.row_number().over(W.partitionBy("pid").orderBy("o_orderkey"))
                + F.col("offset")
            ).alias("rn"),
        )
    )
    # total as a broadcast one-row scalar (the scalar-subquery pattern)
    # — NOT an unpartitioned window over the numbered table, which
    # would reintroduce the exact single-task funnel this query avoids
    total = F.broadcast(ords.agg(F.count(F.lit(1)).alias("total")))
    return (
        numbered.crossJoin(total)
        .filter((F.col("rn") % 997 == 1) | (F.col("rn") == F.col("total")))
        .select("rn", "o_orderkey")
        .orderBy("rn")
    )


_GLOBAL_ROWNUM_SQL = """
WITH r AS (
  SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn,
         COUNT(*) OVER () AS total
  FROM orders
)
SELECT rn, o_orderkey FROM r
WHERE rn % 997 = 1 OR rn = total
ORDER BY rn
"""

QUERIES["window_global_rownum_scalable"] = window_global_rownum_scalable
ORACLE["window_global_rownum_scalable"] = _GLOBAL_ROWNUM_SQL
