"""Join operator surface (SURVEY.md §2.2 "Joins"): broadcast, semi, anti,
outer, cross, theta/range, and the as-of join pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from etl_gcp_function_tmabrasil_spark.catalog import load_table
from etl_gcp_function_tmabrasil_spark.queries._util import csum, dsum


def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer counts per region: fact joined through two broadcast dims.

    Scale notes: region (5 rows) and nation (25 rows) are broadcast, so
    the customer scan streams through two map-side hash joins with zero
    shuffle before the final agg.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            csum("c_acctbal").alias("total_acctbal"),
        )
    )


_BROADCAST_SQL = """
SELECT r_name, COUNT(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers that placed at least one URGENT order (EXISTS semantics).

    Scale notes: left_semi keeps only join keys from the right side —
    Spark dedups the right side during the build, no fact-side fanout.
    """
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders at all (NOT EXISTS / anti-join)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
    )


_ANTI_SQL = """
SELECT c_custkey, c_name, c_nationkey
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order rollup preserving order-less customers.

    Scale notes: aggregate orders BEFORE the outer join (one row per
    custkey) so the join input is pre-shrunk — at 100 TB this turns a
    fact-sized shuffle into a key-sized one.
    """
    cust = load_table(spark, sf_dir, "customer")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), csum("o_totalprice").alias("total_spent"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("total_spent", F.lit(0.0)).alias("total_spent"),
        )
    )


_LEFT_OUTER_SQL = """
SELECT c_custkey, c_name,
  COALESCE(n_orders, 0) AS n_orders,
  COALESCE(total_spent, 0.0) AS total_spent
FROM customer
LEFT JOIN (
  SELECT o_custkey, COUNT(*) AS n_orders,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spent
  FROM orders GROUP BY o_custkey
) po ON c_custkey = po.o_custkey
ORDER BY c_custkey
"""


def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order lines per order preserving line-less orders (RIGHT OUTER).

    The mirror of :func:`join_left_outer` with the fact on the left:
    lineitem rollup RIGHT JOIN orders keeps every order row. Catalyst
    canonicalizes right joins to left joins with sides swapped, so the
    physical plan (and the 100 TB story — pre-aggregated fact side, one
    key-sized shuffle) is identical to the left-outer case.
    """
    per_order = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            csum("l_quantity").alias("total_qty"),
        )
    )
    orders = load_table(spark, sf_dir, "orders")
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey, "right")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("total_qty", F.lit(0.0)).alias("total_qty"),
        )
    )


_RIGHT_OUTER_SQL = """
SELECT o_orderkey, o_orderstatus,
  COALESCE(n_lines, 0) AS n_lines,
  COALESCE(total_qty, 0.0) AS total_qty
FROM (
  SELECT l_orderkey, COUNT(*) AS n_lines,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
) pl
RIGHT JOIN orders ON pl.l_orderkey = o_orderkey
ORDER BY o_orderkey
"""


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations appearing on the customer vs supplier side (FULL OUTER)."""
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
    return (
        cust_n.join(supp_n, cust_n.c_nationkey == supp_n.s_nationkey, "full_outer")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


_FULL_OUTER_SQL = """
SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
  COALESCE(c.n_customers, 0) AS n_customers,
  COALESCE(s.n_suppliers, 0) AS n_suppliers
FROM (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY c_nationkey) c
FULL OUTER JOIN (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY s_nationkey) s
  ON c.c_nationkey = s.s_nationkey
ORDER BY nationkey
"""


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All region pairs (cross join of a bounded dim with itself)."""
    r1 = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("r1"))
    r2 = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("r2"))
    return r1.crossJoin(r2).filter(F.col("r1") < F.col("r2")).orderBy("r1", "r2")


_CROSS_SQL = """
SELECT a.r_name AS r1, b.r_name AS r2
FROM region a CROSS JOIN region b
WHERE a.r_name < b.r_name
ORDER BY r1, r2
"""


def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join: classify parts into price bands.

    Scale notes: the band table is tiny and broadcast, so the non-equi
    condition evaluates as a broadcast nested-loop join — the only
    scalable shape for pure theta joins; for band joins at 100 TB, the
    equivalent equi rewrite is `width_bucket`-style bucketing (see the
    oracle, which is the declarative twin).
    """
    bands = spark.createDataFrame(
        [(0.0, 500.0, "LOW"), (500.0, 1200.0, "MID"), (1200.0, 1e9, "HIGH")],
        "lo double, hi double, band string",
    )
    part = load_table(spark, sf_dir, "part")
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_parts"), csum("p_retailprice").alias("total_price"))
    )


_RANGE_SQL = """
SELECT band, COUNT(*) AS n_parts,
  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM part
JOIN (VALUES (0.0, 500.0, 'LOW'), (500.0, 1200.0, 'MID'), (1200.0, 1e9, 'HIGH'))
  AS bands(lo, hi, band)
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band ORDER BY band
"""


def join_range_bucketed_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact×fact interval join with an equi-bucket prefilter — the
    100 TB shape for range joins (SURVEY.md §2.2 "theta/range … add
    equi-bucket prefilter for scale"): pairs of same-user events within
    30 minutes.

    A naive theta self-join on |t1-t2| <= 30min is a per-user cross
    product. Instead both sides get a coarse time bucket (width = the
    range window) and the LATER side is replicated into its own and the
    previous bucket; the join is then a plain equi-join on
    (user_id, bucket) — shuffle-partitionable, BNLJ-free — with the
    exact range predicate applied after. Each qualifying pair matches
    in exactly one bucket, so no dedup pass is needed.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("epoch")
    )
    B = 1800  # bucket width == range window (seconds)
    early = ev.select(
        F.col("user_id"),
        F.col("event_id").alias("event_a"),
        F.col("epoch").alias("epoch_a"),
        F.floor(F.col("epoch") / B).alias("bucket"),
    )
    late = ev.select(
        F.col("user_id").alias("user_id_b"),
        F.col("event_id").alias("event_b"),
        F.col("epoch").alias("epoch_b"),
        F.explode(
            F.array(F.floor(F.col("epoch") / B) - 1, F.floor(F.col("epoch") / B))
        ).alias("bucket_b"),
    )
    ordered = (F.col("epoch_a") < F.col("epoch_b")) | (
        (F.col("epoch_a") == F.col("epoch_b")) & (F.col("event_a") < F.col("event_b"))
    )
    return (
        early.join(
            late,
            (F.col("user_id") == F.col("user_id_b"))
            & (F.col("bucket") == F.col("bucket_b")),
        )
        .filter(ordered & (F.col("epoch_b") - F.col("epoch_a") <= B))
        .select(
            "user_id",
            "event_a",
            "event_b",
            (F.col("epoch_b") - F.col("epoch_a")).alias("gap_seconds"),
        )
    )


_RANGE_BUCKETED_SQL = """
SELECT a.user_id AS user_id, a.event_id AS event_a, b.event_id AS event_b,
  CAST(FLOOR(epoch(b.ts)) - FLOOR(epoch(a.ts)) AS BIGINT) AS gap_seconds
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND (FLOOR(epoch(a.ts)) < FLOOR(epoch(b.ts))
      OR (FLOOR(epoch(a.ts)) = FLOOR(epoch(b.ts)) AND a.event_id < b.event_id))
 AND FLOOR(epoch(b.ts)) - FLOOR(epoch(a.ts)) <= 1800
ORDER BY user_id, event_a, event_b
"""


def join_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each click event, the latest purchase by the same
    user at-or-before the click time (SURVEY.md §2.2 as-of pattern).

    Implemented as union + window (last_value of purchase attrs over time
    order) — one shuffle on user_id, no per-row lookups. This is the
    Spark-native as-of shape; pandas `merge_asof` inside applyInPandas is
    the fallback when the frame logic can't express the semantics.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id", F.lit(None).cast("double").alias("p_value"),
        F.col("event_id").alias("src_eid"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.lit(None).cast("long").alias("event_id"), "ts", "user_id",
        F.col("value").alias("p_value"),
        F.col("event_id").alias("src_eid"),
    )
    # Purchases sort before clicks at identical (user_id, ts) so an exact-tie
    # purchase is visible to the click ("at-or-before"). is_click: purchase=0.
    unioned = clicks.unionByName(purchases).withColumn(
        "is_click", (F.col("event_id").isNotNull()).cast("int")
    )
    # src_eid (always non-null, unique) totalizes the order: without it,
    # two purchases by one user at the same microsecond tie and last()
    # picks an arbitrary one — nondeterministic across runs and engines.
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_click", "src_eid")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        unioned.withColumn("last_purchase_value", F.last("p_value", ignorenulls=True).over(w))
        .filter(F.col("is_click") == 1)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
            F.coalesce("last_purchase_value", F.lit(-1.0)).alias("last_purchase_value"),
        )
    )


_ASOF_SQL = """
WITH u AS (
  SELECT event_id, ts, user_id, NULL::DOUBLE AS p_value, 1 AS is_click,
         event_id AS src_eid
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT NULL::BIGINT, ts, user_id, value, 0, event_id
  FROM events WHERE event_type = 'purchase'
)
SELECT event_id, user_id,
  strftime(ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
  COALESCE(
    LAST_VALUE(p_value IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, is_click, src_eid
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    -1.0) AS last_purchase_value
FROM u
QUALIFY is_click = 1
ORDER BY event_id
"""


def join_salted_hot_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salt-replicated equi-join under a deliberately hot key: lineitem
    joined to part with the fact side salted 16 ways and the dim side
    replicated 16x (operators/skew.py.salted_join) — the exact skew
    breaker for a hot join key against a dim too big to broadcast.
    Result rolled up per brand; oracle is the plain join + GROUP BY
    (salting is a pure re-association).
    """
    from etl_gcp_function_tmabrasil_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("partkey"), "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("partkey"), "p_brand"
    )
    joined = salted_join(li, part, "partkey", n_salts=16, salt_from="l_quantity")
    return (
        joined.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("sum_qty"),
        )
        .orderBy("p_brand")
    )


_SALTED_JOIN_SQL = """
SELECT p_brand, COUNT(*) AS n_items,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY p_brand
"""


QUERIES = {
    "join_broadcast_dims": join_broadcast_dims,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_left_outer": join_left_outer,
    "join_right_outer": join_right_outer,
    "join_full_outer": join_full_outer,
    "join_cross": join_cross,
    "join_range_bands": join_range_bands,
    "join_range_bucketed_pairs": join_range_bucketed_pairs,
    "join_asof_purchase": join_asof_purchase,
    "join_salted_hot_key": join_salted_hot_key,
}

ORACLE = {
    "join_broadcast_dims": _BROADCAST_SQL,
    "join_semi": _SEMI_SQL,
    "join_anti": _ANTI_SQL,
    "join_left_outer": _LEFT_OUTER_SQL,
    "join_right_outer": _RIGHT_OUTER_SQL,
    "join_full_outer": _FULL_OUTER_SQL,
    "join_cross": _CROSS_SQL,
    "join_range_bands": _RANGE_SQL,
    "join_range_bucketed_pairs": _RANGE_BUCKETED_SQL,
    "join_asof_purchase": _ASOF_SQL,
    "join_salted_hot_key": _SALTED_JOIN_SQL,
}


# --- Nearest as-of join with tolerance (round 12) -----------------------------

ASOF_NEAREST_TOL_US = 86_400_000_000  #: 1 day, in microseconds


def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, NEAREST direction with tolerance (pandas
    ``merge_asof(direction='nearest', tolerance=...)``): for each click
    the closest purchase by the same user in EITHER time direction,
    kept only within ASOF_NEAREST_TOL_US; backward wins exact ties.
    The sensor-alignment / quote-trade matching shape the backward-only
    as-of cannot express.

    Same single-shuffle plan family as join_asof_purchase: union the
    two streams, ONE window pass per direction over (user_id, ts,
    side, src_eid) — last-before via an unbounded-preceding frame,
    first-after via an unbounded-following frame — then row-local
    nearest/tolerance arithmetic. No per-row lookups, no range join;
    deltas compare in exact MICROSECONDS on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id",
        F.lit(None).cast("double").alias("p_value"),
        F.col("event_id").alias("src_eid"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.lit(None).cast("long").alias("event_id"), "ts", "user_id",
        F.col("value").alias("p_value"),
        F.col("event_id").alias("src_eid"),
    )
    # purchases sort BEFORE clicks at identical (user, ts): the
    # backward frame sees exact ties ("at-or-before"), the forward
    # frame starting after the click does not double-count them
    unioned = clicks.unionByName(purchases).withColumn(
        "is_click", (F.col("event_id").isNotNull()).cast("int")
    ).withColumn("p_us", F.when(F.col("is_click") == 0, F.unix_micros("ts")))
    back = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_click", "src_eid")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    fwd = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_click", "src_eid")
        .rowsBetween(0, W.unboundedFollowing)
    )
    annotated = (
        unioned
        .withColumn("b_val", F.last("p_value", ignorenulls=True).over(back))
        .withColumn("b_us", F.last("p_us", ignorenulls=True).over(back))
        .withColumn("f_val", F.first("p_value", ignorenulls=True).over(fwd))
        .withColumn("f_us", F.first("p_us", ignorenulls=True).over(fwd))
        .filter(F.col("is_click") == 1)
    )
    c_us = F.unix_micros("ts")
    d_back = c_us - F.col("b_us")
    d_fwd = F.col("f_us") - c_us
    use_back = F.col("b_us").isNotNull() & (
        F.col("f_us").isNull() | (d_back <= d_fwd)
    )
    nearest_d = F.when(use_back, d_back).otherwise(d_fwd)
    nearest_v = F.when(use_back, F.col("b_val")).otherwise(F.col("f_val"))
    in_tol = nearest_d <= F.lit(ASOF_NEAREST_TOL_US)
    return annotated.select(
        "event_id",
        "user_id",
        F.when(
            (F.col("b_us").isNotNull() | F.col("f_us").isNotNull()) & in_tol,
            F.when(use_back, F.lit("backward")).otherwise(F.lit("forward")),
        ).otherwise(F.lit("none")).alias("direction"),
        F.when(
            (F.col("b_us").isNotNull() | F.col("f_us").isNotNull()) & in_tol,
            nearest_v,
        ).otherwise(F.lit(-1.0)).alias("nearest_purchase_value"),
        F.when(
            (F.col("b_us").isNotNull() | F.col("f_us").isNotNull()) & in_tol,
            nearest_d,
        ).alias("delta_us"),
    ).orderBy("event_id")


_ASOF_NEAREST_SQL = f"""
WITH u AS (
  SELECT event_id, ts, user_id, NULL::DOUBLE AS p_value,
    event_id AS src_eid, 1 AS is_click, NULL::BIGINT AS p_us
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT NULL::BIGINT, ts, user_id, value, event_id, 0,
    epoch_us(ts)
  FROM events WHERE event_type = 'purchase'
),
ann AS (
  SELECT *,
    LAST_VALUE(p_value IGNORE NULLS) OVER w_back AS b_val,
    LAST_VALUE(p_us IGNORE NULLS) OVER w_back AS b_us,
    FIRST_VALUE(p_value IGNORE NULLS) OVER w_fwd AS f_val,
    FIRST_VALUE(p_us IGNORE NULLS) OVER w_fwd AS f_us
  FROM u
  WINDOW
    w_back AS (PARTITION BY user_id ORDER BY ts, is_click, src_eid
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_fwd AS (PARTITION BY user_id ORDER BY ts, is_click, src_eid
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
c AS (
  SELECT event_id, user_id, epoch_us(ts) AS c_us,
    b_val, b_us, f_val, f_us,
    (b_us IS NOT NULL AND (f_us IS NULL OR epoch_us(ts) - b_us
                           <= f_us - epoch_us(ts))) AS use_back
  FROM ann WHERE is_click = 1
)
SELECT event_id, user_id,
  CASE WHEN (b_us IS NOT NULL OR f_us IS NOT NULL)
        AND (CASE WHEN use_back THEN c_us - b_us ELSE f_us - c_us END)
            <= {ASOF_NEAREST_TOL_US}
    THEN CASE WHEN use_back THEN 'backward' ELSE 'forward' END
    ELSE 'none' END AS direction,
  CASE WHEN (b_us IS NOT NULL OR f_us IS NOT NULL)
        AND (CASE WHEN use_back THEN c_us - b_us ELSE f_us - c_us END)
            <= {ASOF_NEAREST_TOL_US}
    THEN CASE WHEN use_back THEN b_val ELSE f_val END
    ELSE -1.0 END AS nearest_purchase_value,
  CASE WHEN (b_us IS NOT NULL OR f_us IS NOT NULL)
        AND (CASE WHEN use_back THEN c_us - b_us ELSE f_us - c_us END)
            <= {ASOF_NEAREST_TOL_US}
    THEN CASE WHEN use_back THEN c_us - b_us ELSE f_us - c_us END
    END AS delta_us
FROM c ORDER BY event_id
"""

QUERIES["join_asof_nearest"] = join_asof_nearest
ORACLE["join_asof_nearest"] = _ASOF_NEAREST_SQL
