"""Warehouse-load patterns: CDC merge/upsert and SCD2 history build.

The reference is an ETL trigger whose processing body feeds a warehouse
load (`/root/reference/main.py:17` placeholder; BigQuery per the north
star). The load step of a real warehouse ETL is rarely append-only —
it's MERGE: apply a changeset (updates + inserts) to a target table
with last-writer-wins semantics, and optionally keep full history as a
type-2 slowly-changing dimension. Both are expressed here as pure
DataFrame plans with DuckDB oracle twins.

Scale story (100 TB): the merge is one anti-join + union — both sides
shuffle on the merge key, or zero-shuffle when the target is bucketed
by key (see ``operators/bucketing.py``); the changeset is typically
tiny relative to the target, so AQE picks a broadcast anti-join and the
target is never shuffled at all. SCD2 is a single window over one
shuffle by the dimension key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from etl_gcp_function_tmabrasil_spark.queries._util import load_table, second

_MERGE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]

#: Sentinel for an open-ended SCD2 validity interval.
_OPEN_END = "9999-12-31 00:00:00"


def _changeset(target: DataFrame) -> DataFrame:
    """Deterministic synthetic changeset: every 7th key is an update
    (repriced, status 'U'), every 11th key arrives as a brand-new row
    (key shifted above the target's key space, status 'I'). The reprice
    is an exact IEEE double addition — bit-identical across engines,
    unlike a multiply-then-round which falls on rounding-mode ties."""
    updates = (
        target.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1000.0))
        .withColumn("o_orderstatus", F.lit("U"))
    )
    inserts = (
        target.filter(F.col("o_orderkey") % 11 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(1_000_000_000))
        .withColumn("o_orderstatus", F.lit("I"))
    )
    return updates.unionByName(inserts).select(*_MERGE_COLS)


def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE a changeset into `orders`, last-writer-wins on the key.

    target ANTI-JOIN changes (drop rows being replaced) UNION ALL
    changes — the canonical shuffle-minimal upsert plan. The changeset
    side is small, so Catalyst/AQE broadcasts it and the target is a
    single pass with no shuffle.
    """
    target = load_table(spark, sf_dir, "orders").select(*_MERGE_COLS)
    changes = _changeset(target)
    return (
        target.join(changes.select("o_orderkey"), "o_orderkey", "left_anti")
        .select(*_MERGE_COLS)
        .unionByName(changes)
    )


_MERGE_SQL = """
WITH target AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
), changes AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         o_totalprice + 1000.0 AS o_totalprice
  FROM target WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey + 1000000000, o_custkey, 'I', o_totalprice
  FROM target WHERE o_orderkey % 11 = 0
)
SELECT * FROM target
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changes)
UNION ALL
SELECT * FROM changes
ORDER BY o_orderkey
"""


def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension history from the `events` stream: each event is
    a version of its user's state, valid from its timestamp until the
    user's next event (open-ended sentinel for the latest). One window
    over one shuffle by user_id; event_id tiebreaks equal timestamps so
    the interval chain is deterministic.
    """
    events = load_table(spark, sf_dir, "events")
    # NULLS FIRST pinned EXPLICITLY in both engines: Spark's bare ASC
    # is NULLS FIRST but DuckDB's default is NULLS LAST, so one NULL ts
    # would chain every LEAD/valid_to in its user's partition
    # differently across engines
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_first(), "event_id"
    )
    nxt = F.lead("ts").over(w)
    return events.select(
        "user_id",
        "event_id",
        "event_type",
        second("ts").alias("valid_from"),
        F.coalesce(second(nxt), F.lit(_OPEN_END)).alias("valid_to"),
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )


_SCD2_SQL = f"""
SELECT user_id, event_id, event_type,
  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
  COALESCE(strftime(LEAD(ts) OVER w, '%Y-%m-%d %H:%M:%S'), '{_OPEN_END}') AS valid_to,
  CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)
ORDER BY user_id, event_id
"""


_DIFF_BUCKETS = 64
#: canonical row rendering shared verbatim by both engines — decimal
#: cast pins the double's digits, strftime/date_format pin the ts
_DIFF_ROW_SPARK = (
    "concat_ws('|', event_id, user_id, event_type,"
    " date_format(ts, 'yyyy-MM-dd HH:mm:ss'),"
    " cast(cast(value as decimal(18,4)) as string))"
)
_DIFF_ROW_SQL = (
    "event_id || '|' || user_id || '|' || event_type || '|' || "
    "strftime(ts, '%Y-%m-%d %H:%M:%S') || '|' || "
    "CAST(CAST(value AS DECIMAL(18,4)) AS VARCHAR)"
)


def table_diff_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-checksum TABLE RECONCILIATION — locate where two huge
    tables differ WITHOUT comparing rows: hash every row to a 60-bit
    value over a canonical rendering, fold the hashes per key-bucket
    (order-independent decimal SUM), and compare the two tables'
    per-bucket (checksum, count) summaries. Equal buckets are proven
    equal-in-content (up to hash collision) by exchanging O(buckets)
    bytes; only differing buckets would be drilled further — the
    data-diff / anti-entropy pattern (Merkle-style divergence
    narrowing, as in Dynamo-family replica sync and modern data-diff
    tooling), here flattened to one level.

    The gate diffs `events` against an in-engine drifted copy (values
    perturbed where event_id % 997 == 0, rows dropped where
    event_id % 1013 == 0) and returns ONLY the differing buckets with
    both sides' counts — buckets untouched by the planted drift must
    checksum identical, so any rendering or hashing divergence between
    the engines floods the output and cannot hash-match.

    Scale: each side is one scan + one 64-ary hash-sum shuffle;
    the comparison joins two 64-row summaries. No row ever crosses
    the network; at 100 TB per side this is the only honest way to
    answer "are these replicas identical, and if not, where"."""
    from etl_gcp_function_tmabrasil_spark.queries._util import SPARK_HASH60

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    drifted = ev.filter(F.col("event_id") % 1013 != 0).withColumn(
        "value",
        F.when(
            F.col("event_id") % 997 == 0, F.col("value") + F.lit(1.0)
        ).otherwise(F.col("value")),
    )

    def summary(df: DataFrame) -> DataFrame:
        return (
            df.select(
                (F.col("event_id") % _DIFF_BUCKETS).alias("bucket"),
                F.expr(
                    SPARK_HASH60.format(expr=_DIFF_ROW_SPARK)
                ).alias("h"),
            )
            .groupBy("bucket")
            .agg(
                F.sum(F.col("h").cast("decimal(38,0)")).alias("checksum"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    a = summary(ev).select(
        "bucket",
        F.col("checksum").alias("sum_a"),
        F.col("n").alias("n_a"),
    )
    b = summary(drifted).select(
        "bucket",
        F.col("checksum").alias("sum_b"),
        F.col("n").alias("n_b"),
    )
    return (
        a.join(b, "bucket", "full_outer")
        .filter(
            (~F.col("sum_a").eqNullSafe(F.col("sum_b")))
            | (~F.col("n_a").eqNullSafe(F.col("n_b")))
        )
        .select(
            "bucket",
            "n_a",
            "n_b",
            (F.col("sum_a") - F.col("sum_b")).cast("decimal(38,0)").cast(
                "string"
            ).alias("checksum_delta"),
        )
        .orderBy("bucket")
    )


def _table_diff_sql() -> str:
    from etl_gcp_function_tmabrasil_spark.queries._util import SQL_HASH60

    h = SQL_HASH60.format(expr=_DIFF_ROW_SQL)
    return f"""
WITH base AS (
  SELECT event_id % {_DIFF_BUCKETS} AS bucket,
    CAST({h} AS DECIMAL(38,0)) AS h
  FROM events
),
drift_src AS (
  SELECT event_id, user_id, event_type, ts,
    CASE WHEN event_id % 997 = 0 THEN value + 1.0 ELSE value END AS value
  FROM events WHERE event_id % 1013 <> 0
),
drift AS (
  SELECT event_id % {_DIFF_BUCKETS} AS bucket,
    CAST({h} AS DECIMAL(38,0)) AS h
  FROM drift_src
),
sa AS (SELECT bucket, SUM(h) AS sum_a, COUNT(*) AS n_a
       FROM base GROUP BY bucket),
sb AS (SELECT bucket, SUM(h) AS sum_b, COUNT(*) AS n_b
       FROM drift GROUP BY bucket)
SELECT COALESCE(sa.bucket, sb.bucket) AS bucket, n_a, n_b,
  CAST(CAST(sum_a - sum_b AS DECIMAL(38,0)) AS VARCHAR) AS checksum_delta
FROM sa FULL OUTER JOIN sb ON sa.bucket = sb.bucket
WHERE sum_a IS DISTINCT FROM sum_b OR n_a IS DISTINCT FROM n_b
ORDER BY bucket
"""


QUERIES = {
    "cdc_merge_upsert": cdc_merge_upsert,
    "scd2_user_history": scd2_user_history,
    "table_diff_checksum": table_diff_checksum,
}

ORACLE = {
    "cdc_merge_upsert": _MERGE_SQL,
    "scd2_user_history": _SCD2_SQL,
    "table_diff_checksum": _table_diff_sql(),
}
