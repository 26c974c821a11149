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


QUERIES = {
    "cdc_merge_upsert": cdc_merge_upsert,
    "scd2_user_history": scd2_user_history,
}

ORACLE = {
    "cdc_merge_upsert": _MERGE_SQL,
    "scd2_user_history": _SCD2_SQL,
}
