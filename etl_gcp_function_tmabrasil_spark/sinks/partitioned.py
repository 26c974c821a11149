"""Date-partitioned parquet sink for the `events` stream (SURVEY.md
§7.3 "partition-by-date on events"; reference's folder-prefix routing,
`/root/reference/main.py:12`, generalized to hive-style partitions).

At 100 TB the events table is append-only and time-ordered; laying it
out as `event_date=YYYY-MM-DD/` directories makes every time-bounded
query prune at the *directory* level — the scan never opens files
outside the predicate's date range (static partition pruning; dynamic
partition pruning covers the join-driven case). `tests/
test_partitioned_sink.py` pins the pruning behavior via the plan's
PartitionFilters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_events_partitioned(
    events: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """Write events parquet partitioned by event_date (derived from ts).

    maxRecordsPerFile bounds file sizes so a hot date still splits into
    parallel-scannable files at cluster scale.
    """
    (
        events.withColumn("event_date", F.to_date("ts"))
        .repartition("event_date")
        .write.mode(mode)
        .option("maxRecordsPerFile", 5_000_000)
        .partitionBy("event_date")
        .parquet(path)
    )


def read_events_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned layout back; filters on event_date prune
    directories before any file is opened."""
    return spark.read.parquet(path)
