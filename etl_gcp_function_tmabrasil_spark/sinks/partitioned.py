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


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str = "event_date",
    target_records_per_file: int = 5_000_000,
) -> None:
    """Rewrite a partitioned parquet layout into few large files per
    partition — the small-files remedy every long-running 100 TB ingest
    needs: streaming appends and per-batch writes accrete thousands of
    KB-sized files per date, and scan cost becomes file-open bound
    (footer reads, listing, task scheduling) instead of byte bound.

    Shape: ONE shuffle keyed on the partition column (repartition by
    `partition_col` co-locates each partition's rows onto one task, so
    each rewritten partition emits ceil(rows/target) files) into a
    STAGING directory — Spark rightly refuses to overwrite a path it
    is simultaneously reading — then a per-partition directory swap:
    readers of untouched partitions are unaffected, and the displaced
    original is first renamed to a DOT-PREFIXED name (hidden paths are
    skipped by Spark's file listing and partition discovery), so no
    crash point can leave a bogus `…__old` partition value visible to
    readers. Crash-safety is rename-granular, not transactional: a
    crash between the two renames leaves that one partition absent
    from listings until the hidden `.compact_old__key=value` dir is
    restored — automatically, by the next compaction run's self-heal
    below (its data is intact throughout) — and even crash-free a
    concurrent reader can list the path during the swap and miss the
    partition for one scan. The swap uses local-filesystem rename,
    matching this
    repo's local warehouse substitute (BigQuerySink's parquet
    fallback); on HDFS the same protocol runs on FileSystem.rename,
    and on object stores compaction belongs to a table format's commit
    (Iceberg/Delta rewrite actions).

    The crash window SELF-HEALS on the next compaction (same protocol
    as the streaming CDC merges): any hidden `.compact_old__X` whose
    visible partition `X` is missing is restored before the rewrite,
    so a crashed run's partition reappears in listings without manual
    intervention.
    """
    import os
    import shutil

    # Heal a prior run's between-renames crash before reading: the
    # displaced partition's data is intact under the hidden name, and
    # compacting without it would silently drop it from the rewrite.
    if os.path.isdir(path):
        for entry in os.listdir(path):
            if entry.startswith(".compact_old__"):
                visible = os.path.join(path, entry[len(".compact_old__") :])
                hidden = os.path.join(path, entry)
                if not os.path.isdir(visible):
                    os.rename(hidden, visible)
                else:
                    shutil.rmtree(hidden)

    staging = path.rstrip("/") + "__compact_tmp"
    if os.path.isdir(staging):
        shutil.rmtree(staging)
    (
        spark.read.parquet(path)
        .repartition(F.col(partition_col))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target_records_per_file)
        .partitionBy(partition_col)
        .parquet(staging)
    )
    for entry in os.listdir(staging):
        if not entry.startswith(f"{partition_col}="):
            continue  # _SUCCESS and friends
        src = os.path.join(staging, entry)
        dst = os.path.join(path, entry)
        # Dot-prefix hides the displaced dir from Spark's file listing,
        # so a crash between the two renames can never surface it as a
        # bogus partition value (ADVICE r5: `…__old` inside `path` was
        # read as a partition, flipping event_date inference to string).
        old = os.path.join(path, f".compact_old__{entry}")
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(dst):
            os.rename(dst, old)
        os.rename(src, dst)
        if os.path.isdir(old):
            shutil.rmtree(old)
    shutil.rmtree(staging)
