"""Bucketed (pre-shuffled) tables for co-located joins — the storage-side
answer to SURVEY.md §2.2's "Partitioning & shuffle" mandate.

At 100 TB the dominant cost of a fact⨝fact join (e.g. orders⨝lineitem)
is shuffling both sides on the key. Bucketing pays that shuffle ONCE at
write time: rows are hash-partitioned into a fixed number of buckets on
disk, and any later join or aggregation on the bucket key reads the
co-located buckets with NO exchange in the plan. This is Spark's
built-in `bucketBy` (Hive-compatible layout) — we add only the policy
wrapper; `tests/test_bucketing.py` pins the no-Exchange plan property.

Rules of thumb encoded here:
- bucket the biggest fact tables on their join key (lineitem/orders on
  orderkey),
- pick bucket counts as a multiple of cluster parallelism; both sides of
  a join need the SAME count (or a divisor) for exchange elimination,
- `sortBy` the bucket key so sort-merge join also skips the sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed parquet table in the session catalog.

    The write shuffles on ``bucket_cols`` once; every later join/agg on
    those columns is exchange-free (verified by plan tests).

    ``path`` makes the table EXTERNAL with its data at that location —
    the bucket spec still lives in the catalog, so exchange elimination
    is unchanged. Callers whose tables are per-process scratch (the
    gate fixtures) must pass a per-process path: the default managed
    location is the fixed shared warehouse dir, where pid-suffixed
    table data from every past process would otherwise accumulate
    (the metastore is per-process, but the FILES persist)."""
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; Spark's scan reports the bucketing to
    the planner, which is what allows exchange elimination."""
    return spark.table(table)
