"""Table catalog: schemas + loaders for the driver's parquet tables.

Tables (``TESTDATA.md``): TPC-H-ish star schema (``region nation customer
supplier part orders lineitem``) plus ``events`` (stream-shaped),
``documents`` and ``embeddings`` (LLM-pipeline tables).

Explicit ``StructType`` schemas are declared for the stream-shaped tables
(required by ``readStream``) and for the reference-derived ``file_events``
model (normalized CloudEvent payload, ``/root/reference/main.py:6-9``).
Batch parquet loads rely on parquet footers — self-describing, and the
vectorized reader + column pruning work without declared schemas.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: Small dimension tables that should always be broadcast in joins.
BROADCAST_DIMS = {"region", "nation"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Schema of the `events` table — declared for streaming replays
#: (readStream requires a user schema on file sources).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

#: Normalized CloudEvent payload for GCS object-finalize events — the
#: reference's unit of work (`/root/reference/main.py:6-9`): bucket, name,
#: size extracted defensively from a semi-structured dict (all nullable).
FILE_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("size", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table. Plain parquet scan: vectorized read,
    predicate pushdown and column pruning all apply downstream.

    The `events` table is written with parquet TIMESTAMP(NANOS), which
    Spark's reader rejects by default; we read nanos as int64 (legacy
    conf) and floor-convert to microsecond timestamps — the same ns→µs
    truncation DuckDB applies, so oracle comparisons agree.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each table as a temp view so queries can use spark.sql."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
