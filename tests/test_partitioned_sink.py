"""Partition-pruning guardrail for the date-partitioned events sink:
a date predicate must show up as a PartitionFilter (directory-level
skip), not just a row-level filter."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from etl_gcp_function_tmabrasil_spark.catalog import load_table
from etl_gcp_function_tmabrasil_spark.plans.inspect import explain_str
from etl_gcp_function_tmabrasil_spark.sinks.partitioned import (
    read_events_partitioned,
    write_events_partitioned,
)


def test_partitioned_write_prunes_and_roundtrips(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_date")
    write_events_partitioned(ev, path)

    back = read_events_partitioned(spark, path)
    assert back.count() == ev.count()

    day = ev.select(F.to_date("ts").alias("d")).orderBy("d").first().d
    q = back.filter(F.col("event_date") == F.lit(day))

    plan = explain_str(q)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1), (
        "date predicate did not become a partition filter:\n" + plan
    )

    expected = ev.filter(F.to_date("ts") == F.lit(day)).count()
    assert q.count() == expected
