"""queries/_util.managed_persist — one cache generation per call site:
re-invoking frees the previous generation, bounding a long session."""

from pyspark import StorageLevel
from pyspark.sql import functions as F


def test_previous_generation_is_released(spark):
    from etl_gcp_function_tmabrasil_spark.queries._util import (
        _MANAGED_CACHE,
        managed_persist,
    )

    key = "test.managed_persist.gen"
    a = managed_persist(spark.range(10).withColumn("x", F.col("id") * 2), key)
    a.count()  # materialize generation 1
    assert a.storageLevel != StorageLevel.NONE
    b = managed_persist(spark.range(10).withColumn("x", F.col("id") * 3), key)
    b.count()
    # generation 1 was unpersisted when generation 2 registered
    assert a.storageLevel == StorageLevel.NONE, "previous generation leaked"
    assert b.storageLevel != StorageLevel.NONE
    assert _MANAGED_CACHE[key] is b
    # cleanup
    b.unpersist()
    _MANAGED_CACHE.pop(key, None)


def test_same_lineage_reinvocation_is_safe(spark):
    from etl_gcp_function_tmabrasil_spark.queries._util import (
        _MANAGED_CACHE,
        managed_persist,
    )

    key = "test.managed_persist.same"

    def build():
        return managed_persist(spark.range(5).withColumn("y", F.lit(1)), key)

    first = build()
    assert first.count() == 5
    second = build()  # identical lineage: must not raise or corrupt
    assert second.count() == 5
    assert second.storageLevel != StorageLevel.NONE
    second.unpersist()
    _MANAGED_CACHE.pop(key, None)
