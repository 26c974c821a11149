"""Scale-engineering guardrails: bucketed joins must be exchange-free,
and salted operators must be exactly equal to their unsalted twins.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_gcp_function_tmabrasil_spark.catalog import load_table
from etl_gcp_function_tmabrasil_spark.operators.bucketing import (
    read_bucketed,
    write_bucketed,
)
from etl_gcp_function_tmabrasil_spark.operators.skew import (
    salted_join,
    salted_sum_count,
)
from etl_gcp_function_tmabrasil_spark.plans.inspect import count_exchanges


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # warehouse dir is a static conf, set to /tmp in the session factory
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        "li_bucketed",
        ["l_orderkey"],
        n_buckets=8,
    )
    write_bucketed(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
        "ord_bucketed",
        ["o_orderkey"],
        n_buckets=8,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li = read_bucketed(spark, "li_bucketed")
    ord_ = read_bucketed(spark, "ord_bucketed")
    joined = li.hint("merge").join(ord_, li.l_orderkey == ord_.o_orderkey)
    n = count_exchanges(joined)
    assert n == 0, f"bucketed join still shuffles ({n} exchanges)"


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    li = read_bucketed(spark, "li_bucketed")
    ord_ = read_bucketed(spark, "ord_bucketed")
    bucketed = li.join(ord_, li.l_orderkey == ord_.o_orderkey).count()
    plain = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert bucketed == plain


def test_salted_sum_count_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    salted = {
        (r.event_type,): (r.sum_value, r.n_rows)
        for r in salted_sum_count(
            ev, ["event_type"], "value", n_salts=8, salt_from="event_id"
        ).collect()
    }
    plain = {
        (r.event_type,): (r.sum_value, r.n_rows)
        for r in ev.groupBy("event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    }
    assert salted == plain


def test_salted_join_exact(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    salted = salted_join(orders, cust, "c_custkey", n_salts=8, salt_from="o_orderkey")
    plain = orders.join(cust, "c_custkey")
    assert salted.count() == plain.count()
    a = salted.groupBy("c_mktsegment").count().collect()
    b = plain.groupBy("c_mktsegment").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
