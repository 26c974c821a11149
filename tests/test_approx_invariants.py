"""Bounded-error invariant for the sketch aggregate (the oracle-less
queries() entry): approx_count_distinct's HLL++ estimate must sit within
a few multiples of its configured relative error (rsd=0.01) of the exact
distinct count."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_gcp_function_tmabrasil_spark.catalog import load_table
from etl_gcp_function_tmabrasil_spark.queries.aggregates import agg_approx_distinct


def test_approx_distinct_within_error_bound(spark, sf_dir):
    approx = {
        r.l_returnflag: r.approx_parts
        for r in agg_approx_distinct(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r.exact
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, ex in exact.items():
        # rsd 0.01; allow 5 sigma plus slack for small groups
        assert abs(approx[k] - ex) <= max(2, 0.05 * ex), (
            f"{k}: estimate {approx[k]} vs exact {ex} outside bound"
        )


def test_hll_sketch_union_within_error_bound(spark, sf_dir):
    # default lgConfigK=12 → ~1.6% relative standard error; allow 4x.
    from etl_gcp_function_tmabrasil_spark.queries.aggregates import (
        agg_hll_mergeable,
    )

    est = {
        r.lang: r.est_distinct_tokens for r in agg_hll_mergeable(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        r.lang: r.exact
        for r in docs.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("lang")
        .agg(F.countDistinct("tok").alias("exact"))
        .collect()
    }
    assert set(est) == set(exact)
    for lang, e in exact.items():
        assert abs(est[lang] - e) <= max(2, 0.064 * e), (
            f"{lang}: sketch estimate {est[lang]} vs exact {e}"
        )
