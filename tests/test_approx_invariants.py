"""Bounded-error invariants for the sketch aggregates. The gate queries
now carry the in-bound boolean themselves (agg_approx_distinct /
agg_hll_mergeable emit `*_within_5pct` checked against the DuckDB
oracle's literal TRUE); these tests pin the same invariant locally with
the underlying estimates surfaced, so a sketch regression fails here
with the actual numbers, not just a hash mismatch."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_gcp_function_tmabrasil_spark.catalog import load_table
from etl_gcp_function_tmabrasil_spark.queries.aggregates import (
    agg_approx_distinct,
    agg_hll_mergeable,
)


def test_approx_distinct_within_error_bound(spark, sf_dir):
    rows = agg_approx_distinct(spark, sf_dir).collect()
    assert rows
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r.exact
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("exact"))
        .collect()
    }
    for r in rows:
        assert r.n_exact_parts == exact[r.l_returnflag]
        assert r.hll_within_5pct, (
            f"{r.l_returnflag}: HLL++ estimate outside 5% of {r.n_exact_parts}"
        )


def test_hll_sketch_union_within_error_bound(spark, sf_dir):
    rows = agg_hll_mergeable(spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        r.lang: r.exact
        for r in docs.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("lang")
        .agg(F.countDistinct("tok").alias("exact"))
        .collect()
    }
    for r in rows:
        assert r.n_exact_tokens == exact[r.lang]
        assert r.est_within_5pct, (
            f"{r.lang}: union-merged sketch estimate outside 5% of {r.n_exact_tokens}"
        )
