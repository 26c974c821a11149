"""Equivalence of the distributed two-pass rank rewrites against their
single-task window formulations on adversarial synthetic inputs —
duplicates (band ties), N smaller than the tile count, skewed bands,
and sizes that don't divide evenly. The driver tables never hit these
edges; these fixtures do.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import Window as W, functions as F


def _write_customer(spark, tmp_path, balances):
    rows = [(i, float(b)) for i, b in enumerate(balances)]
    df = spark.createDataFrame(rows, "c_custkey: long, c_acctbal: double")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    return str(tmp_path)


@pytest.mark.parametrize(
    "case,balances",
    [
        ("uniform", np.random.RandomState(0).uniform(-999, 9999, 997)),
        ("heavy_ties", [100.0] * 37 + [200.0] * 41 + [-5.0] * 29),
        ("tiny_n_lt_tiles", [7.0, 3.0]),
        ("single_row", [42.0]),
        ("one_band_skew", np.random.RandomState(1).uniform(0, 1, 500)),
    ],
)
def test_ntile_two_pass_equals_global_window(spark, tmp_path, case, balances):
    from etl_gcp_function_tmabrasil_spark.queries.windows import (
        NTILE_N,
        window_ntile,
    )

    sf_dir = _write_customer(spark, tmp_path, balances)
    got = {tuple(r) for r in window_ntile(spark, sf_dir).collect()}
    cust = spark.read.parquet(str(tmp_path / "customer.parquet"))
    w = W.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    want = {
        tuple(r)
        for r in (
            cust.select(
                "c_acctbal", F.ntile(NTILE_N).over(w).alias("quartile")
            )
            .groupBy("quartile")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.min("c_acctbal"), 4).alias("min_bal"),
                F.round(F.max("c_acctbal"), 4).alias("max_bal"),
            )
            .collect()
        )
    }
    assert got == want, f"two-pass ntile diverged from ntile() on case {case}"


@pytest.mark.parametrize(
    "case,token_counts",
    [
        ("uniform", np.random.RandomState(2).randint(1, 400, 5000)),
        ("bucket_boundary", [10] * 4096 * 2),  # exactly 2 full buckets
        ("single_doc", [17]),
        ("huge_docs", [100_000] * 7),
    ],
)
def test_pack_two_pass_equals_global_window(spark, tmp_path, case, token_counts):
    from etl_gcp_function_tmabrasil_spark.queries.curation_ops import (
        SHARD_TOKEN_BUDGET,
        pack_token_budget,
    )

    rows = [(i, " ".join(["t"] * int(n))) for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    df.coalesce(4).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = [tuple(r) for r in pack_token_budget(spark, str(tmp_path)).collect()]

    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = F.sum(F.size(F.split("text", " ")).cast("long")).over(w)
    n_tok = F.size(F.split("text", " ")).cast("long")
    want = [
        tuple(r)
        for r in docs.select(
            "doc_id",
            n_tok.alias("n_tokens"),
            (cum - n_tok).alias("start_offset"),
            F.floor((cum - n_tok) / F.lit(SHARD_TOKEN_BUDGET)).alias("shard_id"),
        )
        .orderBy("doc_id")
        .collect()
    ]
    assert got == want, f"two-pass prefix sum diverged on case {case}"


@pytest.mark.parametrize(
    "case,groups",
    [
        ("uniform", {p: np.random.RandomState(3).uniform(800, 600000, 400) for p in ["1-URGENT", "2-HIGH"]}),
        ("single_value_group", {"1-URGENT": [5000.0], "2-HIGH": [1.0, 2.0]}),
        ("all_ties", {"1-URGENT": [777.0] * 50}),
        ("band_boundaries", {"1-URGENT": [1000.0 * k for k in range(1, 30)]}),
        ("tiny_spread", {"1-URGENT": [999.99, 1000.0, 1000.01]}),
        (
            "mixed_sign",
            {"1-URGENT": list(np.random.RandomState(4).uniform(-5000, 5000, 301))},
        ),
        ("all_negative", {"1-URGENT": [-10.0, -2000.5, -999.99, -1000.0]}),
        # NULLs must be ignored exactly as percentile/quantile_cont do
        ("with_nulls", {"1-URGENT": [100.0, None, 300.0, None, 500.0], "2-HIGH": [7.0, None]}),
    ],
)
def test_banded_percentile_equals_buffering_percentile(spark, tmp_path, case, groups):
    from etl_gcp_function_tmabrasil_spark.queries.aggregates import agg_percentiles

    rows = [(p, None if v is None else float(v)) for p, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "o_orderpriority: string, o_totalprice: double")
    df.coalesce(2).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {tuple(r) for r in agg_percentiles(spark, str(tmp_path)).collect()}
    want = {
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "orders.parquet"))
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
            F.round(F.min("o_totalprice"), 4).alias("min_price"),
            F.round(F.max("o_totalprice"), 4).alias("max_price"),
        )
        .collect()
    }
    assert got == want, f"banded percentile diverged on case {case}"


@pytest.mark.parametrize(
    "case,secs",
    [
        ("boundary_exact", [0, 3600, 7200, 7200, 10800]),
        ("all_within_one_frame", [10, 20, 30, 3500]),
        ("sparse", [0, 100000, 200000]),
        ("ties_across_buckets", [3599, 3600, 3600, 3601, 7199, 7200]),
        ("dense_random", list(np.random.RandomState(5).randint(0, 50000, 300))),
    ],
)
def test_ghost_bucket_range_frame_equals_bare_window(spark, tmp_path, case, secs):
    from etl_gcp_function_tmabrasil_spark.queries.windows import window_range_frame

    rows = [
        (i, "click" if i % 2 else "view", float(i % 7), int(s))
        for i, s in enumerate(secs)
    ]
    df = spark.createDataFrame(
        rows, "event_id: long, event_type: string, value: double, sec: long"
    ).select(
        "event_id", "event_type", "value", F.timestamp_seconds("sec").alias("ts")
    )
    df.coalesce(2).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    # window_range_frame carries no output ordering (the driver hash
    # is order-insensitive and a global sort is pure cost at scale)
    got = sorted(tuple(r) for r in window_range_frame(spark, str(tmp_path)).collect())

    ev = spark.read.parquet(str(tmp_path / "events.parquet"))
    w = (
        W.partitionBy("event_type")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    want = sorted(
        tuple(r)
        for r in ev.select(
            "event_id",
            "event_type",
            F.count(F.lit(1)).over(w).alias("n_last_hour"),
            F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double")
            .alias("sum_last_hour"),
        )
        .collect()
    )
    assert got == want, f"ghost-bucket range frame diverged on case {case}"
