"""Plan-shape guardrails for the round-13 operators: pin the physical
properties each SCALING.md entry claims — broadcast bloom probes and
one-row scalar frames, exact-date equi-joins (never a global-order
window), edge-list cache reuse under the wedge join, and the cell
prune's broadcast probe side."""

from __future__ import annotations

from etl_gcp_function_tmabrasil_spark.plans.inspect import (
    count_exchanges,
    explain_str,
)
from etl_gcp_function_tmabrasil_spark.queries.aggregates import feature_woe_iv
from etl_gcp_function_tmabrasil_spark.queries.analytics import (
    ab_test_cuped,
    ab_test_did,
    forecast_backtest_smape,
    period_over_period_growth,
)
from etl_gcp_function_tmabrasil_spark.queries.dedup_approx import (
    dedup_incremental_bloom,
)
from etl_gcp_function_tmabrasil_spark.queries.relational3 import (
    graph_adamic_adar,
)
from etl_gcp_function_tmabrasil_spark.queries.similarity import (
    knn_radius_cells,
)
from etl_gcp_function_tmabrasil_spark.queries.traindata2 import (
    batch_length_bucketing,
)


def test_cuped_one_rollup_no_global_window(spark, sf_dir):
    """CUPED = per-user pass + ONE conditional rollup; the midpoint
    scalar rides a broadcast one-row frame, and nothing funnels into a
    partition-less window."""
    df = ab_test_cuped(spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan, "CUPED must not need any window"
    assert "hashpartitioning(event_type" in plan


def test_did_shares_the_prepost_shape(spark, sf_dir):
    df = ab_test_did(spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "hashpartitioning(event_type" in plan


def test_woe_iv_totals_ride_broadcasts(spark, sf_dir):
    """Category totals and the IV total are bounded one-row/|cat|-row
    frames — both must come back as broadcast joins, never a shuffle
    join against the rollup."""
    df = feature_woe_iv(spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pop_growth_is_date_equi_join_not_global_window(spark, sf_dir):
    """Calendar alignment must be exact-date self-joins (shuffle on the
    date key) — a LAG window over global date order would single-task
    the whole frame."""
    df = period_over_period_growth(spark, sf_dir)
    plan = explain_str(df)
    assert "Window" not in plan, "PoP growth must not use a window"
    assert "CartesianProduct" not in plan


def test_backtest_is_date_equi_join_not_global_window(spark, sf_dir):
    df = forecast_backtest_smape(spark, sf_dir)
    plan = explain_str(df)
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(method" in plan


def test_bloom_probes_are_broadcast(spark, sf_dir):
    """The bit-position table (≤ BLOOM_M rows) must broadcast into both
    probe joins and the verify side must stay an equi anti-join — a
    shuffled bloom probe would defeat the prefilter's purpose."""
    df = dedup_incremental_bloom(spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2, "bloom probes not broadcast"


def test_bucketing_single_rollup(spark, sf_dir):
    """Row-local cap assignment + one ≤10-key rollup: exactly the agg
    exchange and the presentation sort."""
    df = batch_length_bucketing(spark, sf_dir)
    assert count_exchanges(df) <= 2, explain_str(df)


def test_adamic_adar_reuses_the_persisted_edge_list(spark, sf_dir):
    """The edge list feeds four consumers; the persist must serve all
    of them (InMemoryTableScan everywhere) instead of re-running the
    lineitem scan + distinct join per reference."""
    spark.catalog.clearCache()
    df = graph_adamic_adar(spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert plan.count("InMemoryTableScan") >= 4, (
        "edge list not served from cache"
    )
    spark.catalog.clearCache()


def test_radius_probe_side_broadcasts(spark, sf_dir):
    """Surviving (query, cell) pairs are a bounded frame — the member
    join must broadcast it; the corpus side must never shuffle for the
    probe."""
    df = knn_radius_cells(spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "probe join fell back to a shuffle"
