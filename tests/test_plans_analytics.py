"""Plan-shape guardrails for the late-r9 analytics wave: pin the
physical-plan properties each operator's SCALING.md entry claims —
single key-partitioned window passes, broadcast dimensions, no
corpus-sized single-task sorts."""

from __future__ import annotations

from etl_gcp_function_tmabrasil_spark.plans.inspect import (
    count_exchanges,
    explain_str,
    has_broadcast_hash_join,
)
from etl_gcp_function_tmabrasil_spark.queries.analytics import (
    agg_linear_regression,
    attribution_last_touch,
    basket_association_rules,
    events_markov_transitions,
    events_retention_cohorts,
    ltv_time_decay,
    timeseries_rolling_zscore,
    window_moving_distinct,
    window_moving_median,
)


def test_markov_single_user_window_pass(spark, sf_dir):
    # one user_id window shuffle + the src-normalization window over
    # the tiny rollup + the final order
    df = events_markov_transitions(spark, sf_dir)
    assert count_exchanges(df) <= 4, explain_str(df)
    plan = explain_str(df)
    assert "hashpartitioning(user_id" in plan, "lead window not keyed on user_id"


def test_moving_windows_single_shuffle(spark, sf_dir):
    for fn in (window_moving_median, window_moving_distinct,
               timeseries_rolling_zscore):
        df = fn(spark, sf_dir)
        plan = explain_str(df)
        assert "hashpartitioning(user_id" in plan, fn.__name__
        # one window shuffle + the presentation sort's range exchange
        assert count_exchanges(df) <= 2, (fn.__name__, explain_str(df))


def test_retention_cohort_size_join_broadcasts(spark, sf_dir):
    assert has_broadcast_hash_join(events_retention_cohorts(spark, sf_dir))


def test_attribution_window_keyed_on_user(spark, sf_dir):
    df = attribution_last_touch(spark, sf_dir)
    plan = explain_str(df)
    assert "hashpartitioning(user_id" in plan
    assert "CartesianProduct" not in plan


def test_basket_marginals_broadcast(spark, sf_dir):
    df = basket_association_rules(spark, sf_dir)
    assert has_broadcast_hash_join(df), "part-count marginals did not broadcast"
    assert "CartesianProduct" not in explain_str(df)


def test_ols_single_aggregation_pass(spark, sf_dir):
    # partial+final agg over events: one hash exchange + final sort
    df = agg_linear_regression(spark, sf_dir)
    assert count_exchanges(df) <= 2, explain_str(df)


def test_ltv_single_aggregation_pass(spark, sf_dir):
    # one corpus agg exchange + the final sort, plus the horizon's
    # one-row SinglePartition exchange (metadata-sized by construction)
    df = ltv_time_decay(spark, sf_dir)
    assert count_exchanges(df) <= 3, explain_str(df)
    # formatted explain prints each scan node twice (tree + detail):
    # 2 logical scans (corpus + 1-column horizon) = 4 occurrences
    assert explain_str(df).count("Scan parquet") <= 4, (
        "corpus scanned more than once (+ the 1-column horizon scan)"
    )
