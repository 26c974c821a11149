"""Plan-shape guardrails for the round-10 operators: pin the physical
properties each SCALING.md entry claims — per-doc window passes (never
a global single-task sort), equi-keyed candidate joins (never a
cartesian pair space), broadcast vocabulary grids, and decimal window
frames keyed on the group."""

from __future__ import annotations

from etl_gcp_function_tmabrasil_spark.plans.inspect import (
    count_exchanges,
    explain_str,
)
from etl_gcp_function_tmabrasil_spark.queries.aggregates import (
    agg_kmv_distinct,
)
from etl_gcp_function_tmabrasil_spark.queries.analytics import (
    agg_weighted_median,
    agg_winsorized_mean,
    quantile_normalize_profile,
    seq_pattern_match,
    timeseries_seasonal_decompose,
)
from etl_gcp_function_tmabrasil_spark.queries.dedup_approx import (
    dedup_winnowing_pairs,
)
from etl_gcp_function_tmabrasil_spark.queries.text_analysis import (
    corpus_divergence_js,
)


def test_winnowing_pair_join_is_equi_on_fingerprint(spark, sf_dir):
    """The pair stage must key on the selected fingerprint — a
    cartesian doc-pair space would be the degenerate-shingle failure
    the gram width was profiled against."""
    df = dedup_winnowing_pairs(spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    # the window is keyed per document, not global
    assert "hashpartitioning(doc_id" in plan, "winnow window not per-doc"


def test_seq_pattern_single_user_shuffle(spark, sf_dir):
    df = seq_pattern_match(spark, sf_dir)
    plan = explain_str(df)
    assert "hashpartitioning(user_id" in plan
    # one agg shuffle + the presentation sort
    assert count_exchanges(df) <= 3, plan


def test_weighted_median_window_keyed_on_group(spark, sf_dir):
    """r15: agg_weighted_median now goes through banded_weighted_median
    (operators/quantiles.py) — the whole-table RANGE window over every
    row is gone; what remains keyed-per-group is the crossing-band
    running sum (the internal group alias is ``g``), and the band
    tables stay O(bands). Pin the new shape's invariants."""
    df = agg_weighted_median(spark, sf_dir)
    plan = explain_str(df)
    # the within-band window / aggs are keyed on the group alias, never
    # a single global partition
    assert "hashpartitioning(g#" in plan or "hashpartitioning(g," in plan
    assert "CartesianProduct" not in plan
    # the crossing band joins back via broadcast, not a shuffled join
    assert "BroadcastHashJoin" in plan


def test_winsorize_window_keyed_on_group(spark, sf_dir):
    df = agg_winsorized_mean(spark, sf_dir)
    plan = explain_str(df)
    assert "hashpartitioning(event_type" in plan
    assert "CartesianProduct" not in plan


def test_seasonal_window_keyed_on_type(spark, sf_dir):
    df = timeseries_seasonal_decompose(spark, sf_dir)
    plan = explain_str(df)
    assert "hashpartitioning(event_type" in plan
    assert "CartesianProduct" not in plan


def test_qnorm_ntile_keyed_per_source(spark, sf_dir):
    df = quantile_normalize_profile(spark, sf_dir)
    plan = explain_str(df)
    assert "hashpartitioning(grp" in plan, "ntile not partitioned by source"


def test_jsd_vocab_grid_broadcasts(spark, sf_dir):
    """The |sources| x |vocab| grid must come from BROADCAST joins of
    the vocabulary-sized sides — a shuffled cartesian would grow with
    the corpus instead of the vocabulary."""
    df = corpus_divergence_js(spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_kmv_sketch_is_windowed_not_collected(spark, sf_dir):
    """The per-type sketch must be a keyed window top-K, and the merge
    row a K-row limit — no corpus-sized global sort. r11 VERDICT: the
    rank+filter shape is scale-safe only while Spark's
    InferWindowGroupLimit rewrite fires (map-side top-K BEFORE the
    exchange); with 2 event types a silent regression means two tasks
    each sorting ALL distinct hashes, so the rewrite itself is pinned."""
    df = agg_kmv_distinct(spark, sf_dir)
    plan = explain_str(df)
    assert "hashpartitioning(event_type" in plan
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan, (
        "InferWindowGroupLimit stopped firing: the KMV k-smallest set "
        "now needs a per-group FULL sort of every distinct hash"
    )


def test_kmv_set_algebra_window_group_limit_pinned(spark, sf_dir):
    from etl_gcp_function_tmabrasil_spark.queries.aggregates import (
        agg_kmv_set_algebra,
    )

    df = agg_kmv_set_algebra(spark, sf_dir)
    plan = explain_str(df)
    assert "hashpartitioning(event_type" in plan
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan


def test_psi_windows_keyed_and_dims_broadcast(spark, sf_dir):
    from etl_gcp_function_tmabrasil_spark.queries.analytics import drift_psi

    df = drift_psi(spark, sf_dir)
    plan = explain_str(df)
    assert "hashpartitioning(event_type" in plan
    assert "CartesianProduct" not in plan
    # the timeline midpoint and edge/bin tables ride broadcasts
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_key_skew_single_stack_pass(spark, sf_dir):
    """All candidate key columns must profile from ONE unpivoted scan
    of lineitem — the RFM never-N-funnels rule."""
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        profile_key_skew,
    )

    import re

    df = profile_key_skew(spark, sf_dir)
    plan = explain_str(df)
    # count physical scan NODES (formatted explain prints each node in
    # the tree AND in the detail listing)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert "hashpartitioning(col_name" in plan
    assert "CartesianProduct" not in plan


def test_neyman_totals_broadcast(spark, sf_dir):
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        sample_neyman_allocation,
    )

    df = sample_neyman_allocation(spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
