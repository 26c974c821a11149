"""Empty-input robustness: a 100 TB pipeline will hit empty partitions,
empty dates, and freshly-truncated tables; every operator family must
return an empty (or well-defined scalar) result, never throw.

Fixtures: a 0-row copy of every driver table, written once per module.
"""

from __future__ import annotations

import pytest

from etl_gcp_function_tmabrasil_spark.catalog import TABLES, load_table, table_path

#: One representative per operator family; scalar-agg queries
#: legitimately return a single row over empty input.
_FAMILY_QUERIES = [
    ("q1_pricing_summary", 0),
    ("q6_forecast_revenue", 1),  # scalar agg: one row of null/0
    ("q13_customer_distribution", 0),
    ("q21_waiting_suppliers", 0),
    ("window_rank_orders", 0),
    ("window_range_frame", 0),
    ("agg_rollup", None),  # rollup over empty: grand-total row semantics
    ("setop_union_intersect_except", 3),  # one labeled count row per set op
    ("dedup_minhash_lsh", 0),
    ("text_token_count", 0),
    ("text_token_diversity", 0),
    ("knn_bruteforce_cosine", 0),
    ("ann_ivf_cosine", 0),
    ("json_agg_by_key", 0),
    ("window_tumbling_batch", 0),
    ("join_range_bucketed_pairs", 0),
    ("sql_segment_status_rollup", 0),
    ("bpe_merge_pairs", 0),
    ("embedding_gram_matrix", 0),
    ("event_funnel_conversion", 3),  # one labeled count row per stage
    ("pack_token_budget", 0),
    ("window_ntile", 0),
    ("dedup_simhash_pairs", 0),
    ("embedding_cosine_dedup", 0),
    ("resample_daily_locf", 0),
    ("bm25_score_docs", 0),
    ("curriculum_temperature_sample", 0),
    ("fuzzy_name_match", 0),
    ("profile_columns", 5),  # one profile row per column, zeros on empty
    ("agg_percentiles", 0),
    ("agg_iqr_outliers", 0),
    ("agg_salted_hot_key", 0),
    ("join_salted_hot_key", 0),
    ("split_train_val_test", 0),
    ("unigram_lm_score", 0),
    ("source_overlap_matrix", 0),
    ("sql_cte_window_topk", 0),
    ("kmeans_ivf_codebook", 0),
    ("dedup_semantic_semdedup", 0),
    ("agg_approx_percentile", 0),
    ("multimodal_resize_stats", 3),  # synthetic media: one row per kind
    ("sample_weighted_topk", 0),
    ("pagerank_dedup_graph", 0),
    ("agg_robust_outliers", 0),
    # round-4 machinery: null-aware NOT IN (empty build keeps all of an
    # empty fact = 0), banded cume_dist, SCD2 window, lazy whole-row
    # distinct count (one scalar row of zeros)
    ("q16_supplier_part_counts", 0),
    ("window_cume_dist", 0),
    ("scd2_user_history", 0),
    ("distinct_count_full_rows", 1),
    # round-6 registrations: variant parse, decorrelated lateral,
    # Arrow-native norms, leakage-guard split, two-phase global ids,
    # and the dedup decision step (empty pair graph → zero clusters)
    ("json_variant_ops", 0),
    ("sql_lateral_topk", 0),
    ("udf_arrow_vector_norms", 0),
    ("split_group_integrity", 0),
    ("window_global_rownum_scalable", 0),
    ("dedup_cluster_representative", 0),
    ("agg_heavy_hitters", 0),
    # round-7: corpus line dedup (empty corpus -> zero docs)
    ("dedup_corpus_lines", 0),
    # round-8: PQ over zero vectors (empty codebooks -> zero neighbors)
    # and CCNet bucketing over an empty corpus (no cutoffs, no rows)
    ("ann_pq_adc", 0),
    ("text_ccnet_quality_buckets", 0),
    ("embedding_pca_power", 0),
    # late-r9 analytics wave: behavioral rollups and stats collapse to
    # zero rows; the DQ suite keeps its six verdict rows (metrics over
    # an empty table are well-defined NULL/zero, never a crash); the
    # mixture plan has no sources; k-core peels everything
    ("events_retention_cohorts", 0),
    ("events_markov_transitions", 0),
    ("rfm_customer_segments", 0),
    ("dq_constraint_suite", 6),
    ("resample_daily_interpolate", 0),
    ("ab_test_welch", 0),
    ("text_word_pmi", 0),
    ("survival_kaplan_meier", 0),
    ("assoc_mi_chi2", 1),  # scalar agg: one row of nulls/zeros
    ("window_moving_median", 0),
    ("window_moving_distinct", 0),
    ("pareto_contribution_8020", 0),
    ("phrase_search_positional", 0),
    ("profile_frequent_values", 0),
    ("agg_linear_regression", 0),
    ("vocab_oov_rate", 0),
    ("mixture_sampling_plan", 0),
    ("bigram_lm_kneser_ney", 0),
    ("attribution_last_touch", 0),
    ("agg_exact_mode", 0),
    ("split_kfold_stratified", 0),
    ("dq_benford_digits", 0),
    ("ltv_time_decay", 0),
    ("timeseries_rolling_zscore", 0),
    ("basket_association_rules", 0),
    ("timeseries_holt_linear", 0),
    ("simjoin_prefix_jaccard", 0),
    ("graph_kcore", 0),
    ("ann_pq_rerank", 0),
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        df = load_table(spark, sf_dir, t).limit(0)
        df.coalesce(1).write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize("name,expected", _FAMILY_QUERIES)
def test_queries_survive_empty_tables(spark, empty_sf_dir, name, expected):
    from etl_gcp_function_tmabrasil_spark.queries import all_queries

    df = all_queries()[name](spark, empty_sf_dir)
    rows = df.collect()
    if expected is not None:
        assert len(rows) == expected, f"{name}: {len(rows)} rows on empty input"


def test_arrow_l2_batches_empty_vectors():
    """The mapInArrow norm body must survive the reduceat edge cases a
    naive guard misses (code-review r6, verified crashes): a TRAILING
    empty vector (start index == len(values) → IndexError) and an
    all-empty batch (mask/segment shape mismatch → ValueError). Empty
    vectors yield l2 = 0."""
    import math

    import pyarrow as pa

    from etl_gcp_function_tmabrasil_spark.queries.tfidf_udf import (
        _arrow_l2_batches,
    )

    def run(rows):
        batch = pa.RecordBatch.from_arrays(
            [
                pa.array(list(range(len(rows))), type=pa.int64()),
                pa.array(rows, type=pa.list_(pa.float64())),
            ],
            ["vec_id", "e"],
        )
        (out,) = list(_arrow_l2_batches([batch]))
        return out.column("l2").to_pylist()

    assert run([[3.0, 4.0], []]) == [5.0, 0.0]          # trailing empty
    assert run([[], [3.0, 4.0]]) == [0.0, 5.0]          # leading empty
    assert run([[], []]) == [0.0, 0.0]                   # all empty
    got = run([[1.0], [], [2.0, 2.0, 1.0]])              # interior empty
    assert got[0] == 1.0 and got[1] == 0.0 and math.isclose(got[2], 3.0)


def test_arrow_l2_batches_sliced_list_array():
    """A sliced ListArray's .values is the ENTIRE child array (advice
    r6, reproduced: the last row's norm absorbed the sliced-off tail,
    18.47 instead of sqrt(41)). The body must truncate the flattened
    buffer at the last offset before squaring."""
    import math

    import pyarrow as pa

    from etl_gcp_function_tmabrasil_spark.queries.tfidf_udf import (
        _arrow_l2_batches,
    )

    full = pa.array(
        [[1.0, 2.0], [3.0], [4.0, 5.0], [10.0, 10.0, 10.0]],
        type=pa.list_(pa.float64()),
    )

    def run(sliced):
        ids = pa.array(list(range(len(sliced))), type=pa.int64())
        batch = pa.RecordBatch.from_arrays([ids, sliced], ["vec_id", "e"])
        (out,) = list(_arrow_l2_batches([batch]))
        return out.column("l2").to_pylist()

    # tail sliced off: child keeps the trailing 10s
    got = run(full.slice(0, 3))
    want = [math.sqrt(5.0), 3.0, math.sqrt(41.0)]
    assert all(math.isclose(g, w) for g, w in zip(got, want)), (got, want)
    # head AND tail sliced off: absolute offsets must still resolve
    got = run(full.slice(1, 2))
    want = [3.0, math.sqrt(41.0)]
    assert all(math.isclose(g, w) for g, w in zip(got, want)), (got, want)
    # slice ending in an empty row keeps l2 = 0 under truncation
    with_empty = pa.array(
        [[1.0], [], [9.0, 9.0]], type=pa.list_(pa.float64())
    )
    assert run(with_empty.slice(0, 2)) == [1.0, 0.0]


#: round-10 wave over empty tables (same contract: empty or a
#: well-defined scalar/grid — never a throw). Winnowing/KMV/seq/PSI
#: families each exercise a distinct empty-input hazard: an empty
#: window frame, a K-undersized sketch, an empty regex corpus, an
#: all-empty bin grid, zero-weight medians, empty strata.
_R10_EMPTY = [
    ("dedup_winnowing_pairs", 0),
    # the merged-union row is a GLOBAL agg: one well-defined row over
    # empty input (exact 0, est 0, bound false) — same class as q6
    ("agg_kmv_distinct", 1),
    ("seq_pattern_match", 0),
    ("timeseries_seasonal_decompose", 0),
    ("agg_weighted_median", 0),
    ("corpus_divergence_js", 0),
    ("quantile_normalize_profile", 0),
    ("agg_winsorized_mean", 0),
    ("drift_psi", 0),
    ("profile_key_skew", 0),
    ("sample_neyman_allocation", 0),
]


@pytest.mark.parametrize("name,expected", _R10_EMPTY)
def test_r10_wave_empty_inputs(spark, empty_sf_dir, name, expected):
    from etl_gcp_function_tmabrasil_spark.queries import all_queries

    df = all_queries()[name](spark, empty_sf_dir)
    assert df.count() == expected, name


#: round-11 wave over empty tables (same contract). The eager gates
#: (snapshot delete/replace, exchange-reuse, BFS, CMS) build fixtures /
#: run driver loops at construction and are covered by their own unit
#: tests; the lazy wave must keep the empty-in/empty-or-scalar-out
#: contract: empty rank windows, an empty OLS head (one all-null
#: scalar row, the q6 class), an empty canonical-URL corpus, empty
#: DSIR domains (ln of smoothed uniform ratios over zero counts),
#: an empty NFC profile, and empty MMR pools through four unrolled
#: greedy steps.
_R11_EMPTY = [
    ("agg_spearman_corr", 0),
    ("timeseries_acf", 0),
    ("vocab_zipf_fit", 1),
    ("dedup_url_canonical", 0),
    ("sample_importance_dsir", 0),
    ("text_unicode_nfc_profile", 0),
    ("knn_mmr_rerank", 0),
    ("funnel_time_to_convert", 0),
    ("stats_bootstrap_ci", 0),
    # multimodal_phash_dedup reads the fixed synthetic media table
    # (sf-independent) — covered by its byte-reference test instead
]


@pytest.mark.parametrize("name,expected", _R11_EMPTY)
def test_r11_wave_empty_inputs(spark, empty_sf_dir, name, expected):
    from etl_gcp_function_tmabrasil_spark.queries import all_queries

    df = all_queries()[name](spark, empty_sf_dir)
    assert df.count() == expected, name
