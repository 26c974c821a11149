#!/usr/bin/env python3
"""One-shot sf1 scale probe (round-5 verdict item): generate a 10×-sf0.1
dataset, then (a) re-run the band/bucket scale-invariance parity checks
against DuckDB on it and (b) time the slowest bench headliners, to
confirm the "constant stage count, data-independent machinery cost"
claims in SCALING.md off-paper.

Data generation (under /tmp/spark_graft_sf1, regenerated if absent):
- orders ×10: o_orderkey offset per copy, o_totalprice + i cents (so
  copies are not value-identical);
- customer ×10: c_custkey offset, digits of c_name rotated per copy —
  copies of one name differ at MANY positions, so the FastSS fuzzy-match
  pair structure per copy matches sf0.1 instead of exploding into
  cross-copy clone pairs;
- documents ×10: doc_id offset, letters of text rotated per copy — a
  character bijection preserves each copy's internal shingle-equality
  structure (and n_chars) while making cross-copy shingles disjoint, so
  near-dup workload grows linearly, not quadratically;
- lineitem ×10 (late r7): l_orderkey offset tracks orders' so each
  copy joins its own orders copy; embeddings ×10: per-copy array
  rotation preserves within-copy inner products;
- remaining tables (dimensions) symlinked from sf0.1.

Usage: python scripts/sf1_scale_probe.py   (from the repo root)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/spark_graft_sf1"
OFFSET = 10_000_000

SCALED = {"orders", "customer", "documents", "events", "embeddings", "lineitem"}

#: Parity at sf1 for the scale-sensitive set whose oracles stay cheap
#: at 1.5M orders / 50k docs (dedup_minhash_lsh's oracle recomputes
#: every sketch in SQL — minutes at 50k docs — so it is timed, not
#: oracle-checked, here; its parity is pinned at sf0.1 by
#: tests/test_scale_invariance.py).
PARITY = [
    "agg_percentiles",
    "agg_robust_outliers",
    "window_range_frame",
    "window_ntile",
    "window_cume_dist",
    "pack_token_budget",
    "split_train_val_test",
    # round-5 streaming/time-series additions (events scaled x10: the
    # streaming gates replay ~2M events through real checkpointed
    # availableNow runs — watermark finalization and dedup state at
    # 10x driver scale)
    "resample_daily_locf",
    "stream_tumbling_watermark",
    "stream_dedup_redelivery",
    # round-6 additions: variant parse (events x10), bucketed
    # co-located join (orders x10 vs lineitem — x10 since late r7 —
    # the bucketed write itself is the probed machinery), and the dedup decision
    # step (documents x10: components + quality-argmax, linear in
    # near-dup edges by the probe's shingle-disjoint construction)
    "json_variant_ops",
    "sink_bucketed_colocated_join",
    "dedup_cluster_representative",
    # late-r6: streaming CDC merge replaying 1M events through
    # foreachBatch upserts (measured 9.5 s end-to-end at sf1)
    "stream_cdc_merge",
    # r7: the partition-pruned merge variant — same 1M-event replay,
    # but each micro-batch rewrites only its touched key-bucket
    # partitions via per-partition staging-swap
    "stream_cdc_merge_partitioned",
    # r7: global contiguous ids at 1.5M orders — probes the
    # managed_persist materialization (the boundary-consistency fix)
    # at 10x the bench scale
    "window_global_rownum_scalable",
    # r7: C4-style corpus line dedup at 500k docs (10x)
    "dedup_corpus_lines",
    # r7: content-defined-anchor substring dedup at 500k docs (10x) —
    # probes the anchored-window sampler and the broadcast dup-set
    # join at 10x the window mass
    "dedup_repeated_substrings",
    # late-r7 wave: per-key EWMA fold over 1M events (10x history per
    # user through the row-local ordered aggregate), the z-order /
    # DPP / binaryFile source-sink gates rebuilt from 10x inputs, and
    # the outer+semi stream-stream interval joins replaying 1M events
    # of join state through real checkpointed runs (the outer gate's
    # sentinel-flush bookkeeping at 10x the eviction mass)
    "timeseries_ewma",
    "sink_zorder_layout",
    "join_dpp_partitioned",
    "scan_binaryfile_source",
    "stream_interval_join_semi",
    "stream_interval_join_outer",
    "stream_interval_join_full",
    # late-r7: two chained stateful operators carrying 1M events of
    # (day, user) state through one checkpointed query
    "stream_chained_window_distinct",
    # late-r7: the custom DataSource WRITER round trip at 1M events —
    # executor-parallel staged writes, driver commit, reader-side
    # re-parse of 1M JSONL lines
    "sink_cloudevent_writer",
    # late-r7: runtime bloom-filter injection at 6M lineitem rows
    # (the gate hard-fails if might_contain vanished from the plan)
    "join_runtime_bloom_filter",
    # late-r7: the GK approx-percentile sketch at 6M lineitem rows
    # (lineitem now scales x10 with join structure preserved) — the
    # rank-error bound is a theorem, but the 2*eps gate margin is
    # empirical; probe it at 10x too
    "agg_approx_percentile",
    # r8: AQE skew split at 10x the hot-key mass (600k lineitem rows
    # on one join key — the gate hard-fails if the executed plan lost
    # the 'skewed' AQEShuffleRead), PQ codebooks/codes/rankings at
    # 5000 vectors (per-copy rotation preserves within-copy inner
    # products, so subspace structure scales honestly), and CCNet
    # bucketing at 10x the token stream (cutoffs re-derived per lang).
    "join_skew_aqe",
    "ann_pq_adc",
    "text_ccnet_quality_buckets",
    # r8: dynamic-gap sessionization over 1M events (10x session-state
    # mass through the checkpointed run; per-event gap arithmetic).
    # This entry CAUGHT a real oracle bug on first run: the islands
    # windows ordered ties on ts alone and split 7 duplicate-ts groups
    # across sessions — all three session oracles now carry the total
    # (ts, event_id) order, and all three stay probed here.
    "stream_session_dynamic_gap",
    "stream_session_watermark",
    "window_session_batch",
    # r8: power iteration over the gram of 5000 vectors (the corpus
    # scan is the only data-sized stage; the matvecs stay 64-row)
    "embedding_pca_power",
    # r8: snapshot sink committing + time-traveling 1M events
    "sink_snapshot_time_travel",
    # r9: the tie-sensitive sweep line at 10x duplicate-ts mass (the
    # x10 copies give every user 10 identical-ts interval openings —
    # the order-invariance claim under real tie pressure), the TWA
    # lead-window fold (zero-duration tie slices must drop out
    # deterministically), the schema-versioned/stats-pruned snapshot
    # reads rebuilt from 2M events (pruning bounds are scale-relative
    # — the hard-check must still find a strict subset), and the
    # foreachBatch snapshot stream carrying 2M events through txn-
    # idempotent commits plus a manual replay.
    "interval_max_concurrency",
    "timeseries_twa",
    "sink_snapshot_stats_pruning",
    "sink_snapshot_empty_schema",
    "stream_snapshot_exactly_once",
    # late-r9 analytics wave, the tie/scale-sensitive subset: the
    # moving median's trailing frames at 10x duplicate-ts mass (the
    # total (ts, event_id) order must keep frame membership — and the
    # even-count interpolation — engine-identical), Markov lead pairs
    # under the same tie pressure, KM at 10x censoring mass with
    # duplicate durations, the interpolation spine at 10x gap
    # structure, Welch/retention/RFM/PMI/phrase/pareto/DQ/assoc/
    # profile at 10x their corpus-sized stage (RFM's banded quantiles
    # re-derive from 1.5M orders; DQ's referential anti-join walks 6M
    # lineitem rows; the phrase postings join 10x postings).
    "window_moving_median",
    "events_markov_transitions",
    "survival_kaplan_meier",
    "resample_daily_interpolate",
    "ab_test_welch",
    "events_retention_cohorts",
    "rfm_customer_segments",
    "text_word_pmi",
    "phrase_search_positional",
    "pareto_contribution_8020",
    "dq_constraint_suite",
    "assoc_mi_chi2",
    "profile_frequent_values",
    # late-r9 batches 3-4: the distinct-count frame and last-touch
    # windows under 10x duplicate-ts tie mass, KN continuation counts
    # at 10x the bigram table, OLS moment sums at 1M events, the
    # corrupt-record routing and snapshot version diff rebuilt from
    # 10x inputs (the diff's exceptAll multiset semantics at 2M rows).
    "window_moving_distinct",
    "attribution_last_touch",
    "bigram_lm_kneser_ney",
    "agg_linear_regression",
    "vocab_oov_rate",
    "mixture_sampling_plan",
    "scan_json_corrupt_records",
    "sink_snapshot_version_diff",
    # late-r9 batch 5: stratified k-fold balance at 10x per-lang doc
    # mass (the within-1 guarantee must survive the window), the MERGE
    # gate at 2M-row rewrites, the impact report's component loop at
    # 10x near-dup pairs.
    "split_kfold_stratified",
    "sink_snapshot_merge_upsert",
    "dedup_impact_report",
    "agg_exact_mode",
    "dq_benford_digits",
    # late-r9 batch 6: rolling z-score frames at 10x duplicate-ts tie
    # mass, the Holt fold vs the recursive-CTE oracle at ~6.7k-step
    # per-user histories, decayed sums and basket pairs at 10x.
    "timeseries_rolling_zscore",
    "timeseries_holt_linear",
    "ltv_time_decay",
    "basket_association_rules",
    # late-r9 batches 7-10: the EventTimeTimeout sessionizer replaying
    # 1M events of state+timeouts (the 10x duplicate-ts fixture is
    # what caught the original session-tie bug), lag-context training
    # pairs under the same tie pressure, per-day banded quantiles at
    # 10x duplicates, streak islands, gains deciles, restore/vacuum
    # interplay and the kcore peel at 10x edges.
    "stream_state_timeout_sessions",
    "seq_next_event_training",
    "timeseries_daily_percentiles",
    "events_longest_streak",
    "model_decile_lift",
    "text_keyword_trend",
    "sink_snapshot_restore",
    "sink_snapshot_vacuum",
    "graph_kcore",
    "ann_pq_rerank",
    # r10: the tie-sensitive wave at 10x duplicate mass — winnowing's
    # rightmost-min packing under hash ties, the weighted-median and
    # winsorize RANGE-frame peer pooling, ntile bins over the total
    # order, the symbol-string CEP under duplicate-ts pressure, the
    # KMV order statistics at 10x key mass, the manifest point-lookup
    # hard-checks at 10x file/row mass, seasonal decimal re-quantize
    "dedup_winnowing_pairs",
    "agg_weighted_median",
    "agg_winsorized_mean",
    "quantile_normalize_profile",
    "seq_pattern_match",
    "agg_kmv_distinct",
    "sink_snapshot_point_skipping",
    "timeseries_seasonal_decompose",
    "corpus_divergence_js",
    # r10: the streaming CEP replaying 1M events of symbol-string
    # state through checkpointed availableNow at 10x key mass
    "stream_pattern_match",
    # r10: PSI reference-decile fences at 10x duplicate-value mass;
    # the skew profiler's integer-rank order stats at 6M lineitem rows
    "drift_psi",
    "profile_key_skew",
    "sink_snapshot_time_as_of",
    "sink_snapshot_schema_merge",
    # r10: IVFADC at 10x vectors (residual codebooks + probe-restricted
    # ADC; the per-copy rotation preserves within-copy structure);
    # Neyman moments at 10x strata mass
    "ann_ivfpq",
    "sample_neyman_allocation",
    # r10: per-file NDV sketch merge at 10x file/row mass (the k-min
    # union must stay the global sketch); the containment share under
    # 10x fingerprint mass
    "sink_snapshot_ndv_stats",
    "dedup_winnowing_containment",
    # r11: the banded-rank Spearman at 6M lineitem rows (the
    # decomposition exists exactly for this scale — 2M-row groups
    # must never hit a whole-group sort), CMS guarantees at 1.5M
    # orders, the ACF lag window under 10x duplicate-ts tie mass,
    # zipf/URL/DSIR/NFC over the 10x corpus (DSIR's md5 bigram
    # histograms at ~15M features; NFC's pandas UDF at 500k docs),
    # BFS at 10x edge mass, exchange reuse re-checked on the executed
    # 6M-row plan, the copy-on-write delete/replace and z-order
    # optimize rebuilding 2M-row tables with strict-subset
    # hard-checks, complete-mode streaming replaying 1M events, and
    # the funnel quantiles at 10x converter mass.
    # (knn_mmr_rerank is timed-not-oracle-checked at sf1: its oracle
    # recomputes the brute-force pool in DuckDB lambdas — the same
    # minutes-at-50k-vectors class as knn_bruteforce_cosine, whose
    # parity likewise pins at sf0.01; multimodal_phash_dedup reads
    # the fixed 96-row synthetic media table, sf-independent.)
    "agg_spearman_corr",
    "agg_count_min_sketch",
    "timeseries_acf",
    "vocab_zipf_fit",
    "dedup_url_canonical",
    "sample_importance_dsir",
    "text_unicode_nfc_profile",
    "graph_bfs_distances",
    "plan_exchange_reuse",
    "sink_snapshot_delete_where",
    "sink_snapshot_replace_where",
    "sink_snapshot_zorder_optimize",
    "stream_complete_leaderboard",
    "funnel_time_to_convert",
    # late-r11: bootstrap weights at 64M (row, replica) pairs; the IVM
    # view maintained over 2M-row deltas
    "stats_bootstrap_ci",
    "sink_incremental_join_view",
    # r12 (verdict item 8 — the pair the r11 close-out registered after
    # c38a98b's probe ran): KMV union/intersection estimates at 10x
    # distinct-key mass; update-mode selective emissions replaying 1M
    # events through checkpointed foreachBatch
    "agg_kmv_set_algebra",
    "stream_update_mode_emissions",
    # r12 wave (cheap-oracle subset): SNM banded-rank window pairs at
    # 500k docs (2M windowed list-Jaccard verifies in the oracle), the
    # bounded LPA graph under 10x edge multiplicity, the shallow-clone
    # divergence fixture at 2M events, the clustered ratio z-test and
    # path top-k over 2M events, IVFADC-R at 20k vectors.
    # (link_fellegi_sunter and ann_lsh_multiband are timed-not-parity
    # at sf1: their oracles are the quadratic levenshtein join and a
    # 6M-pair DuckDB lambda cosine scan — the fuzzy_name_match class.)
    "dedup_sorted_neighborhood",
    "graph_label_propagation",
    "sink_snapshot_clone",
    "ab_test_ratio_delta",
    "seq_path_topk",
    "ann_ivfpq_rerank",
    # r12 late pair: hashing-trick buckets over the 10x token stream;
    # OOF fold means at 1.5M orders
    "text_feature_hashing",
    "feature_target_encode_oof",
    # r12: nearest as-of under 10x duplicate-ts tie mass (the same
    # total-order tie pressure that caught the r8 session-split bug)
    "join_asof_nearest",
    # r12: banded-rank class rebalancing at 2M events
    "sample_balanced_classes",
    # r14 wave: cumulative mSPRT windows over 2M events (10x per-day
    # moment mass), the (user, day) calibration rollup at 10x units,
    # the one-pass silhouette at 20k vectors x 16 cells, and the fsck
    # gate rebuilding its 4-commit + 3-fault fixture from 2M events
    "stats_sequential_msprt",
    "model_calibration_brier",
    "ann_silhouette_cells",
    "sink_snapshot_fsck",
    # r14 wave 2: cumulative z trajectory at 10x moment mass; the
    # binned AUC and minimax-PAV isotonic fit over 10x (user, day)
    # units (their bin tables stay <=9 rows at any scale)
    "stats_group_sequential_peto",
    "model_eval_auc_binned",
    "model_calibration_isotonic",
    # r14 wave 3: the copy-on-write MERGE gate rebuilt from 2M events
    # (update slice confined to one of four mod-keyed files at any
    # scale), the user-level SRM rollup at 10x distinct mass, and the
    # prefix-dim fidelity cross join at 20k corpus vectors
    "sink_snapshot_merge",
    "ab_test_srm_check",
    "embedding_matryoshka_fidelity",
    # r14: the U-shaped credit paths at 10x touch x conversion pair
    # mass (per-user range join; duplicate-ts tie pressure exercises
    # the total (ts, event_id) order)
    "attribution_position_based",
    # r14: the streaming MERGE profile store replaying 2M events in
    # micro-batches through read-modify-write merge_snapshot commits
    # (150k-user key space lives in the TABLE, not engine state)
    "stream_merge_snapshot_upsert",
]

#: Timed headliners (warmup + 3, min/median) at sf0.1 AND sf1.
TIMED = [
    "agg_robust_outliers",
    "fuzzy_name_match",
    "pagerank_dedup_graph",
    "dedup_minhash_lsh",
    # r9 rewrite: trigram prefix+positional filter — letter-rotated
    # copies keep cross-copy shingles disjoint, so candidates must
    # grow ~linearly (the DuckDB all-pairs oracle is quadratic and
    # stays out of PARITY at this scale; Spark-side timing is the
    # scale check here)
    "simjoin_prefix_jaccard",
    # r11: pool + pairwise + 4 unrolled greedy steps at 50k vectors
    # (timed like the other brute-force-pool vector ops)
    "knn_mmr_rerank",
    # r12: the two quadratic-oracle registrations — Spark-side timing
    # is the scale check here (their oracles pin parity at sf0.01)
    "link_fellegi_sunter",
    "ann_lsh_multiband",
]


def _rot(alpha: str, i: int) -> str:
    return alpha[i % len(alpha):] + alpha[: i % len(alpha)]


def generate() -> None:
    import duckdb

    os.makedirs(SF1, exist_ok=True)
    # idempotent re-runs after a mid-generate crash: remove any
    # partially-written scaled files before COPY
    for t in sorted(SCALED):
        f = f"{SF1}/{t}.parquet"
        if os.path.exists(f):
            os.unlink(f)
    con = duckdb.connect()
    digits = "0123456789"
    lower = "abcdefghijklmnopqrstuvwxyz"
    upper = lower.upper()
    con.execute(f"""
        COPY (
          SELECT o_orderkey + i*{OFFSET} AS o_orderkey, o_custkey,
                 o_orderstatus, o_totalprice + i*0.01 AS o_totalprice,
                 o_orderdate, o_orderpriority
          FROM '{SF01}/orders.parquet', range(10) t(i)
        ) TO '{SF1}/orders.parquet' (FORMAT PARQUET)
    """)
    cust_cases = " ".join(
        f"WHEN {i} THEN translate(c_name, '{digits}', '{_rot(digits, i)}')"
        for i in range(10)
    )
    con.execute(f"""
        COPY (
          SELECT c_custkey + i*{OFFSET} AS c_custkey,
                 CASE i {cust_cases} END AS c_name,
                 c_nationkey, c_acctbal, c_mktsegment
          FROM '{SF01}/customer.parquet', range(10) t(i)
        ) TO '{SF1}/customer.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT event_id + i*{OFFSET} AS event_id, ts, user_id,
                 event_type, value, props
          FROM '{SF01}/events.parquet', range(10) t(i)
        ) TO '{SF1}/events.parquet' (FORMAT PARQUET)
    """)
    doc_cases = " ".join(
        f"WHEN {i} THEN translate(text, '{lower}{upper}', "
        f"'{_rot(lower, i)}{_rot(upper, i)}')"
        for i in range(10)
    )
    # lineitem x10: l_orderkey offset tracks orders' offset so each
    # copy's lineitem joins its own orders copy (join structure
    # preserved); price perturbed per copy like o_totalprice.
    con.execute(f"""
        COPY (
          SELECT l_orderkey + i*{OFFSET} AS l_orderkey, l_partkey,
                 l_suppkey, l_linenumber, l_quantity,
                 l_extendedprice + i*0.01 AS l_extendedprice,
                 l_discount, l_tax, l_returnflag, l_linestatus,
                 l_shipdate
          FROM '{SF01}/lineitem.parquet', range(10) t(i)
        ) TO '{SF1}/lineitem.parquet' (FORMAT PARQUET)
    """)
    # embeddings x10: vec_id offset per copy, array ROTATED by i — a
    # coordinate permutation preserves every within-copy inner product
    # (both vectors rotate together), so each copy's cluster/cosine
    # structure matches sf0.1 while cross-copy cosines scramble.
    con.execute(f"""
        COPY (
          SELECT vec_id + i*{OFFSET} AS vec_id,
                 embedding[i+1:] || embedding[:i] AS embedding
          FROM '{SF01}/embeddings.parquet', range(10) t(i)
        ) TO '{SF1}/embeddings.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT doc_id + i*{OFFSET} AS doc_id,
                 CASE i {doc_cases} END AS text,
                 lang, source, n_chars
          FROM '{SF01}/documents.parquet', range(10) t(i)
        ) TO '{SF1}/documents.parquet' (FORMAT PARQUET)
    """)
    from etl_gcp_function_tmabrasil_spark.catalog import TABLES

    for t in TABLES:
        if t in SCALED:
            continue
        dst = f"{SF1}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF01}/{t}.parquet", dst)


def main() -> None:
    from etl_gcp_function_tmabrasil_spark.queries import all_oracle_sql, all_queries
    from etl_gcp_function_tmabrasil_spark.session import get_spark
    from oracle_check import compare, duckdb_connection

    from etl_gcp_function_tmabrasil_spark.catalog import TABLES

    # guard on EVERY expected artifact, not just the first written one:
    # a crash mid-generate() must trigger a (idempotent, overwriting)
    # re-run instead of leaving a half-built dir that fails confusingly.
    # A SCALED table present as a symlink is a previous probe version's
    # unscaled passthrough — regenerate.
    stale = any(
        not os.path.exists(f"{SF1}/{t}.parquet")
        or (t in SCALED and os.path.islink(f"{SF1}/{t}.parquet"))
        for t in TABLES
    )
    if stale:
        for t in SCALED:  # clear superseded symlinks before COPY
            f = f"{SF1}/{t}.parquet"
            if os.path.islink(f):
                os.unlink(f)
        generate()
    spark = get_spark(app_name="sf1_probe")
    qs, osql = all_queries(), all_oracle_sql()
    out: dict = {"parity_sf1": {}, "timings": {}}

    # optional argv filter: `python scripts/sf1_scale_probe.py name...`
    # probes ONLY the named PARITY rows (skipping TIMED + semdedup) —
    # for probing late registrations without a full multi-hour re-run
    only = set(sys.argv[1:])
    parity_names = [n for n in PARITY if not only or n in only]
    unknown = only - set(PARITY)
    if unknown:
        raise SystemExit(f"not in PARITY: {sorted(unknown)}")

    con = duckdb_connection(SF1)
    for name in parity_names:
        t0 = time.perf_counter()
        problems = compare(qs[name](spark, SF1), con.execute(osql[name]).fetchdf(), name)
        out["parity_sf1"][name] = {
            "ok": not problems,
            "problems": problems,
            "sec": round(time.perf_counter() - t0, 1),
        }
        print(name, out["parity_sf1"][name], flush=True)
    con.close()

    for sf_name, sf_dir in [("sf0.1", SF01), ("sf1", SF1)] if not only else []:
        for name in TIMED:
            samples = []
            for i in range(4):
                spark.catalog.clearCache()
                df = qs[name](spark, sf_dir)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                if i > 0:
                    samples.append(time.perf_counter() - t0)
            samples.sort()
            out["timings"][f"{name}@{sf_name}"] = {
                "min": round(samples[0], 3),
                "med": round(samples[len(samples) // 2], 3),
            }
            print(f"{name}@{sf_name}", out["timings"][f"{name}@{sf_name}"], flush=True)

    # SemDeDup scales by GROWING k with the corpus (its documented
    # contract — SCALING.md "Semantic dedup"): at sf1 (10x vectors,
    # rotation-scaled so every copy keeps sf0.1's cluster structure)
    # probe with k=80 so per-cell membership — and with it the
    # within-cell pair count — stays at the sf0.1 level. Runtime
    # should grow ~linearly in N; the registered gate's fixed k=8
    # would instead grow the pair join ~100x, which is exactly the
    # misconfiguration the k-contract exists to rule out.
    if only:
        print(json.dumps(out))
        spark.stop()
        return

    from pyspark.sql import functions as F

    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.functions.vector import as_double_array
    from etl_gcp_function_tmabrasil_spark.queries.similarity import semdedup_drop_set

    for sf_name, sf_dir, k in [("sf0.1", SF01, 8), ("sf1", SF1, 80)]:
        samples = []
        for i in range(4):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            emb = load_table(spark, sf_dir, "embeddings", rebalance=True).select(
                "vec_id", as_double_array(F.col("embedding")).alias("e")
            )
            semdedup_drop_set(emb, k=k).write.format("noop").mode(
                "overwrite"
            ).save()
            if i > 0:
                samples.append(time.perf_counter() - t0)
        samples.sort()
        key = f"dedup_semantic_semdedup[k={k}]@{sf_name}"
        out["timings"][key] = {
            "min": round(samples[0], 3),
            "med": round(samples[len(samples) // 2], 3),
        }
        print(key, out["timings"][key], flush=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
