#!/usr/bin/env python3
"""Emit the OPTIMIZATION_r15.md per-query checklist table: every bench.py
entry (headline + extended + streaming) with its r14 clean-host close-out
number, the r15 close-out number, and its r15 disposition. Run after the
close-out bench has refreshed BENCH_LOCAL.json."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

# r15 disposition per query. Anything not listed is "fast": at or under
# ~1 s at sf0.1, inside the measured per-session noise band — examined at
# the profile level (sorted bench listing) and left alone.
D = {
    # wave 1
    "stats_bootstrap_ci": "optimized w1: compute-spread the x64 Poisson explode",
    "text_langid_hashed_ngram": "optimized w1: shared persisted gram rollup + keyed spread; w7 rejection: vocab-hash variant slower",
    "dedup_winnowing_pairs": "optimized w1+w5: keyed spread reused by the per-doc window; persisted post-stoplist fingerprints",
    "dedup_winnowing_containment": "optimized w1+w5: same shared front",
    # wave 2
    "knn_mmr_rerank": "optimized w2: greedy ladder -> one row-local aggregate() fold (441 Exchanges gone)",
    "embedding_pca_power": "optimized w2: power iterations fold row-locally, DECIMAL(30,12) accumulators",
    "funnel_time_to_convert": "optimized w2: persist the rollup banded quantiles re-scan",
    "text_ccnet_quality_buckets": "optimized w2: persist the per-lang score rollup",
    "simjoin_prefix_jaccard": "optimized w2+w4: split() hoisted out of HOF; prefix folds row-locally; remaining cost is candidate-verify volume (inherent)",
    "agg_spearman_corr": "optimized w2+w4: spread scan; mid-ranks rebuilt in (flag, band) windows vs broadcast offsets",
    # wave 3
    "agg_robust_outliers": "optimized w3 (banded_exact_quantiles fold: plan 258->120 Exchanges); re-examined w6: med->MAD two-pass is inherent, fully persisted",
    "agg_correlation_matrix": "optimized w3: compute-spread the 14-decimal-accumulator scan",
    "sql_recursive_cte_index": "optimized w3: coalesce(1) persisted day rollup + broadcast-pinned recursion side; remaining cost is level-sequential recursion scheduling (~0.13 s/level, inherent)",
    # wave 4
    "profile_key_skew": "optimized w4: windows over the count HISTOGRAM, not the key table (100 TB single-task-sort hazard removed)",
    "agg_weighted_median": "optimized w4: banded_weighted_median replaces the whole-table RANGE window",
    "pareto_frontier_orders": "optimized w4: persist the mapInPandas local-skyline prune",
    "sample_importance_dsir": "optimized w4: compute-spread + persist the 64-row bucket histogram",
    "dedup_url_canonical": "optimized w4: compute-spread the 7-regex scan",
    # wave 5
    "stream_tumbling_e2e": "optimized w5: one availableNow data batch (trigger sizing) amortizes state-store/checkpoint/sink commits",
    "link_fellegi_sunter": "optimized w5: one stacked (field,value) u-pass (was 6 subtrees); persisted FastSS expansion",
    # wave 6
    "ann_lsh_multiband": "optimized w6: persist the double-consumed (vec_id, band, bkt) banding (8 scans -> 1)",
    "text_token_diversity": "optimized w6: compute-spread the per-doc sort+fold (isolated 0.476->0.244)",
    "graph_label_propagation": "optimized w6: fixed 3-round unroll made LAZY (per-round localCheckpoint was eager); new bench entry",
    "bpe_merge_pairs": "examined w6, REJECTED spread: 0.248 clean without vs ~0.6-1.0 with",
    "vocab_doc_frequency": "examined w6, REJECTED spread: 0.297 vs ~0.65-0.83",
    "text_word_pmi": "examined w6, REJECTED spread: A/B 1.135/1.272 vs 1.419/1.564",
    "model_calibration_brier": "examined w6: baseline guard trip does not reproduce (construct ~0.5 s); managed-persist shape already one corpus scan",
    "multimodal_phash_dedup": "examined w6: fixed 96-row fixture + mapInPandas, already optimal",
    "timeseries_cusum": "examined w6: ordered-fold shape with spread, already optimal",
    "dedup_corpus_lines": "examined w6: digest-keyed count + broadcast dup join, already optimal",
    # wave 7
    "quantile_normalize_profile": "optimized w7: per-source ntile window (<=5 tasks at any scale) -> banded rank + exact NTILE arithmetic (1.253->1.000)",
    "window_ntile": "w7 operator fold: one broadcast map instead of window+2 broadcasts (neutral locally, fewer exchanges)",
    "window_cume_dist": "w7 operator fold (neutral locally)",
    "dedup_sorted_neighborhood": "w7 operator fold (neutral-positive)",
    "sample_balanced_classes": "w7 operator fold (0.534->0.494)",
    # examined, left alone with measurements
    "timeseries_acf": "examined w5: persisting the events projection is SLOWER (1.11->1.36); per-type window is the semantic floor",
    "pagerank_dedup_graph": "examined w5: plan already ReusedExchange-dedupes the simhash side; rank frame broadcasts",
    "fuzzy_name_match": "examined w6: FastSS persist A/B within noise (1.825/1.923 plain vs 1.924/2.075); kept for link's two legs",
    "udf_arrow_vector_norms": "examined w6: isolated 0.448 == r14 clean 0.44 (bench swings are session noise)",
    "embedding_gram_matrix": "examined w6: numpy-partials/exact-SQL-combine already the canonical shape",
    "knn_radius_cells": "examined (r14-optimized): isolated 0.65-0.75, prune exact",
    "decontaminate_ngram": "examined: single-pass + spread already (r7-era fix)",
    "rfm_customer_segments": "examined: one unpivoted banded-quantile pass, persisted per-cust rollup; benefits from the w3 fold",
    "conformal_interval_split": "examined: inline banded-rank pattern, benefits from w3; 0.59-0.67 isolated",
    "drift_psi": "examined: per-type RANGE cumulative over the reference half; a banded type-1-decile rewrite is the documented next step if it ever dominates (0.9-1.2 s today)",
}

FAST = "fast — noise floor, left alone (see legend)"


def main() -> None:
    # current = the working tree's BENCH_LOCAL.json (the r15 close-out
    # record once the round closes); the r14 baseline numbers come from
    # the pre-optimization rev (overridable: first CLI arg).
    import subprocess
    import sys

    baseline_rev = sys.argv[1] if len(sys.argv) > 1 else "015f703"
    current = json.load(open(os.path.join(REPO, "BENCH_LOCAL.json")))
    r14_doc = json.loads(
        subprocess.check_output(
            ["git", "-C", REPO, "show", f"{baseline_rev}:BENCH_LOCAL.json"]
        )
    )
    q14 = {**r14_doc.get("queries", {}), **r14_doc.get("queries_extended", {})}
    q15 = {**current.get("queries", {}), **current.get("queries_extended", {})}
    names = bench.HEADLINE + ["stream_tumbling_e2e"] + bench.EXTENDED
    print("| query | r14 close-out (s) | r15 close-out (s) | r15 disposition |")
    print("|---|---|---|---|")
    for n in names:
        a = q14.get(n)
        b = q15.get(n)
        fa = f"{a:.3f}" if isinstance(a, (int, float)) else "—"
        fb = f"{b:.3f}" if isinstance(b, (int, float)) else "—"
        print(f"| {n} | {fa} | {fb} | {D.get(n, FAST)} |")


if __name__ == "__main__":
    main()
