"""Quality gates for the MLlib LSH operators (no DuckDB oracle — MLlib
hash families aren't SQL-reproducible): they must recover the pairs the
exact operators find."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_gcp_function_tmabrasil_spark.queries.dedup_approx import (
    JACCARD_THRESHOLD,
    dedup_ngram_jaccard,
)
from etl_gcp_function_tmabrasil_spark.queries.mllib_lsh import (
    ann_brp_mllib,
    dedup_minhash_mllib,
)
from etl_gcp_function_tmabrasil_spark.queries.similarity import (
    knn_bruteforce_cosine,
)


def test_mllib_minhash_finds_high_similarity_pairs(spark, sf_dir):
    """Every exact near-dup pair (token-level Jaccard >= threshold,
    blocked) must appear in the MLlib candidate pairs (unblocked, so a
    superset modulo LSH misses; at 8 hash tables misses on >=0.5
    similarity are vanishingly rare on this corpus — pin zero)."""
    mllib_pairs = {
        (r.doc1, r.doc2) for r in dedup_minhash_mllib(spark, sf_dir).collect()
    }
    exact = dedup_ngram_jaccard(spark, sf_dir)
    # ngram operator uses 3-shingles; MLlib path hashes unigram tokens.
    # Compare on pairs whose *shingle* jaccard is very high — those have
    # high token jaccard too and must be found.
    strong = {
        (r.doc1, r.doc2)
        for r in exact.filter(F.col("jaccard") >= 0.9).collect()
    }
    missed = strong - mllib_pairs
    assert not missed, f"MLlib MinHashLSH missed {len(missed)} strong pairs: {sorted(missed)[:5]}"
    assert len(mllib_pairs) > 0


def test_mllib_brp_neighbors_close_to_bruteforce(spark, sf_dir):
    """For queries answered by both, the BRP nearest bucketmate must be
    within the brute-force top-3 for at least half the queries (euclid
    vs cosine rankings differ, LSH is approximate — this is a sanity
    floor, not a tight bound)."""
    brute = {}
    for r in knn_bruteforce_cosine(spark, sf_dir).collect():
        brute.setdefault(r.query_id, set()).add(r.neighbor_id)
    brp = {
        r.query_id: r.neighbor_id
        for r in ann_brp_mllib(spark, sf_dir).collect()
        if r.query_id in brute
    }
    assert brp, "BRP returned no neighbors for the brute-force query set"
    hits = sum(1 for q, n in brp.items() if n in brute[q])
    assert hits / len(brp) >= 0.5, f"BRP agreement {hits}/{len(brp)} below floor"
