"""Quality gates for the MLlib LSH operators. The gate queries emit
exact-verifiable outputs (guaranteed-recall subsets — see mllib_lsh.py);
these tests gate the probabilistic part the oracle can't: near-dup /
near-neighbor recall of the raw candidate surface vs the exact
operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_gcp_function_tmabrasil_spark.queries.dedup_approx import (
    dedup_ngram_jaccard,
)
from etl_gcp_function_tmabrasil_spark.queries.mllib_lsh import (
    ann_brp_mllib,
    brp_candidate_pairs,
    dedup_minhash_mllib,
    minhash_candidate_pairs,
)
from etl_gcp_function_tmabrasil_spark.queries.similarity import (
    knn_bruteforce_cosine,
)


def test_mllib_minhash_finds_high_similarity_pairs(spark, sf_dir):
    """Every exact near-dup pair (shingle Jaccard >= 0.9) must appear in
    the MLlib candidate pairs (at 8 hash tables misses on >=0.5
    similarity are vanishingly rare on this corpus — pin zero)."""
    mllib_pairs = {
        (r.doc1, r.doc2)
        for r in minhash_candidate_pairs(spark, sf_dir).select("doc1", "doc2").collect()
    }
    exact = dedup_ngram_jaccard(spark, sf_dir)
    strong = {
        (r.doc1, r.doc2)
        for r in exact.filter(F.col("jaccard") >= 0.9).collect()
    }
    missed = strong - mllib_pairs
    assert not missed, f"MLlib MinHashLSH missed {len(missed)} strong pairs: {sorted(missed)[:5]}"
    assert len(mllib_pairs) > 0


def test_mllib_minhash_gate_query_equals_exact_dup_sets(spark, sf_dir):
    """The gate query's guaranteed-recall claim, checked from first
    principles: its output must equal the identical-token-set pair list
    computed without any MinHash."""
    got = {
        (r.doc1, r.doc2) for r in dedup_minhash_mllib(spark, sf_dir).collect()
    }
    from etl_gcp_function_tmabrasil_spark.catalog import load_table

    t = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.array_sort(F.array_distinct(F.split("text", " "))).alias("toks")
    )
    a, b = t.alias("a"), t.alias("b")
    want = {
        (r.doc1, r.doc2)
        for r in a.join(
            b,
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.toks") == F.col("b.toks")),
        )
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .collect()
    }
    assert got == want
    assert want, "corpus has no identical-token-set pairs — gate query is vacuous"


def test_mllib_brp_neighbors_close_to_bruteforce(spark, sf_dir):
    """For queries answered by both, the BRP nearest bucketmate must be
    within the brute-force top-3 for at least half the queries (euclid
    vs cosine rankings differ, LSH is approximate — this is a sanity
    floor, not a tight bound)."""
    brute = {}
    for r in knn_bruteforce_cosine(spark, sf_dir).collect():
        brute.setdefault(r.query_id, set()).add(r.neighbor_id)
    pairs = brp_candidate_pairs(spark, sf_dir)
    nearest = (
        pairs.filter(F.col("datasetA.vec_id") != F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("query_id"),
            F.col("datasetB.vec_id").alias("neighbor_id"),
            "dist",
        )
        .groupBy("query_id")
        .agg(
            F.min_by(F.col("neighbor_id"), F.struct("dist", "neighbor_id")).alias(
                "neighbor_id"
            )
        )
    )
    brp = {
        r.query_id: r.neighbor_id
        for r in nearest.collect()
        if r.query_id in brute
    }
    assert brp, "BRP returned no neighbors for the brute-force query set"
    hits = sum(1 for q, n in brp.items() if n in brute[q])
    assert hits / len(brp) >= 0.5, f"BRP agreement {hits}/{len(brp)} below floor"


def test_mllib_brp_gate_query_invariants(spark, sf_dir):
    """The gate query's one-row summary, re-derived: self-pair recall
    must be total and the reported distances must agree with direct
    recomputation."""
    row = ann_brp_mllib(spark, sf_dir).collect()[0]
    assert row.n_self_pairs == row.n_vectors
    assert row.all_dist_match
    assert row.n_exact_dup_pairs >= 0
