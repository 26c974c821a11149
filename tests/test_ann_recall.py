"""ANN quality invariants (SURVEY.md §5.2: "self-checking invariants,
e.g., LSH recall vs brute-force"): the approximate paths must agree with
the exact brute-force top-k on a meaningful fraction of queries.
"""

from __future__ import annotations

from etl_gcp_function_tmabrasil_spark.queries.similarity import (
    TOP_K,
    ann_ivf_cosine,
    knn_bruteforce_cosine,
)


def _topk_sets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    exact = _topk_sets(knn_bruteforce_cosine(spark, sf_dir))
    approx = _topk_sets(ann_ivf_cosine(spark, sf_dir))
    assert set(approx) == set(exact), "every query must be answered"
    hits = sum(len(exact[q] & approx[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    recall = hits / total
    # N_PROBE/N_CELLS = 1/4 of cells scanned; on random-ish vectors the
    # nearest neighbors concentrate in the nearest cells, so recall must
    # beat the blind-scan fraction by a wide margin.
    assert recall >= 0.5, f"IVF recall {recall:.2f} below floor"
    for q, members in approx.items():
        assert len(members) == TOP_K
