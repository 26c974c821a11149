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


def test_cosine_dedup_banding_finds_planted_pairs(spark):
    """The driver corpus has no cosine-0.95 pairs (max ~0.51), so the
    banded-LSH dedup is exercised on planted near-dups: perturbed copies
    at cosine ≈ 0.999 must all surface through the band join, and
    nothing below threshold may appear (exact verify ⇒ precision 1)."""
    import numpy as np
    from pyspark.sql import functions as F

    from etl_gcp_function_tmabrasil_spark.queries.similarity import (
        DIM,
        cosine_dedup_candidates,
    )

    rng = np.random.RandomState(7)
    base = rng.randn(40, DIM)
    rows = [(i, [float(v) for v in base[i]]) for i in range(40)]
    planted = set()
    for k in range(5):  # 5 near-dup copies of vectors 0..4
        dup = base[k] + 0.02 * rng.randn(DIM)
        rows.append((100 + k, [float(v) for v in dup]))
        planted.add((k, 100 + k))
    df = spark.createDataFrame(rows, "vec_id: long, e: array<double>")
    from etl_gcp_function_tmabrasil_spark.functions.vector import l2norm

    emb = df.select("vec_id", "e", l2norm(F.col("e")).alias("nrm"))
    got = {(r.vec1, r.vec2) for r in cosine_dedup_candidates(emb).collect()}
    assert planted <= got, f"planted near-dups missed: {planted - got}"
    extras = got - planted
    assert not extras, f"sub-threshold pairs leaked (verify broken): {extras}"


def test_cosine_dedup_plan_is_band_equi_join(spark, sf_dir):
    from etl_gcp_function_tmabrasil_spark.queries.similarity import (
        embedding_cosine_dedup,
    )

    plan = (
        embedding_cosine_dedup(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, (
        "dedup degenerated to an all-pairs join"
    )
    assert "band_val" in plan, "candidate join not keyed on LSH band"


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
