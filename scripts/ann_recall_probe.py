#!/usr/bin/env python3
"""ANN recall@5 probe (r8 verdict item 7; clustered fixture + IVF-PQ
fix r12, per r11 verdict item 4): put comparable QUALITY numbers next
to the approximate-nearest-neighbor paths' comparable scale stories.

Two corpora, measured identically:

- RANDOM (sf1): the 20k-vector /tmp/spark_graft_sf1 corpus
  (scripts/sf1_scale_probe.generate). Unstructured i.i.d. Gaussian
  vectors are the WORST CASE for every banding/quantization scheme —
  true neighbors sit at cosine ≈ 0.3 and nothing co-buckets them —
  so these numbers are an honest floor, not a quality target.
- CLUSTERED (planted duplicates): 20k vectors in tight Gaussian
  clusters of size 6 (sigma 0.05 around unit-variance centers), the
  near-duplicate-retrieval shape ANN actually serves in a training
  -data pipeline. A query's true top-5 is its 5 planted mates;
  recall here measures whether the index MACHINERY (cells, codes,
  buckets) finds them. Within-cluster ORDERING is out of scope for
  code-only ADC by construction (all mates share codes; exact
  re-rank is the production answer — measured too).

Methods, k = 5, queries = vec_id < 8:

- IVF (cell probe, N_PROBE/N_CELLS = 4/16): `ann_ivf_cosine` with
  TOP_K patched to 5, vs the engine's exact cosine kNN;
- LSH (12 random-hyperplane sign bits): the engine's bucketing with
  the within-bucket ranking widened from the gate's rank-1 to top-5;
- PQ-ADC (4x16-dim subspaces, 8-centroid codebooks): `pq_topk` vs
  exact squared-L2 top-5 (PQ approximates L2, not cosine);
- PQ + exact re-rank: `ann_pq_rerank`, same ground truth;
- IVF-PQ (IVFADC): `ann_ivfpq`, same ground truth. r12 fix: PQ
  codebooks now TRAIN on rows with vec_id >= IVFPQ_CELLS — coarse
  exemplars' residuals are exactly zero, and the old all-rows
  k-lowest-vec_id init started every centroid at the zero vector and
  collapsed the codebook to one code (the r11 recall-0.0 root cause).

Recall@5 = |approx top-5 ∩ exact top-5| / 5, averaged over the 8
queries. Writes ANN_RECALL_SF1.json (random) and
ANN_RECALL_CLUSTERED.json (planted) and prints one JSON line each.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

N_Q = 8
K = 5

CLUSTERED_DIR = "/tmp/spark_graft_ann_clustered"
CLUSTER_SIZE = 6  # query + 5 planted mates = exactly the top-5
N_CLUSTERS = 3333  # ~20k vectors, same scale as the sf1 corpus
SIGMA = 0.05


def build_clustered(
    dirp: str = CLUSTERED_DIR,
    n_clusters: int = N_CLUSTERS,
    per: int = CLUSTER_SIZE,
    dim: int = 64,
    sigma: float = SIGMA,
    seed: int = 7,
) -> int:
    """Planted-duplicate corpus: `n_clusters` unit-variance Gaussian
    centers, `per` members each at N(center, sigma^2 I), vec_ids
    shuffled so the low ids (queries + IVF exemplars) span clusters.
    Same parquet schema as the driver's embeddings table."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dirp, exist_ok=True)
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim)
    vecs = (
        centers[:, None, :] + sigma * rng.randn(n_clusters, per, dim)
    ).reshape(-1, dim)
    n = len(vecs)
    perm = rng.permutation(n)
    vecs = vecs[perm]
    labels = np.repeat(np.arange(n_clusters), per)[perm]
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int32)),
        }
    )
    pq.write_table(t, os.path.join(dirp, "embeddings.parquet"))
    return n


def _topk(df, qcol, ncol) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r[qcol], set()).add(r[ncol])
    return out


def _recall(approx: dict[int, set[int]], exact: dict[int, set[int]]) -> float:
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    return round(hits / sum(len(v) for v in exact.values()), 4)


def measure(spark, data_dir: str) -> dict:
    """Run every ANN path over `data_dir`'s embeddings at k=K for the
    N_Q lowest vec_ids and score recall@K against exact ground truth
    (engine kNN for cosine methods, numpy L2 for the PQ family)."""
    from pyspark.sql import Window as W, functions as F

    from etl_gcp_function_tmabrasil_spark.queries import similarity as sim

    saved = (sim.TOP_K, sim.PQ_QUERIES)
    sim.TOP_K, sim.PQ_QUERIES = K, N_Q
    try:
        exact_cos = _topk(
            sim.knn_bruteforce_cosine(spark, data_dir),
            "query_id",
            "neighbor_id",
        )
        ivf = _topk(
            sim.ann_ivf_cosine(spark, data_dir), "query_id", "neighbor_id"
        )
        pq = _topk(sim.ann_pq_adc(spark, data_dir), "query_id", "vec_id")
        pq_rerank = _topk(
            sim.ann_pq_rerank(spark, data_dir), "query_id", "vec_id"
        )
        ivfpq = _topk(sim.ann_ivfpq(spark, data_dir), "query_id", "vec_id")
    finally:
        sim.TOP_K, sim.PQ_QUERIES = saved

    # LSH: the engine's buckets + scoring join, rank filter widened to K
    emb = sim._with_norm(
        sim.load_table(spark, data_dir, "embeddings", rebalance=True),
        "vec_id",
    )
    bucket = None
    for i, p in enumerate(sim._hyperplanes()):
        lit = F.array(*[F.lit(v) for v in p])
        bit = F.when(
            F.round(sim._dot(F.col("e"), lit), 6) > 0, F.lit(2**i)
        ).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    b = emb.select("vec_id", "e", "nrm", bucket.alias("bucket"))
    x, y = b.filter(F.col("vec_id") < N_Q).alias("x"), b.alias("y")
    cos = sim._dot(F.col("x.e"), F.col("y.e")) / (
        F.col("x.nrm") * F.col("y.nrm")
    )
    scored = x.join(
        y,
        (F.col("x.bucket") == F.col("y.bucket"))
        & (F.col("x.vec_id") != F.col("y.vec_id")),
    ).select(
        F.col("x.vec_id").alias("query_id"),
        F.col("y.vec_id").alias("neighbor_id"),
        F.round(cos, 4).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    lsh = _topk(
        scored.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= K
        ),
        "query_id",
        "neighbor_id",
    )

    # multi-band LSH (r12): the engine's 4x8-bit OR'd tables with the
    # rank-1 filter widened to K — same candidates, same scoring join
    mb = sim._mb_bands(emb)
    mx, my = mb.alias("x"), mb.alias("y")
    mb_cand = (
        mx.filter(F.col("x.vec_id") < N_Q)
        .join(
            my,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bkt") == F.col("y.bkt"))
            & (F.col("x.vec_id") != F.col("y.vec_id")),
        )
        .select(
            F.col("x.vec_id").alias("query_id"),
            F.col("y.vec_id").alias("neighbor_id"),
            F.round(
                sim._dot(F.col("x.e"), F.col("y.e"))
                / (F.col("x.nrm") * F.col("y.nrm")),
                4,
            ).alias("cosine"),
        )
        .distinct()
    )
    mb_top = _topk(
        mb_cand.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= K
        ),
        "query_id",
        "neighbor_id",
    )

    # exact L2 ground truth for the PQ family (numpy, probe-side)
    import numpy as np

    rows = (
        sim.load_table(spark, data_dir, "embeddings")
        .select("vec_id", sim._as_double(F.col("embedding")).alias("e"))
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.e for r in rows])
    exact_l2: dict[int, set[int]] = {}
    for q in range(N_Q):
        qi = int(np.where(ids == q)[0][0])
        d = ((mat - mat[qi]) ** 2).sum(axis=1)
        order = np.lexsort((ids, d))
        top = [int(ids[j]) for j in order if ids[j] != q][:K]
        exact_l2[q] = set(top)

    # LSH answers only within-bucket: queries may return < K mates
    lsh_answered = round(sum(len(v) for v in lsh.values()) / (N_Q * K), 4)
    return {
        "n_vectors": int(len(ids)),
        "k": K,
        "n_queries": N_Q,
        "recall_at_5": {
            "ivf_vs_exact_cosine": _recall(ivf, exact_cos),
            "lsh_vs_exact_cosine": _recall(lsh, exact_cos),
            "lsh_multiband_vs_exact_cosine": _recall(mb_top, exact_cos),
            "pq_adc_vs_exact_l2": _recall(pq, exact_l2),
            "pq_rerank_vs_exact_l2": _recall(pq_rerank, exact_l2),
            "ivfpq_vs_exact_l2": _recall(ivfpq, exact_l2),
        },
        "lsh_candidates_returned_frac": lsh_answered,
    }


def main() -> None:
    from sf1_scale_probe import SF1, generate

    if not os.path.exists(os.path.join(SF1, "embeddings.parquet")):
        generate()
    if not os.path.exists(os.path.join(CLUSTERED_DIR, "embeddings.parquet")):
        build_clustered()

    from etl_gcp_function_tmabrasil_spark.session import get_spark

    spark = get_spark(app_name="ann_recall_probe")

    random_out = {"sf": 1.0, "corpus": "random_iid_gaussian"}
    random_out.update(measure(spark, SF1))
    with open(os.path.join(REPO, "ANN_RECALL_SF1.json"), "w") as fh:
        json.dump(random_out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(random_out))

    clustered_out = {
        "corpus": "planted_clusters",
        "cluster_size": CLUSTER_SIZE,
        "sigma": SIGMA,
    }
    clustered_out.update(measure(spark, CLUSTERED_DIR))
    with open(os.path.join(REPO, "ANN_RECALL_CLUSTERED.json"), "w") as fh:
        json.dump(clustered_out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(clustered_out))
    spark.stop()


if __name__ == "__main__":
    main()
