"""Distributed k-means over an embedding column — the codebook trainer
behind the IVF index (queries/similarity.ann_ivf_cosine uses its first-N
stand-in; this is the real training loop), expressed as the iterative
DataFrame pattern the engine uses for all fixed-point algorithms
(dedup_approx.dedup_components): per-iteration joins + aggregations,
`localCheckpoint` to cut lineage, no driver-side collect of data rows.

Per iteration:
1. assignment — corpus × broadcast centroids, per-row argmin of squared
   L2 distance via `min_by` (partial+final agg, no window sort);
2. update — posexplode vectors to (cell, dim, v), per-(cell, dim) mean
   (partial agg; DIM-bounded explode), reassemble each centroid with
   array_agg sorted by dim (64 elements per group — bounded).

Determinism: init = the K lowest-vec_id vectors; ties in argmin break
on the lower cell_id (min_by on a (dist, cell_id) struct). Double means
make exact cross-engine oracles impractical (summation order), so the
operator is invariant-tested: fixed K, monotone non-increasing inertia,
and run-to-run determinism (tests/test_kmeans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def _assign(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, e) × (cell_id, ce) → (vec_id, e, cell_id, sqdist)."""
    sq = F.aggregate(
        F.zip_with("e", "ce", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "e", "cell_id", sq.alias("sqdist")
    )
    return scored.groupBy("vec_id").agg(
        F.min_by(
            F.struct("cell_id", "sqdist", "e"), F.struct("sqdist", "cell_id")
        ).alias("best")
    ).select(
        "vec_id",
        F.col("best.e").alias("e"),
        F.col("best.cell_id").alias("cell_id"),
        F.col("best.sqdist").alias("sqdist"),
    )


def _update(assigned: DataFrame) -> DataFrame:
    """New centroids: per-(cell, dim) means reassembled into arrays."""
    dims = assigned.select(
        "cell_id", F.posexplode("e").alias("dim", "v")
    )
    means = dims.groupBy("cell_id", "dim").agg(F.avg("v").alias("m"))
    return (
        means.groupBy("cell_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))),
                lambda s: s["m"],
            ).alias("ce")
        )
    )


def kmeans_fit(
    emb: DataFrame, k: int = 8, iters: int = 3
) -> tuple[DataFrame, DataFrame]:
    """Train k-means on (vec_id, e: array<double>).

    Returns (centroids(cell_id, ce), assignment(vec_id, cell_id,
    sqdist)) after `iters` Lloyd iterations from the deterministic
    k-lowest-vec_id init. Each iteration is one broadcast join + two
    bounded aggregations; `localCheckpoint` keeps plans flat so the
    loop scales in iteration count.
    """
    # the init window is global but runs over exactly k rows (the
    # TakeOrdered limit executes first) — not a corpus-sized sort
    cent = (
        emb.orderBy("vec_id")
        .limit(k)
        .select(
            F.row_number().over(W.orderBy("vec_id")).alias("cell_id"),
            F.col("e").alias("ce"),
        )
    )
    assigned = None
    for _ in range(iters):
        assigned = _assign(emb, cent).localCheckpoint(eager=False)
        cent = _update(assigned)
    return cent, assigned.select("vec_id", "cell_id", "sqdist")
