#!/usr/bin/env python3
"""Radius-search prune probe (r13): measure how much of the corpus the
exact radius search (`knn_radius_cells`) actually SCANS, on the two
corpus shapes the ANN recall probes established:

- CLUSTERED-TIGHT (cells ≈ clusters): 16 Gaussian clusters of 1250
  members (20k vectors, sigma 0.05) — one centroid per cluster is
  reachable (the operator takes the first N_CELLS=16 vectors as
  centroids; with 16 clusters the argmax assignment snaps cells to
  clusters), so the ball-tree bound ||q−c|| − R_c > r fires for every
  non-home cell and the scan fraction should approach 1/16.
- RANDOM (sf1, 20k iid vectors): cell radii are corpus-wide (every
  cell holds diverse vectors), the bound can never exclude a cell,
  and the scan fraction is ~1 — the documented honest floor. The
  result stays EXACT either way (the prune is conservative); this
  probe re-verifies exactness against numpy brute force on both.

Writes RADIUS_PRUNE_CLUSTERED.json / RADIUS_PRUNE_SF1.json and prints
one JSON line each.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from etl_gcp_function_tmabrasil_spark.session import get_spark

TIGHT_DIR = "/tmp/spark_graft_radius_tight"
SF1_DIR = "/tmp/spark_graft_sf1"


def build_tight(dirp: str = TIGHT_DIR, dim: int = 64, seed: int = 11) -> int:
    """16 clusters x 1250 members: same schema as embeddings.parquet.
    vec_ids 0..15 are one member per cluster (so the operator's
    first-N_CELLS centroids land one per cluster), the rest shuffled."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_gcp_function_tmabrasil_spark.queries.similarity import N_CELLS

    os.makedirs(dirp, exist_ok=True)
    rng = np.random.RandomState(seed)
    per = 1250
    centers = rng.randn(N_CELLS, dim)
    vecs = (centers[:, None, :] + 0.05 * rng.randn(N_CELLS, per, dim)).reshape(
        -1, dim
    )
    labels = np.repeat(np.arange(N_CELLS), per)
    # put one member of each cluster first (vec_id 0..15 = centroids),
    # shuffle the rest
    first = np.arange(N_CELLS) * per
    rest = np.setdiff1d(np.arange(len(vecs)), first)
    rng.shuffle(rest)
    order = np.concatenate([first, rest])
    vecs, labels = vecs[order], labels[order]
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32)),
        }
    )
    pq.write_table(t, os.path.join(dirp, "embeddings.parquet"))
    return len(vecs)


def measure(spark, dirp: str) -> dict:
    from etl_gcp_function_tmabrasil_spark.queries.similarity import (
        N_CELLS,
        N_QUERIES,
        RADIUS_COS,
        _radius_parts,
        knn_radius_cells,
    )

    parts = _radius_parts(spark, dirp)
    surviving = parts["probes"].select("query_id", "cell_id").collect()
    cell_sizes = {
        r.cell_id: r.n
        for r in parts["assigned"].groupBy("cell_id").count().withColumnRenamed("count", "n").collect()
    }
    n_rows = sum(cell_sizes.values())
    scanned = sum(cell_sizes[r.cell_id] for r in surviving)
    got = {
        (r.query_id, r.neighbor_id)
        for r in knn_radius_cells(spark, dirp).collect()
    }
    # numpy brute-force ground truth (operator must be EXACT)
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(dirp, "embeddings.parquet"))
    vecs = np.array([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    ids = t["vec_id"].to_pylist()
    by_id = dict(zip(ids, vecs))
    want = set()
    norms = {i: np.linalg.norm(v) for i, v in by_id.items()}
    for q in range(N_QUERIES):
        qv = by_id[q]
        for vid, v in by_id.items():
            if vid == q:
                continue
            if round(float(qv @ v / (norms[q] * norms[vid])), 4) >= RADIUS_COS:
                want.add((q, vid))
    return {
        "queries": N_QUERIES,
        "cells": N_CELLS,
        "radius_cos": RADIUS_COS,
        "query_cells_total": N_QUERIES * N_CELLS,
        "query_cells_surviving": len(surviving),
        "prune_fraction": round(1 - len(surviving) / (N_QUERIES * N_CELLS), 4),
        "scan_fraction": round(scanned / (N_QUERIES * n_rows), 4),
        "result_pairs": len(got),
        "exact_match_vs_bruteforce": got == want,
    }


def main() -> None:
    spark = get_spark(app_name="radius_prune_probe")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.exists(os.path.join(TIGHT_DIR, "embeddings.parquet")):
        build_tight()
    for dirp, tag, fname in (
        (TIGHT_DIR, "clustered_tight_16", "RADIUS_PRUNE_CLUSTERED.json"),
        (SF1_DIR, "random_sf1", "RADIUS_PRUNE_SF1.json"),
    ):
        if not os.path.exists(os.path.join(dirp, "embeddings.parquet")):
            print(f"skip {tag}: {dirp} absent")
            continue
        out = {"corpus": tag}
        out.update(measure(spark, dirp))
        with open(os.path.join(here, fname), "w") as fh:
            json.dump(out, fh, indent=1)
            fh.write("\n")
        print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
