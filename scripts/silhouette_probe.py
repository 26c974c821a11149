#!/usr/bin/env python3
"""Silhouette-vs-corpus probe (r14, verdict item 7's closing line):
run ``ann_silhouette_cells`` on the SAME two corpora the radius-prune
probe measures — the 16-cluster tight fixture (92.2% prune,
RADIUS_PRUNE_CLUSTERED.json) and the iid sf1 corpus (0% prune,
RADIUS_PRUNE_SF1.json) — and record the corpus-level mean simplified
silhouette for each, so the prune/recall contrast the ANN artifacts
show has its explanatory clustering-quality number attached: a
near-one silhouette IS the clustered regime where cell pruning and
IVF probing win; a near-zero silhouette IS the honest iid floor where
they degrade to scans while staying exact.

Writes SILHOUETTE_CONTRAST.json. Reuses the radius-prune probe's
fixture builders so the corpora are bit-identical to the cited
artifacts.

Usage: python scripts/silhouette_probe.py   (from the repo root)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def main() -> None:
    from radius_prune_probe import SF1_DIR, TIGHT_DIR, build_tight

    from etl_gcp_function_tmabrasil_spark.queries.similarity import (
        ann_silhouette_cells,
    )
    from etl_gcp_function_tmabrasil_spark.session import get_spark

    if not os.path.exists(os.path.join(TIGHT_DIR, "embeddings.parquet")):
        build_tight()
    if not os.path.exists(os.path.join(SF1_DIR, "embeddings.parquet")):
        raise SystemExit(
            "run scripts/sf1_scale_probe.py first (builds the sf1 corpus)"
        )
    spark = get_spark(app_name="silhouette_probe")
    out = {}
    for tag, dirp, prune_artifact in [
        ("clustered_tight_16", TIGHT_DIR, "RADIUS_PRUNE_CLUSTERED.json"),
        ("random_sf1", SF1_DIR, "RADIUS_PRUNE_SF1.json"),
    ]:
        rows = ann_silhouette_cells(spark, dirp).collect()
        n = sum(r.n_vectors for r in rows)
        mean_s = sum(r.mean_silhouette * r.n_vectors for r in rows) / n
        with open(os.path.join(REPO, prune_artifact)) as fh:
            prune = json.load(fh)["prune_fraction"]
        out[tag] = {
            "n_vectors": n,
            "n_cells": len(rows),
            "mean_silhouette": round(mean_s, 4),
            "min_cell_silhouette": round(
                min(r.mean_silhouette for r in rows), 4
            ),
            "max_cell_silhouette": round(
                max(r.mean_silhouette for r in rows), 4
            ),
            "radius_prune_fraction": prune,
        }
        print(tag, out[tag], flush=True)
    with open(os.path.join(REPO, "SILHOUETTE_CONTRAST.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
