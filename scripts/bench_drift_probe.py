#!/usr/bin/env python3
"""Round-7 drift probe: classify the r6 bench drift (comparable-28
median +7 % vs r5, concentrated in seven sub-second queries whose code
did not change) with measurements instead of the noise band — the r5
methodology (SCALING.md "Known local-bench artifacts"): one untimed
warmup, then SEVEN timed runs per query, min/median/max recorded.

Two conditions, matching how r5 proved its contention claim:
  clean   — fresh session, probe queries only (default)
  loaded  — the probe runs AFTER one pass over the full HEADLINE set
            (python scripts/bench_drift_probe.py loaded), reproducing
            the r6 bench session's accumulated JIT/GC/codegen-cache
            state at the point the drifted queries executed.

Prints one JSON line per query: {"name", "cond", "min", "median",
"max", "samples"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (HEADLINE list)
from etl_gcp_function_tmabrasil_spark.queries import all_queries  # noqa: E402
from etl_gcp_function_tmabrasil_spark.session import get_spark  # noqa: E402

#: The seven r5→r6 median regressions (1.26–1.54×), largest first.
PROBE = [
    "q10_returned_items",
    "q6_forecast_revenue",
    "window_rank_orders",
    "json_agg_by_key",
    "embedding_gram_matrix",
    "q5_local_supplier_volume",
    "dedup_minhash_lsh",
]

RUNS = 7


def main() -> None:
    cond = sys.argv[1] if len(sys.argv) > 1 else "clean"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"drift_probe_{cond}")
    queries = all_queries()
    spark.range(1_000_000).selectExpr("sum(id) as s").write.format("noop").mode(
        "overwrite"
    ).save()
    if cond == "loaded":
        for name in bench.HEADLINE:
            spark.catalog.clearCache()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
    for name in PROBE:
        samples: list[float] = []
        for i in range(RUNS + 1):
            spark.catalog.clearCache()
            df = queries[name](spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            if i > 0:  # run 0 is warmup
                samples.append(round(time.perf_counter() - t0, 3))
        ordered = sorted(samples)
        print(
            json.dumps(
                {
                    "name": name,
                    "cond": cond,
                    "min": ordered[0],
                    "median": ordered[len(ordered) // 2],
                    "max": ordered[-1],
                    "samples": samples,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
