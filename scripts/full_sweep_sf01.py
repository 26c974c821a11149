#!/usr/bin/env python3
"""One-off FULL-REGISTRY oracle-parity sweep at sf0.1 — 10x the
driver's correctness scale (first run: round 5, 155/155 green; see
SURVEY.md 5.2). The per-session CI gate covers the 9 scale-sensitive
entries (tests/test_scale_invariance.py); this script is the
everything-else sweep to rerun after wide refactors.

The three QUADRATIC_ORACLES are run last and can be skipped with
--fast: their DuckDB twins enumerate full pair spaces at sf0.1
(measured round 5: ann_lsh_cosine 44 s, dedup_ngram_jaccard 16 s,
fuzzy_name_match 138 s of oracle time).

Usage: python scripts/full_sweep_sf01.py [--fast]   (from the repo root)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

QUADRATIC_ORACLES = ["ann_lsh_cosine", "dedup_ngram_jaccard", "fuzzy_name_match"]


def main() -> int:
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    from oracle_check import compare, duckdb_connection

    fast = "--fast" in sys.argv
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb_connection("/root/testdata/sf0.1")
    names = [n for n in sorted(qs) if n not in QUADRATIC_ORACLES]
    if not fast:
        names += QUADRATIC_ORACLES
    bad = 0
    for name in names:
        t0 = time.time()
        try:
            problems = compare(
                qs[name](spark, "/root/testdata/sf0.1"),
                con.execute(osql[name]).fetchdf(),
                name,
            )
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            problems = [f"EXC {type(exc).__name__}: {str(exc)[:200]}"]
        if problems:
            bad += 1
            print("FAIL", name, problems, flush=True)
        dt = time.time() - t0
        if dt > 30:
            print(f"slow: {name} {dt:.1f}s", flush=True)
    print(f"sweep done; failures: {bad} of {len(names)}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
