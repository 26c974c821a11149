#!/usr/bin/env python3
"""Positional-drift probe for the bench harness (r8 verdict item 4).

The driver's round-8 bench artifact showed a ~10 % inflation
CONCENTRATED in the back half of the 40-entry headline list
(udf_arrow_vector_norms 2.29x, timeseries_ewma 1.73x, ...) while the
21 r1-era queries at the front were bit-flat — a signature the r7
drift probe (cross-session clean/loaded) did not cover. This probe
answers one question: does inflation follow LIST POSITION (JVM/GC/
code-cache accumulation as the session ages past ~40 plans) or QUERY
IDENTITY (host-load coincidence on the driver machine)?

Protocol: two fresh processes, same bench protocol (per-query warmup +
min of 3), one with the headline list REVERSED, then one forward.
If inflation is positional, the queries that sat in the back half
forward should speed up when moved to the front reversed (and vice
versa); if identity-bound, order changes nothing outside noise.

Writes BENCH_ORDER_PROBE.json {forward: {..}, reversed: {..},
per_query: [{name, fwd_pos, fwd_min, rev_min, ratio}]} and prints a
front-half/back-half summary. Runs reversed FIRST so BENCH_LOCAL.json
ends holding the forward (canonical close-out) record.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(order: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_ORDER=order,
        # probe runs are builder-side: write the committed-artifact name
        # (bench.py defaults to the gitignored BENCH_LOCAL_DRIVE.json)
        SPARK_GRAFT_BENCH_ARTIFACT="BENCH_LOCAL.json",
    )
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO,
        env=env,
        check=True,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    with open(os.path.join(REPO, "BENCH_LOCAL.json")) as fh:
        return json.load(fh)


def main() -> None:
    sys.path.insert(0, REPO)
    from bench import HEADLINE

    rev = _run("reverse")
    fwd = _run("forward")
    per_query = []
    for pos, name in enumerate(HEADLINE):
        f, r = fwd["queries"].get(name), rev["queries"].get(name)
        if f is None or r is None:
            continue
        per_query.append(
            {
                "name": name,
                "fwd_pos": pos,
                "fwd_min": f,
                "rev_min": r,
                "ratio_rev_over_fwd": round(r / f, 3) if f else None,
            }
        )
    n = len(per_query)
    front = [q for q in per_query if q["fwd_pos"] < n // 2]
    back = [q for q in per_query if q["fwd_pos"] >= n // 2]

    def tot(rows, key):
        return round(sum(r[key] for r in rows), 3)

    summary = {
        "n_queries": n,
        "front_half": {
            "fwd_total": tot(front, "fwd_min"),
            "rev_total": tot(front, "rev_min"),
        },
        "back_half": {
            "fwd_total": tot(back, "fwd_min"),
            "rev_total": tot(back, "rev_min"),
        },
        "reading": (
            "positional drift => back_half rev_total << fwd_total (those "
            "queries ran FIRST in the reversed session) and front_half "
            "rev_total > fwd_total; identity/load => both ratios ~1"
        ),
    }
    out = {
        "forward_total": fwd["value"],
        "reversed_total": rev["value"],
        "summary": summary,
        "per_query": per_query,
    }
    with open(os.path.join(REPO, "BENCH_ORDER_PROBE.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps({"forward_total": fwd["value"], "reversed_total": rev["value"], **summary}, indent=1))


if __name__ == "__main__":
    main()
