"""Independent brute-force verification of the round-9 operators.

Every query here is also oracle-gated (Spark vs DuckDB at sf0.01), but
oracle twins share the AUTHOR — a misconception encoded in both sides
hashes green. These tests recompute each operator's semantics a third
way, in plain Python over collected sf0.001 rows, from the DEFINITION
(dominance, sweep-line simulation, the CUSUM recurrence, all-pairs
Jaccard, direct triangle enumeration) rather than from the relational
formulation both engines share.
"""

from __future__ import annotations

import math
from collections import defaultdict

from tests.conftest import SF_SMOKE


def test_pareto_frontier_is_exactly_the_nondominated_set(spark):
    """Skyline definition check: every returned order is non-dominated,
    every non-returned order is dominated by some returned one (the
    frontier dominates everything — a standard skyline property)."""
    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.relational3 import (
        pareto_frontier_orders,
    )

    rows = [
        (r.o_orderkey, r.o_totalprice, r.o_orderdate)
        for r in load_table(spark, SF_SMOKE, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .collect()
    ]
    got = {r.o_orderkey for r in pareto_frontier_orders(spark, SF_SMOKE).collect()}

    def dominates(a, b):
        return (
            a[1] >= b[1]
            and a[2] <= b[2]
            and (a[1] > b[1] or a[2] < b[2])
        )

    # brute-force frontier from the definition (price max, date min)
    want = set()
    for a in rows:
        if not any(dominates(b, a) for b in rows):
            want.add(a[0])
    assert got == want
    assert got, "empty frontier"


def test_interval_concurrency_matches_timeline_simulation(spark):
    """Sweep-line vs a direct per-user timeline simulation with
    half-open [s, e) intervals — including the tie rule (an interval
    ending exactly when another starts does not overlap it)."""
    import datetime as dt

    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.events_json import (
        interval_max_concurrency,
    )

    horizon = {"purchase": 60, "click": 30}
    per_user = defaultdict(list)
    for r in (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_type")
        .collect()
    ):
        end = r.ts + dt.timedelta(minutes=horizon.get(r.event_type, 15))
        per_user[r.user_id].append((r.ts, end))
    got = {
        r.user_id: (r.max_concurrent, r.n_intervals)
        for r in interval_max_concurrency(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(per_user)
    for uid, ivs in per_user.items():
        # direct simulation: ends before starts at equal instants
        pts = [(s, 1) for s, _ in ivs] + [(e, -1) for _, e in ivs]
        pts.sort(key=lambda p: (p[0], p[1]))
        live = peak = 0
        for _, d in pts:
            live += d
            peak = max(peak, live)
        assert got[uid] == (peak, len(ivs)), uid


def test_twa_matches_direct_recompute(spark):
    """Time-weighted average vs a direct per-user recompute from the
    definition (each value holds until the next event; last holds
    nothing; zero-duration tie slices contribute nothing)."""
    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.events_json import (
        timeseries_twa,
    )

    per_user = defaultdict(list)
    for r in (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    ):
        per_user[r.user_id].append((r.ts, r.event_id, r.value))
    got = {
        r.user_id: (r.twa_value, r.span_s)
        for r in timeseries_twa(spark, SF_SMOKE).collect()
    }
    for uid, evs in per_user.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        wsum, span = 0.0, 0
        for (t0, _, v), (t1, _, _) in zip(evs, evs[1:]):
            dur = int(t1.timestamp()) - int(t0.timestamp())
            wsum += round(v, 4) * dur
            span += dur
        if span > 0:
            assert got[uid][1] == span, uid
            assert abs(got[uid][0] - wsum / span) < 1e-5, uid
        else:
            assert uid not in got


def test_cusum_matches_sequential_fold(spark):
    """CUSUM vs the literal Page recurrence run sequentially in Python
    with the same μ (mean + 0.5σ from exact moments)."""
    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.events_json import (
        timeseries_cusum,
    )

    rows = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    vals = [round(r.value, 4) for r in rows]
    n = len(vals)
    mean = sum(vals) / n
    sd = math.sqrt(n * sum(v * v for v in vals) - sum(vals) ** 2) / n
    mu = mean + 0.5 * sd
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append((r.ts, r.event_id, r.value))
    got = {
        r.user_id: (r.cusum_final, r.cusum_max, r.alarm)
        for r in timeseries_cusum(spark, SF_SMOKE).collect()
    }
    for uid, evs in per_user.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        s = m = 0.0
        for _, _, v in evs:
            s = max(0.0, s + (v - mu))
            m = max(m, s)
        assert abs(got[uid][0] - s) < 1e-4, uid
        assert abs(got[uid][1] - m) < 1e-4, uid
        assert got[uid][2] == (m > 3.0 * sd), uid


def test_simjoin_equals_all_pairs_bruteforce(spark):
    """Prefix filtering is a candidate PRUNE, never an answer change:
    the join must return exactly the all-pairs Jaccard >= tau set."""
    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.dedup_approx import (
        SSJOIN_TAU,
        SSJOIN_W,
        simjoin_prefix_jaccard,
    )

    docs = [
        (r.doc_id, r.text.split(" "))
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .collect()
    ]
    sets = {
        d: {
            " ".join(t[i : i + SSJOIN_W])
            for i in range(len(t) - SSJOIN_W + 1)
        }
        for d, t in docs
        if len(t) >= SSJOIN_W
    }
    want = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter and inter / (len(sets[a]) + len(sets[b]) - inter) >= SSJOIN_TAU:
                want.add((a, b))
    got = {
        (r.doc_a, r.doc_b)
        for r in simjoin_prefix_jaccard(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert want, "no similar pairs at sf0.001 — threshold miscalibrated"


def test_triangle_count_matches_direct_enumeration(spark):
    """Degree-oriented wedge closing vs direct triangle enumeration
    over the adjacency sets of the same bounded co-purchase graph."""
    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.relational3 import (
        _TRI_MAX_PART,
        graph_triangle_count,
    )

    per_order = defaultdict(set)
    for r in (
        load_table(spark, SF_SMOKE, "lineitem")
        .filter(f"l_partkey < {_TRI_MAX_PART}")
        .select("l_orderkey", "l_partkey")
        .collect()
    ):
        per_order[r.l_orderkey].add(r.l_partkey)
    edges = set()
    for parts in per_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                edges.add((u, v))
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri = sum(
        1
        for (u, v) in edges
        for w in adj[u] & adj[v]
        if v < w  # canonical u < v < w
    )
    row = graph_triangle_count(spark, SF_SMOKE).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (
        len(adj),
        len(edges),
        tri,
    )
    assert tri > 0, "degenerate fixture: no triangles"
