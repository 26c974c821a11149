"""Independent brute-force verification of the round-10 operators.

Every query here is also oracle-gated (Spark vs DuckDB), but oracle
twins share the AUTHOR — a misconception encoded in both sides hashes
green. These tests recompute each operator's semantics a third way,
in plain Python over collected sf0.001 rows, from the DEFINITION
(the winnowing selection rule as literally stated in Schleimer et
al., KMV order statistics, the weighted-median crossing, regex over
a hand-ordered sequence, the STL moving-average recurrences) rather
than from the relational formulation both engines share.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

from tests.conftest import SF_SMOKE


def _winnow_reference(text: str, k: int, w: int) -> set[int]:
    """Winnowing per the paper: hash every k-gram, slide a w-window,
    select each window's min hash with RIGHTMOST tie-break; return the
    selected fingerprint hash set."""
    n = len(text) - k + 1
    if n < 1:
        return set()
    hashes = [
        int(hashlib.md5(text[p : p + k].encode()).hexdigest()[:10], 16)
        for p in range(n)
    ]
    picked: set[int] = set()
    for s in range(max(1, n - w + 1)):
        window = hashes[s : s + w]
        m = min(window)
        # rightmost position attaining the min
        idx = max(i for i, h in enumerate(window) if h == m)
        picked.add((s + idx, m))
    return {h for _, h in picked}


def test_winnowing_selection_matches_paper_definition(spark):
    """The packed-bigint frame-min formulation must select exactly the
    fingerprints the paper's stateful scan selects, per document."""
    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.dedup_approx import (
        WINNOW_K,
        WINNOW_MAXDF,
        WINNOW_T,
        dedup_winnowing_pairs,
    )

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    fps = {
        d: _winnow_reference(t, WINNOW_K, WINNOW_W_)
        for d, t in docs.items()
        if len(t) >= WINNOW_K
    }
    # df stoplist then pair counts, per the operator's contract
    df = defaultdict(int)
    for sel in fps.values():
        for h in sel:
            df[h] += 1
    kept = {h for h, c in df.items() if c <= WINNOW_MAXDF}
    expected = defaultdict(int)
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = (fps[a] & fps[b]) & kept
            if len(shared) >= WINNOW_T:
                expected[(a, b)] = len(shared)
    got = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in dedup_winnowing_pairs(spark, SF_SMOKE).collect()
    }
    assert got == dict(expected)


# the reference scan needs the window constant by name; import lazily
from etl_gcp_function_tmabrasil_spark.queries.dedup_approx import (  # noqa: E402
    WINNOW_W as WINNOW_W_,
)


def test_kmv_estimate_is_the_order_statistic_formula(spark):
    """KMV per definition: hash the distinct keys, sort, take the Kth
    smallest, apply (K-1)*H/h_(K); the union row must equal the same
    formula over the MERGED sketch (K smallest of the union of the two
    sketches), not over the raw union."""
    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.aggregates import (
        KMV_K,
        agg_kmv_distinct,
    )

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type", "user_id", "ts"
    )
    keys = defaultdict(set)
    for r in ev.collect():
        day = r.ts.strftime("%Y-%m-%d")
        keys[r.event_type].add(f"{r.user_id}@{day}")

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def est(hashes: set[int]) -> int:
        sk = sorted(hashes)[:KMV_K]
        if len(sk) < KMV_K:
            return len(sk)
        return round((KMV_K - 1.0) * float(1 << 60) / sk[-1])

    expected = {}
    sketches = {}
    for et, ks in keys.items():
        hs = {h60(k) for k in ks}
        sketches[et] = sorted(hs)[:KMV_K]
        expected[et] = (len(hs), est(hs))
    merged = set(sketches["click"]) | set(sketches["view"])
    union_exact = len(
        {h60(k) for k in keys["click"] | keys["view"]}
    )
    expected["union:click+view"] = (union_exact, est(merged))

    got = {
        r.label: (r.exact_ndv, r.kmv_est)
        for r in agg_kmv_distinct(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_weighted_median_crossing_definition(spark):
    """Smallest price whose cumulative quantity (over price order,
    peers pooled) reaches half the total — computed by direct scan."""
    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        agg_weighted_median,
    )

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    groups = defaultdict(list)
    for r in li.collect():
        groups[r.l_returnflag].append(
            (float(r.l_extendedprice), float(r.l_quantity))
        )
    expected = {}
    for g, rows in groups.items():
        rows.sort()
        total = sum(w for _, w in rows)
        cum = 0.0
        for price, w in rows:
            cum += w
            if cum * 2 >= total:
                expected[g] = price
                break
    got = {
        r.l_returnflag: r.weighted_median
        for r in agg_weighted_median(spark, SF_SMOKE).collect()
    }
    assert got.keys() == expected.keys()
    for g in expected:
        assert math.isclose(got[g], expected[g], rel_tol=1e-9), g


def test_seq_pattern_match_equals_rebuilt_regex_scan(spark):
    """Rebuild each user's symbol string by explicit (ts, event_id)
    sort and count non-overlapping regex matches with Python's re."""
    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        SEQ_PATTERN,
        seq_pattern_match,
    )

    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    seqs = defaultdict(list)
    for r in ev.collect():
        seqs[r.user_id].append((r.ts, r.event_id, r.event_type[0]))
    expected = {}
    for u, rows in seqs.items():
        rows.sort(key=lambda t: (t[0], t[1]))
        s = "".join(c for _, _, c in rows)
        n = len(re.findall(SEQ_PATTERN, s))
        if n >= 1:
            expected[u] = (len(s), n)
    got = {
        r.user_id: (r.seq_len, r.n_matches)
        for r in seq_pattern_match(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_winsorized_fences_are_type1_quantiles(spark):
    """p05/p95 must be the ceil-rank order statistics, counts and the
    clipped mean recomputed directly."""
    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        agg_winsorized_mean,
    )

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type", "value"
    )
    groups = defaultdict(list)
    for r in ev.collect():
        groups[r.event_type].append(round(float(r.value), 4))
    for r in agg_winsorized_mean(spark, SF_SMOKE).collect():
        vs = sorted(groups[r.event_type])
        n = len(vs)
        p05 = vs[(n + 19) // 20 - 1]
        p95 = vs[(n * 19 + 19) // 20 - 1]
        assert math.isclose(r.p05, p05, rel_tol=1e-9)
        assert math.isclose(r.p95, p95, rel_tol=1e-9)
        assert r.n_clipped_low == sum(1 for v in vs if v < p05)
        assert r.n_clipped_high == sum(1 for v in vs if v > p95)
        wmean = sum(min(max(v, p05), p95) for v in vs) / n
        assert math.isclose(r.winsorized_mean, wmean, abs_tol=1e-4)


def test_seasonal_decompose_recurrence(spark):
    """Trend/seasonal/remainder recomputed from the definition over
    one event type's daily series."""
    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        SEAS_HALF,
        timeseries_seasonal_decompose,
    )
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_SMOKE, "events")
    daily_rows = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).alias("v"))
        .orderBy("day")
        .collect()
    )
    days = [r.day for r in daily_rows]
    vs = [float(r.v) for r in daily_rows]
    n = len(vs)
    trend = []
    for i in range(n):
        lo, hi = max(0, i - SEAS_HALF), min(n, i + SEAS_HALF + 1)
        trend.append(sum(vs[lo:hi]) / (hi - lo))
    seas_groups = defaultdict(list)
    from datetime import date

    for d, v, t in zip(days, vs, trend):
        seas_groups[(d - date(1970, 1, 1)).days % 7].append(
            round(v - t, 4)
        )
    seasonal = {k: sum(g) / len(g) for k, g in seas_groups.items()}
    got = {
        r.day_s: r
        for r in timeseries_seasonal_decompose(spark, SF_SMOKE)
        .filter(F.col("event_type") == "click")
        .collect()
    }
    assert len(got) == n
    for d, v, t in zip(days, vs, trend):
        row = got[str(d)]
        dow = (d - date(1970, 1, 1)).days % 7
        assert math.isclose(row.trend, t, abs_tol=2e-6), d
        assert math.isclose(row.seasonal, seasonal[dow], abs_tol=2e-6), d
        assert math.isclose(
            row.remainder, v - t - seasonal[dow], abs_tol=5e-6
        ), d


def test_jsd_properties_and_direct_recompute(spark):
    """JSD recomputed term-by-term from collected word counts, plus the
    definition's bounds: 0 <= JSD <= ln 2."""
    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.text_analysis import (
        corpus_divergence_js,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "source", "text"
    )
    wc_s: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    wc_g: dict[str, int] = defaultdict(int)
    for r in docs.collect():
        for w in r.text.split(" "):
            if w:
                wc_s[r.source][w] += 1
                wc_g[w] += 1
    ng = sum(wc_g.values())
    for row in corpus_divergence_js(spark, SF_SMOKE).collect():
        src = wc_s[row.source]
        n = sum(src.values())
        assert row.n_tokens == n
        kl_pm = kl_qm = 0.0
        for w, cg in wc_g.items():
            p = src.get(w, 0) / n
            q = cg / ng
            m = (p + q) / 2
            if p > 0:
                kl_pm += round(p * math.log(p / m), 8)
            kl_qm += round(q * math.log(q / m), 8)
        jsd = (kl_pm + kl_qm) / 2
        assert 0 <= row.jsd <= math.log(2) + 1e-9
        assert math.isclose(row.jsd, jsd, abs_tol=2e-6), row.source


def test_quantile_normalize_profile_reference_is_cross_source_mean(spark):
    """The reference profile must be the mean of the per-source bin
    means, and adjustments must sum to ~0 across sources per bin."""
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        QNORM_BINS,
        quantile_normalize_profile,
    )

    rows = quantile_normalize_profile(spark, SF_SMOKE).collect()
    by_bin = defaultdict(list)
    for r in rows:
        by_bin[r.bin].append(r)
    assert set(by_bin) == set(range(1, QNORM_BINS + 1))
    for b, rs in by_bin.items():
        ref = rs[0].ref_mean
        assert all(math.isclose(r.ref_mean, ref, abs_tol=1e-9) for r in rs)
        mean_src = sum(r.src_mean for r in rs) / len(rs)
        # ref computed pre-rounding; allow the 4-dp rounding slack
        assert math.isclose(ref, mean_src, abs_tol=1e-3), b
        assert math.isclose(
            sum(r.adjustment for r in rs), 0.0, abs_tol=1e-2
        ), b


def test_psi_identical_halves_are_stable_and_definition_holds(spark):
    """PSI recomputed from the definition (reference-decile bins,
    1e-4 floor) over collected rows; identical distributions would
    give ~0 — the verdict thresholds must match the number."""
    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        PSI_BINS,
        PSI_FLOOR,
        drift_psi,
    )

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type", "value", "ts"
    )
    rows = ev.collect()
    es = [int(r.ts.timestamp()) for r in rows]
    mid = (min(es) + max(es)) // 2
    per_type = defaultdict(lambda: {"ref": [], "cur": []})
    for r, e in zip(rows, es):
        half = "ref" if e < mid else "cur"
        per_type[r.event_type][half].append(round(float(r.value), 4))
    got = {r.event_type: r for r in drift_psi(spark, SF_SMOKE).collect()}
    for et, halves in per_type.items():
        ref = sorted(halves["ref"])
        n = len(ref)
        edges = [
            ref[(n * i + PSI_BINS - 1) // PSI_BINS - 1]
            for i in range(1, PSI_BINS)
        ]

        def props(vals):
            cnt = [0] * PSI_BINS
            for v in vals:
                b = sum(1 for e in edges if v > e)
                cnt[b] += 1
            return [max(c / len(vals), PSI_FLOOR) for c in cnt]

        p, q = props(halves["ref"]), props(halves["cur"])
        psi = sum(
            round((qi - pi) * math.log(qi / pi), 8) for pi, qi in zip(p, q)
        )
        assert math.isclose(got[et].psi, psi, abs_tol=2e-6), et
        want_verdict = (
            "stable" if psi < 0.1 else "moderate" if psi < 0.25 else "shifted"
        )
        assert got[et].verdict == want_verdict, et


def test_key_skew_profile_definition(spark):
    """Key-count order statistics recomputed by direct counting."""
    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        _SKEW_COLS,
        profile_key_skew,
    )

    li = load_table(spark, SF_SMOKE, "lineitem").select(*_SKEW_COLS)
    rows = li.collect()
    got = {r.col_name: r for r in profile_key_skew(spark, SF_SMOKE).collect()}
    for c in _SKEW_COLS:
        counts = defaultdict(int)
        for r in rows:
            counts[r[c]] += 1
        cs = sorted(counts.values())
        d, n = len(cs), sum(cs)
        p99 = cs[(d * 99 + 99) // 100 - 1]
        med = cs[(d + 1) // 2 - 1]
        r = got[c]
        assert (r.n_rows, r.n_keys, r.max_count) == (n, d, cs[-1]), c
        assert (r.p99_count, r.median_count) == (p99, med), c
        assert math.isclose(r.skew_ratio, cs[-1] / med, abs_tol=1e-6)
        assert math.isclose(r.top1_share, cs[-1] / n, abs_tol=1e-8)
        assert math.isclose(
            r.hhi, sum(x * x for x in cs) / (n * n), abs_tol=1e-8
        )
