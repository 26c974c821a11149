"""Independent brute-force verification of the late-r9 analytics wave.

Every query here is also oracle-gated (Spark vs DuckDB at sf0.01), but
oracle twins share the AUTHOR — a misconception encoded in both sides
hashes green. These tests recompute each operator's semantics a third
way, in plain Python over collected sf0.001 rows, from the DEFINITION
(Welch's published formulas, the retention-triangle definition, Markov
row-stochasticity, straight-line interpolation, PMI from raw
presence counts, the constraint suite against directly measured facts)
rather than from the relational formulation both engines share.
"""

from __future__ import annotations

import math
from collections import defaultdict

from tests.conftest import SF_SMOKE


def _events(spark):
    from etl_gcp_function_tmabrasil_spark.catalog import load_table

    return load_table(spark, SF_SMOKE, "events").collect()


def test_welch_matches_textbook_formulas(spark):
    """Recompute Welch's t and the Welch–Satterthwaite dof with plain
    Python floats from the raw values (sample variance via the direct
    two-pass definition, not the Σx/Σx² identity the engines share)."""
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        ab_test_welch,
    )

    groups = defaultdict(lambda: ([], []))
    for r in _events(spark):
        groups[r.event_type][r.user_id % 2].append(float(r.value))
    got = {r.event_type: r for r in ab_test_welch(spark, SF_SMOKE).collect()}
    assert set(got) == set(groups)
    for et, (a, b) in groups.items():
        ma, mb = sum(a) / len(a), sum(b) / len(b)
        va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
        vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
        sea, seb = va / len(a), vb / len(b)
        t = (ma - mb) / math.sqrt(sea + seb)
        dof = (sea + seb) ** 2 / (
            sea**2 / (len(a) - 1) + seb**2 / (len(b) - 1)
        )
        g = got[et]
        assert g.n_a == len(a) and g.n_b == len(b), et
        assert abs(g.mean_a - ma) < 1e-4, et
        assert abs(g.t_stat - t) < 1e-3, et
        assert abs(g.dof - dof) < max(1e-3 * dof, 1e-3), et
        assert g.significant == (abs(t) > 1.96), et


def test_retention_cohort_triangle_definition(spark):
    """Rebuild the triangle from per-user (first week, active weeks)
    sets computed directly on timestamps; every cohort must have a
    week_offset=0 row equal to its full size (everyone is active in
    their own first week)."""
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        events_retention_cohorts,
    )

    def week_start(ts):
        d = ts.date()
        from datetime import timedelta

        return d - timedelta(days=d.weekday())

    user_weeks = defaultdict(set)
    for r in _events(spark):
        user_weeks[r.user_id].add(week_start(r.ts))
    want = defaultdict(int)
    sizes = defaultdict(int)
    for _, weeks in user_weeks.items():
        w0 = min(weeks)
        sizes[w0] += 1
        for w in weeks:
            want[(w0, (w - w0).days // 7)] += 1
    got = {
        (r.cohort_week, r.week_offset): (r.n_active, r.cohort_size, r.retention)
        for r in events_retention_cohorts(spark, SF_SMOKE).collect()
    }
    assert len(got) == len(want)
    for (w0, off), n in want.items():
        g = got[(w0.isoformat(), off)]
        assert g[0] == n and g[1] == sizes[w0]
        assert abs(g[2] - n / sizes[w0]) < 1e-6
    # cohort completeness: offset-0 retention is exactly 1.0
    for (w0, off), (n, size, ret) in got.items():
        if off == 0:
            assert n == size and ret == 1.0, w0


def test_markov_rows_are_stochastic_and_counts_match(spark):
    """Transition counts recomputed from explicitly sorted per-user
    sequences; each source row of the matrix must sum to 1."""
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        events_markov_transitions,
    )

    seqs = defaultdict(list)
    for r in _events(spark):
        seqs[r.user_id].append((r.ts, r.event_id, r.event_type))
    want = defaultdict(int)
    for evs in seqs.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            want[(a, b)] += 1
    rows = events_markov_transitions(spark, SF_SMOKE).collect()
    got = {(r.src, r.dst): r.n_trans for r in rows}
    assert got == dict(want)
    by_src = defaultdict(float)
    for r in rows:
        by_src[r.src] += r.p_trans
    for src, s in by_src.items():
        assert abs(s - 1.0) < 1e-4, src


def test_interpolation_is_linear_between_observations(spark):
    """For every user: observed days keep their exact daily total,
    interior gap days sit on the straight line between the bracketing
    observations, and the spine is dense min→max day."""
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        resample_daily_interpolate,
    )

    daily = defaultdict(dict)
    for r in _events(spark):
        d = r.ts.date()
        daily[r.user_id][d] = daily[r.user_id].get(d, 0.0) + float(r.value)
    out = defaultdict(dict)
    for r in resample_daily_interpolate(spark, SF_SMOKE).collect():
        from datetime import date

        out[r.user_id][date.fromisoformat(r.day)] = (
            r.filled_value,
            r.observed,
        )
    assert set(out) == set(daily)
    for u, obs in daily.items():
        days = sorted(obs)
        spine = sorted(out[u])
        assert spine[0] == days[0] and spine[-1] == days[-1]
        assert len(spine) == (days[-1] - days[0]).days + 1
        for d, (v, observed) in out[u].items():
            if d in obs:
                assert observed and abs(v - obs[d]) < 1e-3, (u, d)
            else:
                assert not observed
                prev = max(x for x in days if x < d)
                nxt = min(x for x in days if x > d)
                frac = (d - prev).days / (nxt - prev).days
                want = obs[prev] + (obs[nxt] - obs[prev]) * frac
                assert abs(v - want) < 1e-3, (u, d)


def test_pmi_matches_presence_count_definition(spark):
    """PMI recomputed from raw document word-presence sets over the
    same capped vocabulary."""
    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        PMI_TOP_WORDS,
        text_word_pmi,
    )

    docs = [
        set(r.text.split(" "))
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("text")
        .collect()
    ]
    df = defaultdict(int)
    for ws in docs:
        for w in ws:
            df[w] += 1
    top = set(
        w
        for w, _ in sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[
            :PMI_TOP_WORDS
        ]
    )
    want = defaultdict(int)
    for ws in docs:
        caps = sorted(ws & top)
        for i, w1 in enumerate(caps):
            for w2 in caps[i + 1 :]:
                want[(w1, w2)] += 1
    got = {(r.w1, r.w2): (r.n_pair, r.pmi) for r in text_word_pmi(spark, SF_SMOKE).collect()}
    assert set(got) == set(want)
    n = len(docs)
    for (w1, w2), npair in want.items():
        pmi = math.log(npair * n / (df[w1] * df[w2]))
        assert got[(w1, w2)][0] == npair
        assert abs(got[(w1, w2)][1] - pmi) < 1e-5, (w1, w2)


def test_dq_suite_verdicts_match_directly_measured_facts(spark):
    """Measure each constraint directly on collected rows and compare
    both the metric and the verdict."""
    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        dq_constraint_suite,
    )

    orders = load_table(spark, SF_SMOKE, "orders").collect()
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    okeys = [r.o_orderkey for r in orders]
    got = {
        r.check_name: (r.metric, r.passed)
        for r in dq_constraint_suite(spark, SF_SMOKE).collect()
    }
    assert len(got) == 6
    uniq = len(set(okeys)) / len(okeys)
    assert abs(got["orders.o_orderkey is unique"][0] - round(uniq, 6)) < 1e-9
    assert got["orders.o_orderkey is unique"][1] == (len(set(okeys)) == len(okeys))
    nulls = sum(1 for r in orders if r.o_custkey is None)
    assert got["orders.o_custkey is complete"][1] == (nulls == 0)
    orphans = sum(1 for r in li if r.l_orderkey not in set(okeys))
    assert got["lineitem.l_orderkey references orders"] == (
        float(orphans),
        orphans == 0,
    )
    qty_ok = sum(1 for r in li if 1 <= r.l_quantity <= 50)
    assert abs(
        got["lineitem.l_quantity in [1,50]"][0] - round(qty_ok / len(li), 6)
    ) < 1e-9


def test_kaplan_meier_matches_product_limit_definition(spark):
    """Recompute the KM curve directly: durations from raw timestamps,
    then the product-limit recurrence over observed-event times."""
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        survival_kaplan_meier,
    )

    per_user = {}
    horizon = max(r.ts for r in _events(spark))
    by_user = defaultdict(list)
    for r in _events(spark):
        by_user[r.user_id].append(r)
    for u, evs in by_user.items():
        t0 = min(e.ts for e in evs)
        purchases = [e.ts for e in evs if e.event_type == "purchase"]
        tp = min(purchases) if purchases else None
        end = tp if tp is not None else horizon
        per_user[u] = ((end.date() - t0.date()).days, tp is not None)
    rows = survival_kaplan_meier(spark, SF_SMOKE).collect()
    surv = 1.0
    got = {r.dur: r for r in rows}
    event_durs = sorted({d for d, obs in per_user.values() if obs})
    assert sorted(got) == event_durs
    for t in event_durs:
        n_risk = sum(1 for d, _ in per_user.values() if d >= t)
        d_ev = sum(1 for d, obs in per_user.values() if obs and d == t)
        surv *= 1.0 - d_ev / n_risk
        g = got[t]
        assert g.n_at_risk == n_risk and g.n_events == d_ev, t
        assert abs(g.survival - surv) < 1e-5, t


def test_moving_median_matches_direct_frame_median(spark):
    """Median of each trailing 7-row frame recomputed from explicitly
    sorted per-user sequences with statistics.median (interpolating)."""
    import statistics

    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        MOVMED_FRAME,
        window_moving_median,
    )

    seqs = defaultdict(list)
    for r in _events(spark):
        seqs[r.user_id].append((r.ts, r.event_id, float(r.value)))
    want = {}
    for u, evs in seqs.items():
        evs.sort()
        for i in range(len(evs)):
            frame = [v for _, _, v in evs[max(0, i - MOVMED_FRAME + 1) : i + 1]]
            want[(u, evs[i][1])] = statistics.median(frame)
    got = {
        (r.user_id, r.event_id): r.moving_median
        for r in window_moving_median(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-5, k


def test_pareto_core_flag_is_minimal_80pct_prefix(spark):
    """The flagged brands must be exactly the minimal descending-revenue
    prefix whose cumulative share reaches 80%."""
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        pareto_contribution_8020,
    )

    rows = pareto_contribution_8020(spark, SF_SMOKE).collect()
    total = sum(r.revenue for r in rows)
    cum = 0.0
    for r in rows:  # already ordered revenue DESC, brand
        assert r.core_80pct == (cum / total < 0.8), r.p_brand
        cum += r.revenue
    assert any(r.core_80pct for r in rows)
    assert not all(r.core_80pct for r in rows)


def test_phrase_search_matches_string_scan(spark):
    """Every reported (doc, count, first position) must equal a direct
    token-scan for the same phrase, and the phrase must be the corpus's
    most frequent bigram."""
    from collections import Counter

    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        phrase_search_positional,
    )

    texts = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    bg = Counter()
    for ws in texts.values():
        for i in range(len(ws) - 1):
            bg[f"{ws[i]} {ws[i+1]}"] += 1
    best = sorted(bg.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    w1, w2 = best.split(" ")
    want = {}
    for doc_id, ws in texts.items():
        pos = [i for i in range(len(ws) - 1) if ws[i] == w1 and ws[i + 1] == w2]
        if pos:
            want[doc_id] = (len(pos), pos[0])
    rows = phrase_search_positional(spark, SF_SMOKE).collect()
    assert all(r.phrase == best for r in rows)
    got = {r.doc_id: (r.n_hits, r.first_pos) for r in rows}
    assert got == want and want


def test_assoc_statistics_match_contingency_definition(spark):
    """MI and chi-square recomputed from a plain Counter contingency."""
    from collections import Counter

    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        assoc_mi_chi2,
    )

    pairs = Counter(
        (r.o_orderpriority, r.o_orderstatus)
        for r in load_table(spark, SF_SMOKE, "orders").collect()
    )
    n = sum(pairs.values())
    ri = Counter()
    cj = Counter()
    for (a, b), c in pairs.items():
        ri[a] += c
        cj[b] += c
    mi = sum(
        (c / n) * math.log(c * n / (ri[a] * cj[b]))
        for (a, b), c in pairs.items()
    )
    chi2 = sum(
        (c - ri[a] * cj[b] / n) ** 2 / (ri[a] * cj[b] / n)
        for (a, b), c in pairs.items()
    )
    row = assoc_mi_chi2(spark, SF_SMOKE).collect()[0]
    assert abs(row.mutual_information - mi) < 1e-5
    assert abs(row.chi2 - chi2) < 1e-3
    assert row.dof == (len(ri) - 1) * (len(cj) - 1)
    v = math.sqrt(chi2 / (n * min(len(ri) - 1, len(cj) - 1)))
    assert abs(row.cramers_v - v) < 1e-5


def test_frequent_values_profile_matches_counter(spark):
    """Top-3 per column recomputed with Counter + the same total
    order (count DESC, value ASC)."""
    from collections import Counter

    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        PROFILE_TOP_K,
        profile_frequent_values,
    )

    orders = load_table(spark, SF_SMOKE, "orders").collect()
    for col in ("o_orderstatus", "o_orderpriority"):
        cnt = Counter(getattr(r, col) for r in orders)
        want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[
            :PROFILE_TOP_K
        ]
        got = sorted(
            (
                (r.rk, r.val, r.n, r.share)
                for r in profile_frequent_values(spark, SF_SMOKE).collect()
                if r.col_name == col
            )
        )
        assert [(v, c) for _, v, c, _ in got] == want
        n = len(orders)
        for _, _, c, share in got:
            assert abs(share - c / n) < 1e-6


def test_ols_matches_direct_least_squares(spark):
    """Slope/intercept/r² recomputed with the centered-sums formulas
    (not the raw-moment identity the engines share)."""
    from datetime import date

    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        OLS_EPOCH,
        agg_linear_regression,
    )

    anchor = date.fromisoformat(OLS_EPOCH)
    pts = defaultdict(list)
    for r in _events(spark):
        pts[r.event_type].append(
            ((r.ts.date() - anchor).days, float(r.value))
        )
    got = {r.event_type: r for r in agg_linear_regression(spark, SF_SMOKE).collect()}
    assert set(got) == set(pts)
    for et, xy in pts.items():
        n = len(xy)
        mx = sum(x for x, _ in xy) / n
        my = sum(y for _, y in xy) / n
        sxy = sum((x - mx) * (y - my) for x, y in xy)
        sxx = sum((x - mx) ** 2 for x, _ in xy)
        syy = sum((y - my) ** 2 for _, y in xy)
        slope = sxy / sxx
        intercept = my - slope * mx
        r2 = sxy * sxy / (sxx * syy)
        g = got[et]
        assert g.n_rows == n, et
        assert abs(g.slope - slope) < max(1e-5, abs(slope) * 1e-4), et
        assert abs(g.intercept - intercept) < max(1e-4, abs(intercept) * 1e-4), et
        assert abs(g.r2 - r2) < 1e-5, et


def test_moving_distinct_matches_direct_frame_sets(spark):
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        MOVMED_FRAME,
        window_moving_distinct,
    )

    seqs = defaultdict(list)
    for r in _events(spark):
        seqs[r.user_id].append((r.ts, r.event_id, r.event_type))
    want = {}
    for u, evs in seqs.items():
        evs.sort()
        for i in range(len(evs)):
            frame = {t for _, _, t in evs[max(0, i - MOVMED_FRAME + 1) : i + 1]}
            want[(u, evs[i][1])] = len(frame)
    got = {
        (r.user_id, r.event_id): r.n_distinct_types
        for r in window_moving_distinct(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_oov_rate_matches_direct_token_count(spark):
    from collections import Counter

    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        OOV_VOCAB_K,
        vocab_oov_rate,
    )

    texts = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    df = Counter()
    for ws in texts.values():
        for w in set(ws):
            df[w] += 1
    vocab = {
        w
        for w, _ in sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[
            :OOV_VOCAB_K
        ]
    }
    got = {r.doc_id: r for r in vocab_oov_rate(spark, SF_SMOKE).collect()}
    assert set(got) == set(texts)
    for doc_id, ws in texts.items():
        oov = sum(1 for w in ws if w not in vocab)
        g = got[doc_id]
        assert g.n_tokens == len(ws) and g.n_oov == oov, doc_id
        assert abs(g.oov_rate - oov / len(ws)) < 1e-6, doc_id


def test_mixture_plan_is_feasible_and_tight(spark):
    """No source is upsampled (rate <= 1), at least one source is fully
    consumed (rate == 1 — the budget is maximal), weights are uniform,
    and sampled tokens follow w·B."""
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        mixture_sampling_plan,
    )

    rows = mixture_sampling_plan(spark, SF_SMOKE).collect()
    k = len(rows)
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    budget = min(r.tokens / r.weight for r in rows)
    for r in rows:
        assert abs(r.weight - 1.0 / k) < 1e-6
        assert r.sampling_rate <= 1.0 + 1e-9
        assert abs(r.sampled_tokens - r.weight * budget) < 0.51
        assert abs(r.sampling_rate - (r.weight * budget / r.tokens)) < 1e-6
    assert any(abs(r.sampling_rate - 1.0) < 1e-6 for r in rows)


def test_kneser_ney_matches_direct_counts(spark):
    """KN probabilities recomputed from raw bigram Counters, and the
    interpolated distribution over the FULL vocabulary sums to 1 for
    the highest-count context (the property discounting exists to
    preserve)."""
    from collections import Counter

    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        KN_DISCOUNT,
        bigram_lm_kneser_ney,
    )

    c12 = Counter()
    for r in load_table(spark, SF_SMOKE, "documents").collect():
        ws = r.text.split(" ")
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] += 1
    c1 = Counter()
    n1_fwd = Counter()
    n1_bwd = Counter()
    for (a, b), c in c12.items():
        c1[a] += c
        n1_fwd[a] += 1
        n1_bwd[b] += 1
    B = len(c12)
    got = {(r.w1, r.w2): (r.c12, r.p_kn) for r in bigram_lm_kneser_ney(spark, SF_SMOKE).collect()}
    assert set(got) == set(c12)
    for (a, b), c in c12.items():
        p = max(c - KN_DISCOUNT, 0.0) / c1[a] + (
            KN_DISCOUNT * n1_fwd[a] / c1[a]
        ) * (n1_bwd[b] / B)
        assert got[(a, b)][0] == c
        assert abs(got[(a, b)][1] - p) < 1e-5, (a, b)
    # full-vocab normalization for the heaviest context
    ctx = max(c1, key=lambda a: c1[a])
    vocab = set(n1_bwd)
    s = sum(
        max(c12.get((ctx, w), 0) - KN_DISCOUNT, 0.0) / c1[ctx]
        + (KN_DISCOUNT * n1_fwd[ctx] / c1[ctx]) * (n1_bwd[w] / B)
        for w in vocab
    )
    assert abs(s - 1.0) < 1e-9


def test_attribution_matches_direct_scan(spark):
    """Credit recomputed by walking each user's sorted event list."""
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        ATTR_WINDOW_DAYS,
        attribution_last_touch,
    )

    seqs = defaultdict(list)
    for r in _events(spark):
        seqs[r.user_id].append((r.ts, r.event_id, r.event_type))
    want = defaultdict(int)
    for evs in seqs.values():
        evs.sort()
        for i, (ts, _, et) in enumerate(evs):
            if et != "purchase":
                continue
            channel = "direct"
            for pts, _, pet in reversed(evs[:i]):
                if pet in ("click", "view"):
                    if (ts.date() - pts.date()).days <= ATTR_WINDOW_DAYS:
                        channel = pet
                    break
            want[channel] += 1
    rows = attribution_last_touch(spark, SF_SMOKE).collect()
    got = {r.channel: r.conversions for r in rows}
    assert got == dict(want)
    total = sum(want.values())
    for r in rows:
        assert abs(r.share - want[r.channel] / total) < 1e-6


def test_exact_mode_matches_counter(spark):
    from collections import Counter

    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        agg_exact_mode,
    )

    per_status = defaultdict(Counter)
    for r in load_table(spark, SF_SMOKE, "orders").collect():
        per_status[r.o_orderstatus][r.o_orderpriority] += 1
    got = {r.o_orderstatus: r for r in agg_exact_mode(spark, SF_SMOKE).collect()}
    assert set(got) == set(per_status)
    for status, cnt in per_status.items():
        val, n = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        g = got[status]
        assert (g.modal_priority, g.n) == (val, n), status
        assert abs(g.share - n / sum(cnt.values())) < 1e-6


def test_kfold_is_exactly_balanced_and_exhaustive(spark):
    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        KFOLD_K,
        split_kfold_stratified,
    )

    rows = split_kfold_stratified(spark, SF_SMOKE).collect()
    langs = defaultdict(dict)
    for r in rows:
        langs[r.lang][r.fold] = r.n_docs
    per_lang_total = defaultdict(int)
    for r in load_table(spark, SF_SMOKE, "documents").collect():
        per_lang_total[r.lang] += 1
    assert set(langs) == set(per_lang_total)
    for lang, folds in langs.items():
        assert sum(folds.values()) == per_lang_total[lang]
        assert set(folds) <= set(range(KFOLD_K))
        counts = [folds.get(f, 0) for f in range(KFOLD_K)]
        assert max(counts) - min(counts) <= 1, lang  # exact stratification


def test_benford_digits_match_direct_arithmetic(spark):
    import math as m
    from collections import Counter

    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        dq_benford_digits,
    )

    vals = [
        r.o_totalprice
        for r in load_table(spark, SF_SMOKE, "orders").collect()
        if r.o_totalprice >= 1
    ]
    cnt = Counter(int(v / 10 ** m.floor(m.log10(v))) for v in vals)
    total = sum(cnt.values())
    rows = dq_benford_digits(spark, SF_SMOKE).collect()
    assert {r.digit for r in rows} == set(cnt)
    chi2 = 0.0
    for d in sorted(cnt):
        exp = m.log10(1 + 1 / d)
        chi2 += (cnt[d] / total - exp) ** 2 / exp * total
    for r in rows:
        assert r.n == cnt[r.digit]
        assert abs(r.observed_share - cnt[r.digit] / total) < 1e-6
        assert abs(r.chi2_total - chi2) < 1e-3


def test_dedup_impact_report_is_consistent_with_components(spark):
    from collections import Counter

    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.dedup_approx import (
        dedup_components,
        dedup_impact_report,
    )

    comp = dedup_components(spark, SF_SMOKE).collect()
    sizes = Counter(Counter(r.component_id for r in comp).values())
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    sizes[1] = sizes.get(1, 0) + (n_docs - len(comp))
    rows = dedup_impact_report(spark, SF_SMOKE).collect()
    got = {r.cluster_size: r for r in rows}
    assert {k: v.n_clusters for k, v in got.items()} == dict(sizes)
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.removable == r.n_docs - r.n_clusters
        assert abs(r.corpus_share - r.n_docs / n_docs) < 1e-6


def test_snapshot_merge_upsert_matches_direct_merge(spark):
    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.sources_gate import (
        sink_snapshot_merge_upsert,
    )

    want_n = defaultdict(int)
    want_sum = defaultdict(float)
    for r in load_table(spark, SF_SMOKE, "events").collect():
        if r.event_id % 7 == 0:
            want_n[r.event_type] += 1
            want_sum[r.event_type] += float(r.value) + 500
        elif r.event_id % 3 != 0:
            want_n[r.event_type] += 1
            want_sum[r.event_type] += float(r.value)
    rows = sink_snapshot_merge_upsert(spark, SF_SMOKE).collect()
    assert {r.event_type: r.n_rows for r in rows} == dict(want_n)
    for r in rows:
        assert abs(r.sum_value - want_sum[r.event_type]) < 1e-2, r.event_type


def test_ltv_decay_matches_direct_sum(spark):
    import math as m

    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        LTV_HALF_LIFE_DAYS,
        ltv_time_decay,
    )

    evs = _events(spark)
    horizon = max(r.ts for r in evs)
    want = defaultdict(float)
    n = defaultdict(int)
    for r in evs:
        age = (horizon.date() - r.ts.date()).days
        want[r.user_id] += round(
            float(r.value) * 2 ** (-age / LTV_HALF_LIFE_DAYS), 6
        )
        n[r.user_id] += 1
    got = {r.user_id: r for r in ltv_time_decay(spark, SF_SMOKE).collect()}
    assert set(got) == set(want)
    for u in want:
        assert got[u].n_events == n[u]
        assert abs(got[u].decayed_value - want[u]) < 1e-3, u


def test_rolling_zscore_matches_direct_frames(spark):
    import math as m

    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        ZSCORE_CRIT,
        ZSCORE_FRAME,
        timeseries_rolling_zscore,
    )

    seqs = defaultdict(list)
    for r in _events(spark):
        seqs[r.user_id].append((r.ts, r.event_id, float(r.value)))
    got = {
        (r.user_id, r.event_id): (r.zscore, r.anomaly)
        for r in timeseries_rolling_zscore(spark, SF_SMOKE).collect()
    }
    checked = 0
    for u, evs in seqs.items():
        evs.sort()
        for i in range(len(evs)):
            frame = [v for _, _, v in evs[max(0, i - ZSCORE_FRAME) : i]]
            z_want = None
            if len(frame) >= 3:
                n_f = len(frame)
                sx = sum(frame)
                sxx = sum(x * x for x in frame)
                # same relative-variance floor as the engines (near-
                # constant frames cancel catastrophically)
                if n_f * sxx - sx * sx > 1e-9 * n_f * sxx:
                    mean = sx / n_f
                    var = (n_f * sxx - sx * sx) / (n_f * (n_f - 1))
                    z_want = (evs[i][2] - mean) / m.sqrt(var)
            z_got, a_got = got[(u, evs[i][1])]
            if z_want is None:
                assert z_got is None and a_got is False
            else:
                assert abs(z_got - z_want) < 1e-4, (u, i)
                assert a_got == (abs(z_want) > ZSCORE_CRIT)
                checked += 1
    assert checked > 100


def test_basket_rules_match_direct_counts(spark):
    from collections import Counter

    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        BASKET_MAX_PART,
        BASKET_MIN_SUPPORT,
        basket_association_rules,
    )

    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    baskets = defaultdict(set)
    for r in li:
        if r.l_partkey < BASKET_MAX_PART:
            baskets[r.l_orderkey].add(r.l_partkey)
    n_baskets = len({r.l_orderkey for r in li})
    part_cnt = Counter()
    pair_cnt = Counter()
    for items in baskets.values():
        s = sorted(items)
        for p in s:
            part_cnt[p] += 1
        for i, pa in enumerate(s):
            for pb in s[i + 1 :]:
                pair_cnt[(pa, pb)] += 1
    want = {k: v for k, v in pair_cnt.items() if v >= BASKET_MIN_SUPPORT}
    rows = basket_association_rules(spark, SF_SMOKE).collect()
    got = {(r.pa, r.pb): r for r in rows}
    assert set(got) == set(want)
    for (pa, pb), nb in want.items():
        g = got[(pa, pb)]
        assert g.n_both == nb
        assert abs(g.support - nb / n_baskets) < 1e-6
        assert abs(g.conf_a_to_b - nb / part_cnt[pa]) < 1e-6
        assert abs(g.lift - nb * n_baskets / (part_cnt[pa] * part_cnt[pb])) < 1e-4


def test_holt_matches_textbook_recurrence(spark):
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        HOLT_ALPHA,
        HOLT_BETA,
        timeseries_holt_linear,
    )

    seqs = defaultdict(list)
    for r in _events(spark):
        seqs[r.user_id].append((r.ts, r.event_id, float(r.value)))
    got = {r.user_id: r for r in timeseries_holt_linear(spark, SF_SMOKE).collect()}
    for u, evs in seqs.items():
        evs.sort()
        xs = [v for _, _, v in evs]
        if len(xs) < 2:
            assert u not in got
            continue
        l, b = xs[1], xs[1] - xs[0]
        for x in xs[2:]:
            nl = HOLT_ALPHA * x + (1 - HOLT_ALPHA) * (l + b)
            b = HOLT_BETA * (nl - l) + (1 - HOLT_BETA) * b
            l = nl
        g = got[u]
        assert g.n_events == len(xs)
        assert abs(g.level - l) < 1e-4, u
        assert abs(g.trend - b) < 1e-4, u
        assert abs(g.forecast_1 - (l + b)) < 1e-4, u


def test_kcore_matches_direct_peeling(spark):
    """Peel the co-purchase graph directly in Python and compare the
    surviving node set and within-core degrees; also assert the core
    PROPERTY (every member's core degree >= K) and maximality (no
    dropped node has >= K neighbors inside the core)."""
    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.relational3 import (
        _TRI_MAX_PART,
        KCORE_K,
        graph_kcore,
    )

    per_order = defaultdict(set)
    for r in (
        load_table(spark, SF_SMOKE, "lineitem")
        .filter(f"l_partkey < {_TRI_MAX_PART}")
        .select("l_orderkey", "l_partkey")
        .collect()
    ):
        per_order[r.l_orderkey].add(r.l_partkey)
    adj = defaultdict(set)
    for items in per_order.values():
        s = sorted(items)
        for i, u in enumerate(s):
            for v in s[i + 1 :]:
                adj[u].add(v)
                adj[v].add(u)
    alive = set(adj)
    while True:
        drop = {n for n in alive if len(adj[n] & alive) < KCORE_K}
        if not drop:
            break
        alive -= drop
    got = {r.part_id: r.core_degree for r in graph_kcore(spark, SF_SMOKE).collect()}
    assert set(got) == alive
    for n in alive:
        want_deg = len(adj[n] & alive)
        assert got[n] == want_deg and want_deg >= KCORE_K, n
    for n in set(adj) - alive:
        assert len(adj[n] & alive) < KCORE_K, n  # maximality


def test_decile_lift_matches_direct_computation(spark):
    """Gains/lift recomputed from per-user rollups with the same
    threshold-binning rule; plus the structural invariants (cum_gain
    ends at 1.0 from the top; user counts total)."""
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        LIFT_BINS,
        model_decile_lift,
    )

    per_user = defaultdict(lambda: [0.0, 0])
    for r in _events(spark):
        per_user[r.user_id][0] += float(r.value)
        if r.event_type == "purchase":
            per_user[r.user_id][1] = 1
    scores = sorted(s for s, _ in per_user.values())
    n = len(scores)

    def q(p):  # interpolated quantile, rounded 4dp like the engines
        rp = (n - 1) * p
        lo, hi = int(rp), min(int(rp) + 1, n - 1)
        frac = rp - int(rp)
        return round(scores[lo] + (scores[hi] - scores[lo]) * frac, 4)

    ts = [q(i / LIFT_BINS) for i in range(1, LIFT_BINS)]
    bins = defaultdict(lambda: [0, 0])
    for s, c in per_user.values():
        b = 1 + sum(1 for t in ts if s > t)
        bins[b][0] += 1
        bins[b][1] += c
    rows = model_decile_lift(spark, SF_SMOKE).collect()
    got = {r.decile: r for r in rows}
    assert {k: tuple(v) for k, v in bins.items()} == {
        r.decile: (r.n_users, r.n_converted) for r in rows
    }
    total_conv = sum(c for _, c in bins.values())
    base = total_conv / n
    cum = 0
    for r in rows:  # ordered decile DESC
        cum += r.n_converted
        assert abs(r.cum_gain - cum / total_conv) < 1e-6, r.decile
        assert abs(r.lift - (r.n_converted / r.n_users) / base) < 1e-4
    assert abs(rows[-1].cum_gain - 1.0) < 1e-9
    assert sum(r.n_users for r in rows) == n


def test_longest_streak_matches_direct_scan(spark):
    from datetime import timedelta

    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        events_longest_streak,
    )

    days = defaultdict(set)
    for r in _events(spark):
        days[r.user_id].add(r.ts.date())
    want = {}
    for u, ds in days.items():
        best_len, best_start = 0, None
        sds = sorted(ds)
        i = 0
        while i < len(sds):
            j = i
            while j + 1 < len(sds) and sds[j + 1] == sds[j] + timedelta(days=1):
                j += 1
            run = j - i + 1
            if run > best_len:
                best_len, best_start = run, sds[i]
            i = j + 1
        want[u] = (best_len, best_start.isoformat())
    got = {
        r.user_id: (r.longest_streak_days, r.streak_start)
        for r in events_longest_streak(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_seq_training_pairs_match_direct_scan(spark):
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        SEQ_CONTEXT,
        seq_next_event_training,
    )

    seqs = defaultdict(list)
    for r in _events(spark):
        seqs[r.user_id].append((r.ts, r.event_id, r.event_type))
    want = defaultdict(int)
    for evs in seqs.values():
        evs.sort()
        types = [t for _, _, t in evs]
        for i in range(SEQ_CONTEXT, len(types)):
            ctx = ">".join(types[i - SEQ_CONTEXT : i])
            want[(ctx, types[i])] += 1
    rows = seq_next_event_training(spark, SF_SMOKE).collect()
    got = {(r.context, r.label): r.n for r in rows}
    assert got == dict(want)
    per_ctx = defaultdict(float)
    for r in rows:
        per_ctx[r.context] += r.p_label
    for ctx, s in per_ctx.items():
        assert abs(s - 1.0) < 1e-4, ctx


def test_daily_percentiles_match_sorted_frames(spark):
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        timeseries_daily_percentiles,
    )

    per_day = defaultdict(list)
    for r in _events(spark):
        per_day[r.ts.date().isoformat()].append(float(r.value))
    got = {r.day: r for r in timeseries_daily_percentiles(spark, SF_SMOKE).collect()}
    assert set(got) == set(per_day)

    def q(vals, p):
        vals = sorted(vals)
        rp = (len(vals) - 1) * p
        lo, hi = int(rp), min(int(rp) + 1, len(vals) - 1)
        return vals[lo] + (vals[hi] - vals[lo]) * (rp - int(rp))

    for d, vals in per_day.items():
        g = got[d]
        assert g.n_events == len(vals)
        assert abs(g.p50 - q(vals, 0.5)) < 1e-3, d
        assert abs(g.p95 - q(vals, 0.95)) < 1e-3, d


def test_keyword_trend_counts_match_direct_scan(spark):
    from collections import Counter

    from etl_gcp_function_tmabrasil_spark.catalog import load_table
    from etl_gcp_function_tmabrasil_spark.queries.analytics import (
        TREND_TOP_WORDS,
        text_keyword_trend,
    )

    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    df = Counter()
    for ws in docs.values():
        for w in set(ws):
            df[w] += 1
    top = {
        w
        for w, _ in sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[
            :TREND_TOP_WORDS
        ]
    }
    weeks = sorted(
        {
            (r.ts.date() - __import__("datetime").timedelta(
                days=r.ts.date().weekday()
            )).isoformat()
            for r in _events(spark)
        }
    )
    want = Counter()
    for doc_id, ws in docs.items():
        wk = weeks[doc_id % len(weeks)]
        for w in ws:
            if w in top:
                want[(wk, w)] += 1
    got = {
        (r.week, r.word): r.n_occurrences
        for r in text_keyword_trend(spark, SF_SMOKE).collect()
    }
    assert got == dict(want)
