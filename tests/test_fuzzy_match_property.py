"""Property test for the FastSS deletion-neighborhood fuzzy join: on
random string corpora (short alphabet → dense near-collisions), the
banded candidate generation + levenshtein verify must return EXACTLY
the quadratic all-pairs answer — recall 1.0 at edit distance ≤ 1 is a
pigeonhole theorem, so any miss is a bug, not noise.

The Spark core is exercised through a corpus written as a customer
table (fuzzy_name_match reads customer.c_name); the reference answer is
computed in-process with python-Levenshtein-free DP.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st


def _lev(a: str, b: str) -> int:
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    names=st.lists(
        st.text(alphabet="abc0", min_size=1, max_size=6),
        min_size=2,
        max_size=40,
        unique=True,
    )
)
def test_fastss_matches_quadratic_reference(spark, tmp_path_factory, names):
    from etl_gcp_function_tmabrasil_spark.queries.dedup_approx import (
        fuzzy_name_match,
    )

    tmp = tmp_path_factory.mktemp("fuzzy")
    df = spark.createDataFrame([(n,) for n in names], "c_name: string")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp / "customer.parquet"))
    rows = fuzzy_name_match(spark, str(tmp)).collect()
    got = {(r.name1, r.name2, r.dist) for r in rows}
    # the operator emits each pair exactly once BY CONSTRUCTION (single
    # shared (pos, v) bucket per substitution pair; distinct indel leg;
    # disjoint legs) — a duplicate row would break the driver's value
    # hash even though the set compare below can't see it
    assert len(rows) == len(got), "duplicate candidate pairs emitted"
    want = {
        (a, b, _lev(a, b))
        for a in names
        for b in names
        if a < b and _lev(a, b) <= 1
    }
    assert got == want
