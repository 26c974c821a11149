"""Property-based equivalence between the Spark accept/reject filters
and the reference's Python predicate (`/root/reference/main.py:12`):

    if not name or not name.endswith(".xlsx") \
              or not name.startswith("minha-pasta/"): reject

Hypothesis generates adversarial names (empty, unicode, prefix/suffix
near-misses, embedded nulls excluded by Spark's string model) and we
require the Spark filter pair to partition rows exactly as the
reference code does — including the accept/reject sets being an exact
disjoint cover.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from etl_gcp_function_tmabrasil_spark.sources.file_events import (
    accept_filter,
    reject_filter,
)

_INTERESTING = st.sampled_from(
    [
        None,
        "",
        "minha-pasta/a.xlsx",
        "minha-pasta/.xlsx",
        "minha-pasta/",
        "minha-pasta",
        "minha-pasta/sub/dir/b.xlsx",
        "MINHA-PASTA/a.xlsx",
        "minha-pasta/a.XLSX",
        "minha-pasta/a.xlsx ",
        " minha-pasta/a.xlsx",
        "outra-pasta/a.xlsx",
        "minha-pasta/a.xls",
        "minha-pasta/á✓.xlsx",
        ".xlsx",
        "xlsx",
    ]
)
_RANDOM = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
        max_size=40,
    ).map(lambda s: s if not s else s),
)
_NAMES = st.lists(_INTERESTING | _RANDOM, min_size=1, max_size=30)


def _reference_accepts(name: str | None) -> bool:
    # Verbatim logic of /root/reference/main.py:12 (not code copied —
    # a 1-line predicate restated for differential testing).
    return bool(name) and name.endswith(".xlsx") and name.startswith("minha-pasta/")


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(names=_NAMES)
def test_filters_match_reference_semantics(spark, names):
    rows = [(f"b{i}", n, i, None) for i, n in enumerate(names)]
    from etl_gcp_function_tmabrasil_spark.catalog import FILE_EVENTS_SCHEMA

    df = spark.createDataFrame(rows, FILE_EVENTS_SCHEMA)
    accepted = {r.size for r in accept_filter(df).collect()}
    rejected = {r.size for r in reject_filter(df).collect()}
    expected_accept = {i for i, n in enumerate(names) if _reference_accepts(n)}

    assert accepted == expected_accept
    assert rejected == set(range(len(names))) - expected_accept
    assert accepted.isdisjoint(rejected)
