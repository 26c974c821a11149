"""operators/naaj.not_in — exact SQL `NOT IN` semantics, including the
null edge cases no parquet fixture exercises (DuckDB cross-check on the
same literal frames is the oracle)."""

import duckdb
import pytest


def _run(spark, left_keys, build_keys):
    left = spark.createDataFrame([(k,) for k in left_keys], "k int")
    build = spark.createDataFrame([(b,) for b in build_keys], "b int")
    from etl_gcp_function_tmabrasil_spark.operators.naaj import not_in

    return sorted(r.k for r in not_in(left, "k", build).collect())


def _oracle(left_keys, build_keys):
    con = duckdb.connect()
    lv = ", ".join("(NULL::INT)" if k is None else f"({k})" for k in left_keys)
    bv = ", ".join("(NULL::INT)" if b is None else f"({b})" for b in build_keys)
    sql = f"SELECT k FROM (VALUES {lv}) l(k) WHERE k NOT IN (SELECT b FROM (VALUES {bv}) r(b))"
    if not build_keys:
        sql = f"SELECT k FROM (VALUES {lv}) l(k) WHERE k NOT IN (SELECT 1 WHERE false)"
    return sorted(r[0] for r in con.execute(sql).fetchall())


CASES = [
    # plain: non-null everywhere
    ([1, 2, 3, 4], [2, 4]),
    # NULL left key, non-empty build → NULL row dropped
    ([1, None, 3], [3]),
    # NULL in build → empty result
    ([1, 2, 3], [2, None]),
    # NULL in build AND NULL left key → still empty
    ([1, None], [None]),
]


@pytest.mark.parametrize("left_keys,build_keys", CASES)
def test_not_in_matches_sql(spark, left_keys, build_keys):
    assert _run(spark, left_keys, build_keys) == _oracle(left_keys, build_keys)


def test_not_in_empty_build_keeps_all_including_null(spark):
    # SQL: NOT IN over an empty subquery keeps every row, NULL keys too
    # (can't route through DuckDB VALUES, so the expectation is inline)
    left = spark.createDataFrame([(1,), (None,)], "k int")
    build = spark.createDataFrame([], "b int")
    from etl_gcp_function_tmabrasil_spark.operators.naaj import not_in

    got = [r.k for r in not_in(left, "k", build).collect()]
    assert sorted(x for x in got if x is not None) == [1] and None in got


def test_not_in_plan_is_hash_anti_not_bnlj_on_data_side(spark):
    # the data-sized join must stay a broadcast-HASH anti join; the only
    # nested-loop join allowed is the 1-row flag frame
    left = spark.createDataFrame([(i,) for i in range(100)], "k int")
    build = spark.createDataFrame([(2,), (3,)], "b int")
    from etl_gcp_function_tmabrasil_spark.operators.naaj import not_in

    plan = not_in(left, "k", build)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


from hypothesis import HealthCheck, given, settings, strategies as st


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left_keys=st.lists(st.one_of(st.none(), st.integers(0, 6)), max_size=12),
    build_keys=st.lists(st.one_of(st.none(), st.integers(0, 6)), max_size=8),
)
def test_not_in_property(spark, left_keys, build_keys):
    # pure-Python NOT IN semantics as the reference: row kept iff
    # `k <> b` is TRUE for every b (vacuously true over an empty build)
    def ref(left, build):
        out = []
        for k in left:
            if not build:
                out.append(k)
                continue
            if k is None or any(b is None for b in build) or k in build:
                continue
            out.append(k)
        return sorted(x for x in out if x is not None), sum(
            1 for x in out if x is None
        )

    left = spark.createDataFrame([(k,) for k in left_keys] or [(0,)], "k int")
    if not left_keys:
        left = left.filter("k is null and k is not null")  # empty, typed
    build = spark.createDataFrame([(b,) for b in build_keys] or [(0,)], "b int")
    if not build_keys:
        build = build.filter("b is null and b is not null")
    from etl_gcp_function_tmabrasil_spark.operators.naaj import not_in

    got = [r.k for r in not_in(left, "k", build).collect()]
    got_canon = (sorted(x for x in got if x is not None),
                 sum(1 for x in got if x is None))
    assert got_canon == ref(left_keys, build_keys)
