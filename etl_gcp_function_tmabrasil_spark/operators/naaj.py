"""Null-aware NOT IN as a broadcast-hash composition.

SQL `key NOT IN (subquery)` keeps a row iff `key <> b` is TRUE for
EVERY subquery value b — so a NULL key is dropped whenever the subquery
is non-empty (`NULL = b` is never false-for-all), and ANY NULL subquery
value empties the whole result. A bare left_anti gets both edge cases
backwards (keeps null-keyed left rows, ignores null build keys), and
Spark's own rewrite of the OR-of-nulls join condition is a
BroadcastNestedLoopJoin — O(|left| × |build|) comparisons.

This operator keeps the broadcast-HASH anti join as the hot path and
settles the two null edge cases with a one-row flag frame joined as a
broadcast scalar (the same trick TPC-H Q11 uses for its HAVING
threshold), so the plan is: one hash anti join + one 1-row broadcast
nested loop — scale-safe for any left size and any build side small
enough to broadcast (NOT IN subqueries in analytic queries are
selective dimension filters; a build side too big to broadcast should
be a shuffled anti join plus the same flag frame).

Reference parity: re-expresses the null-aware NOT IN semantics the
reference's query surface implies (reference main.py:1-17 delegates all
transformation semantics to its ETL placeholder; SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def not_in(left: DataFrame, key: Column | str, build: DataFrame) -> DataFrame:
    """Filter `left` to rows whose `key` is SQL-`NOT IN` the single
    column of `build`.

    Exact NOT IN semantics, including the null edge cases:

    - build empty        → every left row kept (even NULL keys);
    - any NULL in build  → empty result;
    - otherwise          → NULL-keyed left rows dropped, non-null keys
                           kept iff absent from build.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    bcol_name = build.columns[0]
    flags = build.agg(
        F.count(F.lit(1)).alias("__nin_n"),
        F.coalesce(
            F.max(F.col(bcol_name).isNull().cast("int")), F.lit(0)
        ).alias("__nin_has_null"),
    )
    nn = build.dropna()
    return (
        left.join(F.broadcast(nn), key_col == nn[bcol_name], "left_anti")
        .join(F.broadcast(flags))
        .filter(
            (F.col("__nin_has_null") == 0)
            & (key_col.isNotNull() | (F.col("__nin_n") == 0))
        )
        .drop("__nin_n", "__nin_has_null")
    )
