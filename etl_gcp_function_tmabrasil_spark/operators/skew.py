"""Skew-mitigation operators: salted aggregation and salted broadcast-
replicated joins (SURVEY.md §2.2 "Partitioning & shuffle: skewed keys
hurt … salting for skew").

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
our session factory) handles most skew at runtime; these explicit
operators are for the cases AQE can't fix:
- a single hot GROUP BY key whose partial aggregate still lands on one
  reducer → two-phase salted aggregation,
- a hot join key against a dimension too big to broadcast whole but
  small enough to replicate N× → salt-replicated join.

Both are exact (not approximations): salting only re-associates an
associative aggregate / replicates the build side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, n_salts: int, salt_from: str | Column) -> DataFrame:
    """Add a deterministic `_salt` in [0, n_salts) derived from an
    existing column — deterministic so re-runs and oracle comparisons
    are stable (no rand())."""
    c = F.col(salt_from) if isinstance(salt_from, str) else salt_from
    return df.withColumn("_salt", F.pmod(F.xxhash64(c), F.lit(n_salts)))


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    n_salts: int = 16,
    salt_from: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation: groupBy(keys+salt) → groupBy(keys).

    Phase 1 spreads a hot key across ``n_salts`` reducers; phase 2
    combines the ≤ n_salts partials per key — exact for sum/count (and
    any associative+commutative aggregate). Returns keys + sum_value +
    n_rows. The value sum is decimal-accumulated so the two-phase
    re-association cannot change the result.
    """
    salt_src = salt_from or value_col
    salted = with_salt(df, n_salts, salt_src)
    partial = salted.groupBy(*keys, "_salt").agg(
        F.sum(F.col(value_col).cast("decimal(28,6)")).alias("_psum"),
        F.count(F.lit(1)).alias("_pcnt"),
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.sum("_psum").cast("double").alias("sum_value"),
            F.sum("_pcnt").alias("n_rows"),
        )
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    salt_from: str | None = None,
) -> DataFrame:
    """Skew-proof equi-join: salt the fact side, replicate the dim side
    ``n_salts``×, join on (key, salt).

    A hot fact key that would overload one join task is spread across
    ``n_salts`` tasks; the dim replication is the price (use only when
    dim is too big to broadcast but small enough to replicate). Exact:
    every fact row still matches exactly its key's dim rows.
    """
    salt_src = salt_from or key
    f = with_salt(fact, n_salts, salt_src)
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    d = dim.withColumn("_salt", F.explode(salts))
    return f.join(d, [key, "_salt"]).drop("_salt")
