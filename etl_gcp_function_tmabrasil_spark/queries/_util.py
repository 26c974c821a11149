"""Shared helpers for oracle-parity-safe query construction.

Cross-engine determinism rules (SURVEY.md §7.3 "oracle parity details"):

- **Double sums** are order-dependent in floating point; Spark's partial
  aggregation and DuckDB's sequential scan sum in different orders. We cast
  each addend to a fixed-scale DECIMAL first (exact, associative), sum
  exactly, then cast the final value back to DOUBLE. The double→decimal
  rounding step is itself deterministic across engines: decimal midpoints
  at scale ≥ 1 are not exactly representable in binary, so HALF_UP vs
  HALF_EVEN never disagree on real data.
- **Averages** are computed as exact-decimal-sum / count in double — one
  deterministic division.
- **Timestamps** are rendered to strings (``yyyy-MM-dd [HH:mm:ss]``) with
  the session pinned to UTC, matching DuckDB's naive timestamps.
- **Top-k** always carries a unique tiebreaker key in the ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from etl_gcp_function_tmabrasil_spark.catalog import load_table  # noqa: F401  (re-export)


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Deterministic double sum: exact decimal accumulate, double out."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 4) -> Column:
    """Deterministic double average: exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(F.lit(1))


def day(col: Column | str) -> Column:
    """Render a timestamp column as a 'yyyy-MM-dd' string (UTC session)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd")


def second(col: Column | str) -> Column:
    """Render a timestamp column as 'yyyy-MM-dd HH:mm:ss' string."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


from etl_gcp_function_tmabrasil_spark.functions.text import hash60  # noqa: F401  (re-export)


#: DuckDB twin of :func:`hash60` — format with the input SQL expression.
SQL_HASH60 = "(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"

# DuckDB-side equivalents, for use inside oracle SQL strings.
SQL_DSUM = "CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"
SQL_DAY = "strftime({col}, '%Y-%m-%d')"
SQL_SECOND = "strftime({col}, '%Y-%m-%d %H:%M:%S')"
