"""Local mirror of the driver's DuckDB-oracle comparison: run a Spark
query and its oracle SQL on the same parquet tables, compare row count,
column-name set, and order-insensitive values (strict: exact equality on
canonically sorted frames). If this passes, any reasonable value-hash
comparison passes too.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from etl_gcp_function_tmabrasil_spark.catalog import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def compare(spark_df, oracle_df: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(oracle_df.columns):
        problems.append(
            f"{name}: column mismatch spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(sp) != len(oracle_df):
        problems.append(f"{name}: row count spark={len(sp)} oracle={len(oracle_df)}")
        return problems
    a, b = _canon(sp), _canon(oracle_df)
    for c in a.columns:
        # The driver's value-hash is dtype-sensitive: int64 108559452 and
        # float64 108559452.0 hash differently even though == passes. A
        # DuckDB HUGEINT (→ float64/object in pandas) vs Spark BIGINT is
        # therefore a real failure; mirror that strictness here.
        ak, bk = a[c].dtype.kind, b[c].dtype.kind
        int_kinds = {"i", "u"}
        if (ak in int_kinds) != (bk in int_kinds) and {ak, bk} <= int_kinds | {"f", "O"}:
            problems.append(
                f"{name}: column {c}: dtype kind mismatch spark={a[c].dtype} "
                f"oracle={b[c].dtype} (cast the oracle integer agg to BIGINT)"
            )
            continue
        av, bv = a[c].tolist(), b[c].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if not _values_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"{name}: column {c}: {len(bad)}/{len(av)} values differ; "
                f"first at sorted-row {i}: spark={x!r} oracle={y!r}"
            )
    return problems
