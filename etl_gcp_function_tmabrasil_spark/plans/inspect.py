"""Physical-plan inspection: the guardrails that keep every operator
100 TB-shaped (SURVEY.md §4.2, north star "design every operator for
100 TB scale").

These read the formatted explain output — the same text `df.explain
("formatted")` prints — and answer the questions that decide whether a
plan survives a 1000× scale-up:

- did the filter reach the parquet scan (PushedFilters)?
- did column pruning reach the scan (ReadSchema)?
- did the small side broadcast (BroadcastHashJoin) instead of shuffling?
- is top-k a TakeOrderedAndProject (no global sort)?
- how many shuffles (Exchange) does the plan pay?

Used by tests/test_plans.py to pin the plan shapes of the headline
queries — a perf regression that reintroduces a shuffle or loses
pushdown fails CI even though results stay correct.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what df.explain(mode) prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans (flattened)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        entries = [e.strip() for e in m.group(1).split(",") if e.strip()]
        out.extend(entries)
    return out


def scan_read_schema(df: DataFrame, table_hint: str | None = None) -> list[str]:
    """Column names in the scans' ReadSchema (column-pruning witness).
    With `table_hint`, only scans whose Location mentions it count."""
    text = explain_str(df)
    cols: list[str] = []
    for scan in re.finditer(
        r"Location:[^\n]*?([^\n]*)\n(?:[^\n]*\n)*?[^\n]*ReadSchema: struct<([^>]*)>",
        text,
    ):
        loc, schema = scan.group(1), scan.group(2)
        if table_hint and table_hint not in loc:
            continue
        cols.extend(f.split(":")[0].strip() for f in schema.split(",") if f.strip())
    return cols


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in explain_str(df)


def count_sorts(df: DataFrame) -> int:
    """Sort nodes in the pre-AQE physical plan. Global range-partitioned
    sorts and sort-merge-join local sorts both count — use 0 to pin a
    plan as fully sort-free (pure projection / hash-agg pipelines)."""
    text = explain_str(df)
    return len(re.findall(r"^\(\d+\) Sort\s*$", text, flags=re.MULTILINE))


def count_windows(df: DataFrame) -> int:
    """Window nodes in the pre-AQE physical plan (WindowGroupLimit not
    counted — that node is the rank-limit pushdown that makes a top-k
    window cheap, not a cost)."""
    text = explain_str(df)
    return len(re.findall(r"^\(\d+\) Window\s*$", text, flags=re.MULTILINE))


def has_window_group_limit(df: DataFrame) -> bool:
    """True when the rank-limit pushdown (WindowGroupLimit) fired —
    per-group top-k keeps only k rows per partition before the window
    sort instead of ranking every row."""
    return "WindowGroupLimit" in explain_str(df)


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the pre-AQE physical plan (broadcast
    exchanges excluded — those are the cheap kind). Counts the numbered
    node entries of the formatted explain."""
    text = explain_str(df)
    return len(re.findall(r"^\(\d+\) Exchange\s*$", text, flags=re.MULTILINE))
