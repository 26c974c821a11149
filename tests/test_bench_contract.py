"""Pin the bench.py stdout contract against the driver's capture window.

The driver records only a ~2 KB tail of bench.py's stdout and parses the
final JSON line out of it. Round 6 shipped a line carrying both the min
and median maps (34 entries each); it outgrew the window, the head of
the line was cut, and the driver recorded ``parsed: null`` — the first
round with no machine-readable bench numbers. bench.py now prints one
compact min-only line and writes the full record (including medians) to
BENCH_LOCAL.json; these tests keep the stdout line inside the window at
its worst-case width so the regression cannot silently return as
HEADLINE grows.
"""

from __future__ import annotations

import json

import bench

# The driver's tail capture, minus headroom for a trailing newline and
# any stray final stderr-free output.
DRIVER_TAIL_BYTES = 2048
HEADROOM = 256


def _worst_case_stdout_line() -> str:
    # Every timing at its widest plausible 3-decimal rendering: a
    # four-digit-seconds query would itself be a bench failure long
    # before it breaks the capture window.
    names = list(bench.HEADLINE) + ["stream_tumbling_e2e"]
    timings = {name: 9999.999 for name in names}
    payload = {
        "metric": "headline_queries_total_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
    }
    return json.dumps(payload, separators=(",", ":"))


def test_stdout_line_fits_driver_tail_capture():
    line = _worst_case_stdout_line()
    assert len(line.encode()) <= DRIVER_TAIL_BYTES - HEADROOM, (
        f"bench stdout line would be {len(line)} bytes at worst case — "
        f"over the driver's {DRIVER_TAIL_BYTES}B tail window (minus "
        f"{HEADROOM}B headroom). Trim HEADLINE or move per-query detail "
        "to BENCH_LOCAL.json."
    )


def test_stdout_line_is_parseable_and_min_only():
    line = _worst_case_stdout_line()
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_time"
    assert "queries_median" not in parsed, (
        "medians belong in BENCH_LOCAL.json, not the driver stdout line"
    )
    assert set(parsed) == {"metric", "value", "unit", "queries", "sf"}


def test_extended_list_registered_and_disjoint():
    """EXTENDED entries must be real registered queries, disjoint from
    HEADLINE (they exist precisely because HEADLINE is at stdout
    capacity), and lazy-appropriate names only — the eager gates live
    in scripts/bench_gate_sf01.py."""
    from etl_gcp_function_tmabrasil_spark.queries import all_queries

    names = set(all_queries())
    assert set(bench.EXTENDED) <= names
    assert not set(bench.EXTENDED) & set(bench.HEADLINE)
