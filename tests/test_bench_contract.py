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


def test_guard_trip_is_isolated_per_query(monkeypatch):
    """A guard trip (or any per-query failure) records a null sentinel
    and benching continues — r12's artifact came back parsed:null
    because one false-positive trip crashed the whole run."""

    def boom(spark, fn, name, sf_dir):
        raise bench.ConstructionGuardTripped(f"{name}: eager")

    monkeypatch.setattr(bench, "_time_query", boom)
    errors: dict[str, str] = {}
    got = bench._time_query_isolated(None, None, "q_fake", "/tmp", errors)
    assert got == (None, None)
    assert "q_fake" in errors and "eager" in errors["q_fake"]


def test_stdout_line_fits_with_null_sentinels():
    """null entries (failed queries) must keep the stdout line parseable
    and inside the capture window."""
    names = list(bench.HEADLINE) + ["stream_tumbling_e2e"]
    timings = {name: (None if i % 7 == 0 else 9999.999) for i, name in enumerate(names)}
    payload = {
        "metric": "headline_queries_total_time",
        "value": round(sum(v for v in timings.values() if v is not None), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
    }
    line = json.dumps(payload, separators=(",", ":"))
    assert len(line.encode()) <= DRIVER_TAIL_BYTES - HEADROOM
    assert json.loads(line)["queries"][names[0]] is None


def test_construction_floor_is_absolute():
    """The strike threshold floor is an absolute constant, not a
    multiple of a fast query's execution time (the r12 false-positive
    mechanism: 3 × 0.41 s execution = 1.23 s bar, inside ordinary
    driver-host stall range)."""
    assert bench._CONSTRUCT_FLOOR_S >= 2.5


def test_scale_probe_line_fits_and_set_is_benched():
    """The r16 opt-in scale-probe mode prints its own dedicated compact
    line; it must fit the driver tail window at worst case, and its
    query set must be real bench entries (so sf0.1 numbers exist to
    sanity-check the probe against)."""
    line = json.dumps(
        {
            "metric": "scale_probe_total_time",
            "value": 49999.995,
            "unit": "sec",
            "queries": {n: 9999.999 for n in bench.SCALE_PROBE},
            "sf": "sf1_probe",
            "cpus": 32,
        },
        separators=(",", ":"),
    )
    assert len(line.encode()) <= DRIVER_TAIL_BYTES - HEADROOM
    assert set(bench.SCALE_PROBE) <= set(bench.HEADLINE) | set(bench.EXTENDED)


def test_extended_list_registered_and_disjoint():
    """EXTENDED entries must be real registered queries, disjoint from
    HEADLINE (they exist precisely because HEADLINE is at stdout
    capacity), and lazy-appropriate names only — the eager gates live
    in scripts/bench_gate_sf01.py."""
    from etl_gcp_function_tmabrasil_spark.queries import all_queries

    names = set(all_queries())
    assert set(bench.EXTENDED) <= names
    assert not set(bench.EXTENDED) & set(bench.HEADLINE)
