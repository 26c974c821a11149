"""CORRECTNESS_CUMULATIVE.json — the committed ledger of each query's
latest driver-green round (see scripts/merge_correctness_ledger.py).
These pins make the "every registered query has a green record" claim
checkable from the repo instead of from verdict prose."""

from __future__ import annotations

import json
import os

from etl_gcp_function_tmabrasil_spark.queries import all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(REPO, "CORRECTNESS_CUMULATIVE.json")


def _ledger() -> dict:
    with open(LEDGER) as fh:
        return json.load(fh)


def test_ledger_covers_every_registered_query():
    led = _ledger()
    names = set(all_queries())
    missing = sorted(names - set(led["queries"]))
    assert not missing, f"queries with no ledger entry: {missing}"
    stale = sorted(set(led["queries"]) - names)
    assert not stale, f"ledger entries for unregistered queries: {stale}"
    assert led["n_queries"] == len(names)


def test_every_entry_is_green_or_documented():
    # each entry either points at an on-disk green artifact row, or
    # carries a note documenting the prose-sourced/pending record —
    # silence is the one thing the ledger must not contain
    led = _ledger()
    bad = []
    for name, e in led["queries"].items():
        if e.get("round") is not None:
            art = os.path.join(REPO, e["artifact"])
            if os.path.exists(art):
                with open(art) as fh:
                    row = json.load(fh)[name]
                if not (
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match")
                    and row.get("err") is None
                ):
                    bad.append(f"{name}: artifact row not green")
        elif not e.get("note"):
            bad.append(f"{name}: no green round and no note")
    assert not bad, bad


def test_pending_notes_match_window_membership():
    # a query noted "first driver check pending" must actually sit in
    # the 50-entry window the driver checks; one noted "outside the
    # window" must not — the notes and the rotation can't drift apart
    window = set(list(all_queries())[:50])
    led = _ledger()
    for name, e in led["queries"].items():
        note = e.get("note", "")
        if "first driver check pending" in note:
            assert name in window, f"{name} noted pending but not in window"
        if "outside the full r5 window" in note:
            assert name not in window, f"{name} noted outside but in window"


def test_check_window_is_exactly_fifty_unique_entries():
    # the driver checks the FIRST 50 of queries() — a 49/51-entry
    # _CHECK_FIRST or a duplicate would silently shift which queries
    # earn this round's records
    from etl_gcp_function_tmabrasil_spark.queries import _CHECK_FIRST

    assert len(_CHECK_FIRST) == 50, len(_CHECK_FIRST)
    assert len(set(_CHECK_FIRST)) == 50, "duplicate names in _CHECK_FIRST"
