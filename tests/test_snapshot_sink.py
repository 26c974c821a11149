"""Snapshot-isolated manifest sink (sinks/snapshot.py): time travel,
append vs overwrite lineage, crashed-commit invisibility, and the
version-resolution errors. The oracle gate
(sink_snapshot_time_travel) proves values; these pin the protocol."""

from __future__ import annotations

import json
import os

import pytest

from etl_gcp_function_tmabrasil_spark.sinks.snapshot import (
    commit_snapshot,
    read_snapshot,
)


def _ids(spark, table, version=None):
    return sorted(
        r.id for r in read_snapshot(spark, str(table), version).collect()
    )


def test_append_overwrite_and_time_travel(spark, tmp_path):
    table = tmp_path / "t"
    df = lambda lo, hi: spark.range(lo, hi)
    assert commit_snapshot(df(0, 3), str(table)) == 1
    assert commit_snapshot(df(3, 5), str(table), mode="append") == 2
    assert commit_snapshot(df(10, 12), str(table), mode="overwrite") == 3
    # newest = the overwrite; every older version still readable
    assert _ids(spark, table) == [10, 11]
    assert _ids(spark, table, version=1) == [0, 1, 2]
    assert _ids(spark, table, version=2) == [0, 1, 2, 3, 4]
    assert _ids(spark, table, version=3) == [10, 11]


def test_orphans_and_manifest_temps_are_invisible(spark, tmp_path):
    table = tmp_path / "t"
    commit_snapshot(spark.range(0, 4), str(table))
    # crashed commit: data files written, manifest never renamed in
    spark.range(100, 105).write.parquet(str(table / "data" / "orphan"))
    (table / ".manifest_v2.json.tmp").write_text('{"version": 2, "files')
    assert _ids(spark, table) == [0, 1, 2, 3]
    # the next successful commit numbers past the temp, not from it
    assert commit_snapshot(
        spark.range(4, 6), str(table), mode="append"
    ) == 2
    assert _ids(spark, table) == [0, 1, 2, 3, 4, 5]


def test_version_resolution_errors(spark, tmp_path):
    table = tmp_path / "t"
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, str(table))
    commit_snapshot(spark.range(0, 2), str(table))
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, str(table), version=7)
    with pytest.raises(ValueError):
        commit_snapshot(spark.range(0, 1), str(table), mode="merge")


def test_manifest_lists_files_not_directories(spark, tmp_path):
    """The reader must hand Spark an explicit FILE list (never list
    the data dir), so a snapshot read plans only its own files."""
    table = tmp_path / "t"
    commit_snapshot(spark.range(0, 3), str(table))
    with open(table / "manifest_v1.json") as fh:
        m = json.load(fh)
    assert m["files"], "empty manifest"
    for f in m["files"]:
        assert f.endswith(".parquet") and os.path.isfile(f), f


def test_snapshot_lineage_property(spark, tmp_path):
    """Property: after ANY sequence of append/overwrite commits, every
    version v reads back exactly the fold of the commit history up to
    v (overwrite resets, append accumulates) — no version ever sees a
    later commit's rows or loses an earlier one. Drives randomized
    sequences with a fixed seed (hypothesis would re-create Spark
    fixtures per example; a seeded loop keeps one session)."""
    import random

    rng = random.Random(17)
    for trial in range(4):
        table = tmp_path / f"t{trial}"
        expected: list[list[int]] = []  # per version: the id set
        nxt = 0
        for _ in range(rng.randint(2, 6)):
            n = rng.randint(1, 4)
            ids = list(range(nxt, nxt + n))
            nxt += n
            mode = rng.choice(["append", "overwrite"])
            df = spark.createDataFrame([(i,) for i in ids], "id long")
            v = commit_snapshot(df, str(table), mode=mode)
            prev = expected[-1] if (mode == "append" and expected) else []
            expected.append(sorted(prev + ids))
            assert v == len(expected)
        for v, want in enumerate(expected, start=1):
            assert _ids(spark, table, version=v) == want, (trial, v)
        assert _ids(spark, table) == expected[-1]
