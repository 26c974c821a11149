"""The custom Python DataSource (cloudevent_jsonl) must deliver the
reference's defensive-parse semantics (/root/reference/main.py:6-9) as
a first-class spark.read format: malformed lines -> all-null rows,
absent keys -> nulls, string sizes -> long, one partition per file."""

from __future__ import annotations

import json

import pytest

from etl_gcp_function_tmabrasil_spark.sources import cloudevent_source, file_events
from etl_gcp_function_tmabrasil_spark.sources.cloudevent_source import (
    parse_event_line,
)


@pytest.fixture(scope="module")
def feed_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("feed")
    (d / "events-0.jsonl").write_text(
        "\n".join(
            [
                json.dumps(
                    {
                        "bucket": "b1",
                        "name": "minha-pasta/jan.xlsx",
                        "size": "2048",
                        "timeCreated": "2026-01-05T10:00:00Z",
                    }
                ),
                json.dumps({"bucket": "b1", "name": "minha-pasta/raw.csv", "size": "7"}),
                "{ not valid json",
            ]
        )
    )
    (d / "events-1.jsonl").write_text(
        "\n".join(
            [
                json.dumps({"name": "outra/fev.xlsx", "size": 9}),
                json.dumps({"bucket": "b2", "size": "oops"}),
                json.dumps({"bucket": "b2", "name": "minha-pasta/fev.xlsx", "size": "1"}),
            ]
        )
    )
    (d / "_SUCCESS").write_text("")  # metadata files must be skipped
    return d


def test_parse_line_defensive():
    assert parse_event_line("not json") == (None, None, None, None)
    assert parse_event_line("[1,2]") == (None, None, None, None)
    assert parse_event_line('{"bucket": 5, "name": null, "size": true}') == (
        None,
        None,
        None,
        None,
    )
    b, n, s, ts = parse_event_line(
        '{"bucket":"b","name":"x.xlsx","size":"42","timeCreated":"2026-01-01T00:00:00Z"}'
    )
    assert (b, n, s) == ("b", "x.xlsx", 42) and ts is not None


def test_read_feed_rows_and_nulls(spark, feed_dir):
    cloudevent_source.register(spark)
    df = spark.read.format("cloudevent_jsonl").load(str(feed_dir))
    rows = {(r.bucket, r.name, r.size) for r in df.collect()}
    assert rows == {
        ("b1", "minha-pasta/jan.xlsx", 2048),
        ("b1", "minha-pasta/raw.csv", 7),
        (None, None, None),  # malformed line -> all-null row
        (None, "outra/fev.xlsx", 9),  # absent bucket; int size tolerated
        ("b2", None, None),  # absent name; non-numeric size -> null
        ("b2", "minha-pasta/fev.xlsx", 1),
    }
    assert df.schema.simpleString() == (
        "struct<bucket:string,name:string,size:bigint,ts:timestamp>"
    )


def test_partition_per_file(spark, feed_dir):
    cloudevent_source.register(spark)
    df = spark.read.format("cloudevent_jsonl").load(str(feed_dir))
    assert df.rdd.getNumPartitions() == 2  # one per data file, _SUCCESS skipped


def test_reference_routing_on_source(spark, feed_dir):
    cloudevent_source.register(spark)
    df = spark.read.format("cloudevent_jsonl").load(str(feed_dir))
    accepted = {r.name for r in file_events.accept_filter(df).collect()}
    rejected = {r.name for r in file_events.reject_filter(df).collect()}
    assert accepted == {"minha-pasta/jan.xlsx", "minha-pasta/fev.xlsx"}
    assert rejected == {"minha-pasta/raw.csv", "outra/fev.xlsx", None}
    # accept + reject partition the feed exactly (main.py:12-16 dichotomy)
    assert file_events.accept_filter(df).count() + file_events.reject_filter(
        df
    ).count() == df.count()


def test_glob_filter_limits_files(spark, feed_dir):
    cloudevent_source.register(spark)
    df = (
        spark.read.format("cloudevent_jsonl")
        .option("pathGlobFilter", "events-0.jsonl")
        .load(str(feed_dir))
    )
    assert df.rdd.getNumPartitions() == 1
    assert df.count() == 3


def test_hidden_and_metadata_dirs_pruned(spark, tmp_path):
    # files under _spark_metadata/ or .hidden/ (basenames like '0' pass
    # the file-level check) must not be parsed as events
    import json

    feed = tmp_path / "feed"
    feed.mkdir()
    with open(feed / "ok.jsonl", "w") as f:
        f.write(json.dumps({"bucket": "b", "name": "minha-pasta/x.xlsx", "size": 1}) + "\n")
    meta = feed / "_spark_metadata"
    meta.mkdir()
    (meta / "0").write_text("not json at all")
    hidden = feed / ".hidden"
    hidden.mkdir()
    (hidden / "1").write_text("{}")

    df = (
        spark.read.format("cloudevent_jsonl")
        .load(str(feed))
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0].name == "minha-pasta/x.xlsx"


def test_stream_reader_incremental_admission(spark, tmp_path):
    """The streaming reader's file-count offsets must admit exactly the
    NEW files on a checkpoint-resumed run: chunk appended between runs
    → its rows appear once; already-committed chunks never replay."""
    feed = tmp_path / "feed"
    feed.mkdir()

    def write_chunk(i: int, names: list[str]) -> None:
        with open(feed / f"chunk_{i:03d}.jsonl", "w") as f:
            for n in names:
                f.write(
                    json.dumps(
                        {
                            "bucket": "b",
                            "name": n,
                            "size": "1",
                            "time": "2024-01-01T00:00:00Z",
                        }
                    )
                    + "\n"
                )

    write_chunk(0, ["a.xlsx", "b.xlsx"])
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")

    def run() -> None:
        q = (
            spark.readStream.format("cloudevent_jsonl")
            .load(str(feed))
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    run()
    first = sorted(r.name for r in spark.read.parquet(sink).collect())
    assert first == ["a.xlsx", "b.xlsx"]

    write_chunk(1, ["c.xlsx"])
    run()  # same checkpoint: only chunk_001 admitted
    second = sorted(r.name for r in spark.read.parquet(sink).collect())
    assert second == ["a.xlsx", "b.xlsx", "c.xlsx"]


def test_writer_round_trip_and_line_format(spark, tmp_path):
    """write -> read through the connector is exact, and the emitted
    JSONL mirrors the GCS payload shape: size as a decimal STRING,
    RFC 3339 timeCreated, null fields omitted entirely."""
    import datetime

    cloudevent_source.register(spark)
    rows = [
        ("b", "minha-pasta/a.xlsx", 123, datetime.datetime(2024, 1, 1)),
        ("b", "x.csv", 42, datetime.datetime(2024, 1, 2, 1, 4, 5)),
        (None, "y", None, None),
    ]
    df = spark.createDataFrame(rows, "bucket string, name string, size long, ts timestamp")
    out = tmp_path / "sink"
    out.mkdir()
    df.write.format("cloudevent_jsonl").mode("append").save(str(out))
    back = spark.read.format("cloudevent_jsonl").load(str(out))
    key = lambda t: str(t)  # rows contain Nones — sort on the repr
    assert sorted(map(tuple, back.collect()), key=key) == sorted(rows, key=key)
    lines = []
    for f in sorted(out.iterdir()):
        if not f.name.startswith((".", "_")):
            lines += [json.loads(l) for l in f.read_text().splitlines()]
    by_name = {l.get("name"): l for l in lines}
    assert by_name["minha-pasta/a.xlsx"]["size"] == "123"  # decimal string
    assert by_name["minha-pasta/a.xlsx"]["timeCreated"].startswith("2024-01-01T")
    assert set(by_name["y"]) == {"name"}  # null fields omitted


def test_writer_staging_is_invisible_and_overwrite_replaces(spark, tmp_path):
    """Two-phase commit hygiene: a leftover staged file from a failed
    attempt must never reach the reader (hidden-dir prune), and
    mode=overwrite replaces prior visible parts instead of appending."""
    cloudevent_source.register(spark)
    out = tmp_path / "sink"
    out.mkdir()
    df = spark.createDataFrame(
        [("b", "one", 1, None)], "bucket string, name string, size long, ts timestamp"
    )
    df.write.format("cloudevent_jsonl").mode("append").save(str(out))
    # plant residue as a crashed task attempt would leave it
    staging = out / ".staging"
    staging.mkdir()
    (staging / "task-dead.jsonl").write_text('{"name": "ghost"}\n')
    names = {r.name for r in
             spark.read.format("cloudevent_jsonl").load(str(out)).collect()}
    assert names == {"one"}, names
    df2 = spark.createDataFrame(
        [("b", "two", 2, None)], "bucket string, name string, size long, ts timestamp"
    )
    df2.write.format("cloudevent_jsonl").mode("overwrite").save(str(out))
    names = {r.name for r in
             spark.read.format("cloudevent_jsonl").load(str(out)).collect()}
    assert names == {"two"}, names
    assert not (out / ".staging").exists()  # commit swept the residue


def test_format_parse_roundtrip_property():
    """format_event_line ∘ parse_event_line == identity, property-based
    (no Spark in the loop — the pure line codec both halves of the
    connector share): arbitrary unicode names/buckets, the full long
    range for size, microsecond timestamps, and every null pattern."""
    import datetime

    from hypothesis import given, settings, strategies as st

    from etl_gcp_function_tmabrasil_spark.sources.cloudevent_source import (
        format_event_line,
        parse_event_line,
    )

    text = st.one_of(st.none(), st.text(max_size=40))
    size = st.one_of(st.none(), st.integers(min_value=-(2**63), max_value=2**63 - 1))
    ts = st.one_of(
        st.none(),
        st.datetimes(
            min_value=datetime.datetime(1900, 1, 1),
            max_value=datetime.datetime(2200, 1, 1),
        ),
    )

    @given(bucket=text, name=text, size=size, ts=ts)
    @settings(max_examples=300, deadline=None)
    def check(bucket, name, size, ts):
        got = parse_event_line(format_event_line(bucket, name, size, ts))
        # the codec identity is INSTANT-preserving: the writer anchors a
        # naive ts to an explicit instant (naive-assumes-local, the
        # inverse of PySpark's Arrow->Row conversion) and emits the
        # offset, the reader parses offset-aware — so the round trip is
        # ts.astimezone(utc), on any host timezone
        want_ts = (
            ts.astimezone(datetime.timezone.utc) if ts is not None else None
        )
        assert got == (bucket, name, size, want_ts), (
            got,
            (bucket, name, size, want_ts),
        )

    check()


def test_writer_abort_sweeps_staging(tmp_path):
    """The abort() half of the two-phase protocol (no Spark needed —
    the writer is a plain object): a task stages its file, the job
    aborts, and the staging dir with every attempt's residue is gone
    while nothing ever became visible."""
    from pyspark.sql import Row

    from etl_gcp_function_tmabrasil_spark.sources.cloudevent_source import (
        CloudEventWriter,
    )

    out = tmp_path / "sink"
    out.mkdir()
    w = CloudEventWriter({"path": str(out)}, overwrite=False)
    msg = w.write(iter([Row(bucket="b", name="n", size=1, ts=None)]))
    assert (out / ".staging").exists()
    w.abort([msg])
    assert not (out / ".staging").exists()
    assert [f.name for f in out.iterdir()] == []  # nothing visible


def test_format_line_is_host_timezone_independent():
    """The r7 advice finding: PySpark hands write() NAIVE local-time
    datetimes and the old codec re-read them as UTC — every round-
    tripped ts shifted by the host's UTC offset on non-UTC machines.
    Simulate a São Paulo host (UTC-3) and assert the emitted line
    carries the offset and parses back to the same instant."""
    import datetime
    import os
    import time

    from etl_gcp_function_tmabrasil_spark.sources.cloudevent_source import (
        format_event_line,
    )

    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = "America/Sao_Paulo"
    time.tzset()
    try:
        naive = datetime.datetime(2024, 1, 1, 12, 0, 0)  # local wall time
        line = format_event_line("b", "n", 1, naive)
        rendered = json.loads(line)["timeCreated"]
        # format_event_line always renders naive ts as UTC — the offset
        # is pinned, not host-dependent (instant equality checked below)
        assert rendered.endswith("+00:00"), rendered
        got = parse_event_line(line)[3]
        # the instant 12:00 São Paulo == 15:00 UTC, not 12:00 UTC
        assert got == naive.astimezone(datetime.timezone.utc)
        assert got == datetime.datetime(
            2024, 1, 1, 15, 0, 0, tzinfo=datetime.timezone.utc
        )
    finally:
        if old_tz is None:
            del os.environ["TZ"]
        else:
            os.environ["TZ"] = old_tz
        time.tzset()


def test_writer_append_does_not_clobber_prior_parts(spark, tmp_path):
    """Two .mode('append') writes into the same directory must
    accumulate: part names carry a per-job token, so the second job's
    part-00000 cannot os.replace() the first job's (the r7 advice
    silent-data-loss finding)."""
    cloudevent_source.register(spark)
    out = tmp_path / "sink"
    out.mkdir()
    schema = "bucket string, name string, size long, ts timestamp"
    spark.createDataFrame([("b", "one", 1, None)], schema).write.format(
        "cloudevent_jsonl"
    ).mode("append").save(str(out))
    spark.createDataFrame([("b", "two", 2, None)], schema).write.format(
        "cloudevent_jsonl"
    ).mode("append").save(str(out))
    names = {r.name for r in
             spark.read.format("cloudevent_jsonl").load(str(out)).collect()}
    assert names == {"one", "two"}, names
    visible = [f.name for f in out.iterdir() if not f.name.startswith((".", "_"))]
    assert len(visible) >= 2 and len(set(visible)) == len(visible), visible


def test_writer_commit_empty_result_creates_directory(tmp_path):
    """Zero input partitions => write() never runs; commit() must still
    succeed on a not-yet-existing directory (the r7 advice
    FileNotFoundError finding) and leave an empty readable sink."""
    from etl_gcp_function_tmabrasil_spark.sources.cloudevent_source import (
        CloudEventWriter,
    )

    out = tmp_path / "never-created"
    w = CloudEventWriter({"path": str(out)}, overwrite=True)
    w.commit([])  # must not raise
    assert out.is_dir()
    assert [f.name for f in out.iterdir() if not f.name.startswith((".", "_"))] == []
