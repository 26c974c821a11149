"""The reference's complete intended pipeline, end-to-end: xlsx files
land in a bucket dir, CloudEvents land in a landing dir, the streaming
ETL ingests exactly the accepted objects and loads them into the
BigQuery-shaped sink (parquet fallback locally)."""

from __future__ import annotations

import json

from etl_gcp_function_tmabrasil_spark.catalog import load_table
from etl_gcp_function_tmabrasil_spark.sinks.bigquery import BigQuerySink
from etl_gcp_function_tmabrasil_spark.sources.xlsx import write_minimal_xlsx
from etl_gcp_function_tmabrasil_spark.streaming.pipeline import run_xlsx_etl_pipeline
from tests.conftest import SF_SMOKE

COLS = ["event_id", "user_id", "event_type", "value"]
DDL = "event_id long, user_id long, event_type string, value double"


def test_xlsx_etl_to_sink(spark, tmp_path):
    bucket = tmp_path / "bucket"
    (bucket / "minha-pasta").mkdir(parents=True)
    landing = tmp_path / "landing"
    landing.mkdir()
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select(*COLS)
        .orderBy("event_id")
        .limit(60)
        .collect()
    )
    # two accepted workbooks + one decoy outside the prefix
    write_minimal_xlsx(
        str(bucket / "minha-pasta" / "a.xlsx"),
        COLS,
        [[r.event_id, r.user_id, r.event_type, r.value] for r in ev[:30]],
    )
    write_minimal_xlsx(
        str(bucket / "minha-pasta" / "b.xlsx"),
        COLS,
        [[r.event_id, r.user_id, r.event_type, r.value] for r in ev[30:]],
    )
    write_minimal_xlsx(
        str(bucket / "decoy.xlsx"), COLS, [[999999, 1, "bad", 1.0]]
    )
    events = [
        {"bucket": "bucket", "name": "minha-pasta/a.xlsx", "size": 1, "ts": "2024-01-01T00:00:00Z"},
        {"bucket": "bucket", "name": "minha-pasta/b.xlsx", "size": 1, "ts": "2024-01-01T00:01:00Z"},
        {"bucket": "bucket", "name": "decoy.xlsx", "size": 1, "ts": "2024-01-01T00:02:00Z"},
        {"bucket": "bucket", "name": None, "size": 1, "ts": "2024-01-01T00:03:00Z"},
    ]
    with open(landing / "ev.json", "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")

    sink = BigQuerySink(warehouse_dir=str(tmp_path / "warehouse"))
    q = run_xlsx_etl_pipeline(
        spark, str(landing), str(bucket), sink, "analytics.events_ingested", COLS, DDL
    )
    q.awaitTermination(120)

    loaded = sink.read(spark, "analytics.events_ingested")
    got = {r.event_id: (r.user_id, r.event_type, r.value) for r in loaded.collect()}
    want = {r.event_id: (r.user_id, r.event_type, r.value) for r in ev}
    assert got == want, "sink content != accepted workbook rows"
    assert 999999 not in got, "decoy outside minha-pasta/ was ingested"
    assert dict(loaded.dtypes)["value"] == "double"


def test_xlsx_etl_many_landing_files_batched(spark, tmp_path):
    """A few hundred single-event landing files under a small
    maxFilesPerTrigger: multiple micro-batches, each ingesting only its
    admitted slice, exactly-once overall."""
    n_files = 300
    bucket = tmp_path / "bucket"
    (bucket / "minha-pasta").mkdir(parents=True)
    landing = tmp_path / "landing"
    landing.mkdir()
    for i in range(n_files):
        write_minimal_xlsx(
            str(bucket / "minha-pasta" / f"f{i:04d}.xlsx"),
            COLS,
            [[i, i % 7, "click", float(i)]],
        )
        with open(landing / f"ev{i:04d}.json", "w") as f:
            f.write(
                json.dumps(
                    {
                        "bucket": "bucket",
                        "name": f"minha-pasta/f{i:04d}.xlsx",
                        "size": 1,
                        "ts": "2024-01-01T00:00:00Z",
                    }
                )
                + "\n"
            )

    sink = BigQuerySink(warehouse_dir=str(tmp_path / "warehouse"))
    q = run_xlsx_etl_pipeline(
        spark,
        str(landing),
        str(bucket),
        sink,
        "analytics.events_many",
        COLS,
        DDL,
        max_files_per_trigger=64,
    )
    q.awaitTermination(300)

    loaded = sink.read(spark, "analytics.events_many")
    got = sorted(r.event_id for r in loaded.collect())
    assert got == list(range(n_files)), "not exactly-once across micro-batches"


def test_curation_observation_metrics_match_aggregates(spark):
    """Observation metrics ride the materializing job itself; they must
    equal independently computed aggregates of the output."""
    from etl_gcp_function_tmabrasil_spark.pipelines.traindata import (
        curated_documents_observed,
    )

    kept, obs = curated_documents_observed(spark, SF_SMOKE)
    rows = kept.collect()
    m = obs.get
    assert m["kept_docs"] == len(rows)
    assert m["kept_chars"] == sum(r.n_chars for r in rows)
    assert m["max_group"] == max(r.group_size for r in rows)


def test_xlsx_etl_redelivery_is_idempotent(spark, tmp_path):
    # Eventarc is at-least-once: the same object-finalize event lands
    # twice within one batch AND again in a later run — the workbook's
    # rows must appear in the sink exactly once
    bucket = tmp_path / "bucket"
    (bucket / "minha-pasta").mkdir(parents=True)
    landing = tmp_path / "landing"
    landing.mkdir()
    write_minimal_xlsx(
        str(bucket / "minha-pasta" / "a.xlsx"),
        COLS,
        [[1, 10, "click", 1.5], [2, 20, "view", 2.5]],
    )
    dup = {"bucket": "bucket", "name": "minha-pasta/a.xlsx", "size": 1,
           "ts": "2024-01-01T00:00:00Z"}
    with open(landing / "ev.json", "w") as f:
        f.write(json.dumps(dup) + "\n")
        f.write(json.dumps(dup) + "\n")  # duplicate within the batch

    sink = BigQuerySink(warehouse_dir=str(tmp_path / "warehouse"))
    run_xlsx_etl_pipeline(
        spark, str(landing), str(bucket), sink, "analytics.redelivered", COLS, DDL
    ).awaitTermination(120)
    # redelivery in a later micro-batch (new landing file, same event)
    with open(landing / "ev2.json", "w") as f:
        f.write(json.dumps(dup) + "\n")
    run_xlsx_etl_pipeline(
        spark, str(landing), str(bucket), sink, "analytics.redelivered", COLS, DDL
    ).awaitTermination(120)

    rows = sink.read(spark, "analytics.redelivered").collect()
    assert sorted(r.event_id for r in rows) == [1, 2], (
        f"redelivered workbook ingested more than once: {len(rows)} rows"
    )


def test_xlsx_etl_rejects_path_traversal(spark, tmp_path):
    # a crafted name that passes the prefix/suffix accept predicate but
    # walks out of data_root must fail loudly, not read foreign files
    bucket = tmp_path / "bucket"
    (bucket / "minha-pasta").mkdir(parents=True)
    outside = tmp_path / "outside"
    outside.mkdir()
    write_minimal_xlsx(str(outside / "secret.xlsx"), COLS, [[7, 7, "x", 7.0]])
    landing = tmp_path / "landing"
    landing.mkdir()
    evil = {"bucket": "bucket", "name": "minha-pasta/../../outside/secret.xlsx",
            "size": 1, "ts": "2024-01-01T00:00:00Z"}
    with open(landing / "ev.json", "w") as f:
        f.write(json.dumps(evil) + "\n")

    sink = BigQuerySink(warehouse_dir=str(tmp_path / "warehouse"))
    q = run_xlsx_etl_pipeline(
        spark, str(landing), str(bucket), sink, "analytics.traversal", COLS, DDL
    )
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="escapes data_root"):
        q.awaitTermination(120)


def test_xlsx_etl_reupload_with_new_ts_is_ingested(spark, tmp_path):
    # a re-UPLOAD emits a new finalize event (same name, new ts): its
    # rows must be appended — only same-(name, ts) redeliveries dedup
    bucket = tmp_path / "bucket"
    (bucket / "minha-pasta").mkdir(parents=True)
    landing = tmp_path / "landing"
    landing.mkdir()
    write_minimal_xlsx(
        str(bucket / "minha-pasta" / "a.xlsx"), COLS, [[1, 10, "click", 1.5]]
    )
    ev1 = {"bucket": "bucket", "name": "minha-pasta/a.xlsx", "size": 1,
           "ts": "2024-01-01T00:00:00Z"}
    with open(landing / "ev.json", "w") as f:
        f.write(json.dumps(ev1) + "\n")
    sink = BigQuerySink(warehouse_dir=str(tmp_path / "warehouse"))
    run_xlsx_etl_pipeline(
        spark, str(landing), str(bucket), sink, "analytics.reupload", COLS, DDL
    ).awaitTermination(120)

    # re-upload: replace the object, new finalize event with a later ts
    write_minimal_xlsx(
        str(bucket / "minha-pasta" / "a.xlsx"), COLS, [[2, 20, "view", 2.5]]
    )
    ev2 = dict(ev1, ts="2024-01-01T01:00:00Z")
    with open(landing / "ev2.json", "w") as f:
        f.write(json.dumps(ev2) + "\n")
    run_xlsx_etl_pipeline(
        spark, str(landing), str(bucket), sink, "analytics.reupload", COLS, DDL
    ).awaitTermination(120)

    rows = sink.read(spark, "analytics.reupload").collect()
    assert sorted(r.event_id for r in rows) == [1, 2], (
        "re-uploaded object's new finalize event was not ingested"
    )


def test_xlsx_etl_poisoned_object_does_not_wedge_the_stream(spark, tmp_path):
    # one corrupt workbook + one deleted object in a batch with a
    # healthy one: the healthy object ingests, the bad ones land in
    # <table>_rejected with their event keys, and a redelivery of the
    # dead-lettered events is NOT reprocessed
    bucket = tmp_path / "bucket"
    (bucket / "minha-pasta").mkdir(parents=True)
    landing = tmp_path / "landing"
    landing.mkdir()
    write_minimal_xlsx(
        str(bucket / "minha-pasta" / "good.xlsx"), COLS, [[1, 10, "click", 1.5]]
    )
    (bucket / "minha-pasta" / "corrupt.xlsx").write_bytes(b"this is not a zip")
    evs = [
        {"bucket": "b", "name": "minha-pasta/good.xlsx", "size": 1,
         "ts": "2024-01-01T00:00:00Z"},
        {"bucket": "b", "name": "minha-pasta/corrupt.xlsx", "size": 1,
         "ts": "2024-01-01T00:01:00Z"},
        {"bucket": "b", "name": "minha-pasta/deleted.xlsx", "size": 1,
         "ts": "2024-01-01T00:02:00Z"},
    ]
    with open(landing / "ev.json", "w") as f:
        for e in evs:
            f.write(json.dumps(e) + "\n")

    sink = BigQuerySink(warehouse_dir=str(tmp_path / "warehouse"))
    run_xlsx_etl_pipeline(
        spark, str(landing), str(bucket), sink, "analytics.poison", COLS, DDL
    ).awaitTermination(120)

    rows = sink.read(spark, "analytics.poison").collect()
    assert sorted(r.event_id for r in rows) == [1], "healthy object missing"
    dead = {
        r._event_name: r._status
        for r in sink.read(spark, "analytics.poison_rejected").collect()
    }
    assert dead == {
        "minha-pasta/corrupt.xlsx": "error",
        "minha-pasta/deleted.xlsx": "missing",
    }

    # redeliver the dead-lettered events: probe must skip them (no new
    # rejected rows, no new data rows)
    with open(landing / "ev2.json", "w") as f:
        for e in evs[1:]:
            f.write(json.dumps(e) + "\n")
    run_xlsx_etl_pipeline(
        spark, str(landing), str(bucket), sink, "analytics.poison", COLS, DDL
    ).awaitTermination(120)
    assert sink.read(spark, "analytics.poison_rejected").count() == 2, (
        "dead-lettered events were reprocessed on redelivery"
    )
    assert sink.read(spark, "analytics.poison").count() == 1


def test_structured_bq_error_skips_non_http_wrapper_frames():
    """A wrapper frame exposing a non-HTTP getCode() (0 / connector-
    internal) must not stop the cause-chain walk — the structured 403
    deeper in the chain is the authoritative signal (ADVICE r6). The
    walker duck-types the Java exception, so plain Python fakes
    exercise it exactly."""
    from etl_gcp_function_tmabrasil_spark.sinks.bigquery import (
        _structured_bq_error,
    )

    class _Err:
        def __init__(self, reason):
            self._reason = reason

        def getReason(self):
            return self._reason

    class _JE:
        def __init__(self, code=None, reason=None, cause=None):
            self._code, self._reason, self._cause = code, reason, cause

        def getCode(self):
            if self._code is None:
                raise AttributeError("no code")
            return self._code

        def getError(self):
            return _Err(self._reason) if self._reason else None

        def getCause(self):
            return self._cause

    class _Exc(Exception):
        def __init__(self, je):
            self.java_exception = je

    # wrapper(code=0) → inner 403/accessDenied: must reach the inner frame
    inner = _JE(code=403, reason="accessDenied")
    wrapped = _Exc(_JE(code=0, cause=inner))
    assert _structured_bq_error(wrapped) == (403, "accessdenied")

    # recognized reason with a bogus code: reason wins, code suppressed
    only_reason = _Exc(_JE(code=-1, reason="notFound"))
    assert _structured_bq_error(only_reason) == (None, "notfound")

    # unrecognized reason + non-HTTP code all the way down → (None, None)
    noise = _Exc(_JE(code=7, reason="internalWrapper", cause=_JE(code=0)))
    assert _structured_bq_error(noise) == (None, None)

    # plain 404 frame still returns directly
    assert _structured_bq_error(_Exc(_JE(code=404, reason="notFound"))) == (
        404,
        "notfound",
    )
