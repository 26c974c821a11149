"""The reference's runtime lifecycle re-expressed in Structured Streaming
(SURVEY.md §3.1 "Spark mapping of this lifecycle"):

reference                                   this module
-----------------------------------------   ---------------------------------
Eventarc pushes CloudEvent per GCS object   readStream file source over a
  (``main.py:5``)                             landing dir (micro-batches)
per-event accept/reject filter              accept_filter / reject_filter
  (``main.py:12-14``)                         (sources/file_events.py)
print log lines (``main.py:13,16``)         accepted/rejected parquet sinks
                                              + log-line column
at-least-once Eventarc retry                checkpoint + idempotent
  (``main.tf:52``)                            foreachBatch with event dedup
max 3 instances (``main.tf:53``)            maxFilesPerTrigger / executors

Scale: the landing scan lists incrementally (file-source checkpoint log);
each micro-batch is a bounded DataFrame so every batch operator in the
engine applies; exactly-once lands via idempotent overwrite-by-batch-id.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from etl_gcp_function_tmabrasil_spark.catalog import FILE_EVENTS_WIRE_SCHEMA
from etl_gcp_function_tmabrasil_spark.sources.file_events import (
    accept_filter,
    normalized_events,
    reject_filter,
    with_log_line,
    with_reject_log_line,
)


def file_event_stream(
    spark: SparkSession,
    landing_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-arrival stream of JSON-encoded file events.

    The declared schema is mandatory (streaming file sources never
    infer); `maxFilesPerTrigger` is the reference's parallelism cap
    (``main.tf:53``) expressed as micro-batch admission control.
    """
    reader = spark.readStream.schema(FILE_EVENTS_WIRE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # wire → normalized model (shared rule: size arrives as a decimal
    # string from GCS; a LongType read schema would silently null it)
    return normalized_events(reader.json(landing_dir), struct_col=None)


def run_landing_pipeline(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Run the trigger→filter→route→sink pipeline to completion.

    `foreachBatch` writes both branches per micro-batch:
    - accepted/  — events passing the reference predicate, with log_line
    - rejected/  — the dead-letter branch, with its log_line
    Batch-id partitioned output + checkpointing makes replays idempotent
    (a retried batch overwrites its own partition — the dedup the
    reference lacks under Eventarc at-least-once delivery).
    """
    stream = file_event_stream(spark, landing_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # two sinks = two actions over the same micro-batch; without the
        # persist each write re-reads and re-parses every landing file
        # admitted to the batch (the foreachBatch double-scan the
        # Structured Streaming guide warns about)
        batch_df.persist()
        try:
            accepted = with_log_line(accept_filter(batch_df))
            rejected = with_reject_log_line(reject_filter(batch_df))
            accepted.write.mode("overwrite").parquet(
                os.path.join(out_dir, "accepted", f"batch={batch_id}")
            )
            rejected.write.mode("overwrite").parquet(
                os.path.join(out_dir, "rejected", f"batch={batch_id}")
            )
        finally:
            batch_df.unpersist()

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_console_logger(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Console log sink — the reference's accept-side print
    (``/root/reference/main.py:16``: "Novo XLSX: gs://{bucket}/{name}
    (size={size})") as a streaming console sink over the accepted
    branch. Observability only; the durable branches are written by
    run_landing_pipeline."""
    stream = with_log_line(accept_filter(file_event_stream(spark, landing_dir)))
    writer = (
        stream.select("log_line")
        .writeStream.format("console")
        .option("truncate", "false")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


#: Hard cap on the per-micro-batch accepted-name list that foreachBatch
#: materializes on the driver (paths for the binaryFile scan MUST live
#: driver-side — that is how Spark plans file scans). ~100 bytes/name
#: puts 100k names at ~10 MB of driver heap; failing loudly beyond it
#: beats an unbounded collect() OOMing the driver.
MAX_BATCH_FILES = 100_000

#: AnalysisException conditions that mean "the ledger table simply does
#: not exist yet" — the ONLY failures the idempotency probe may treat
#: as an empty ledger. Anything else (e.g. UNRESOLVED_COLUMN from a
#: pre-existing table without event-key columns, permission errors)
#: must propagate: swallowing it would silently disable dedup and
#: double-ingest on every redelivery forever.
_MISSING_TABLE_CONDITIONS = (
    "PATH_NOT_FOUND",
    "TABLE_OR_VIEW_NOT_FOUND",
    "UNABLE_TO_INFER_SCHEMA",  # empty/partial parquet dir, same meaning
)


def _probe_event_keys(spark, sink, table: str, ev_df: DataFrame) -> set:
    """Event keys from `table` that match this batch's keys (broadcast
    semi-join; collect bounded by the batch's event count).

    Connector-route missing-table failures are connector-specific and
    would not match _MISSING_TABLE_CONDITIONS, so on ANY read failure
    a sink exposing `exists()` (e.g. BigQuerySink) is consulted: a
    confirmed-absent table means an empty ledger; everything else
    propagates. The probe runs only on the exception path — the
    steady-state batch (table exists, read succeeds) pays zero extra
    metadata round-trips."""

    def _keys() -> set:
        return {
            (r._event_name, r._event_ts)
            for r in sink.read(spark, table)
            .join(F.broadcast(ev_df), ["_event_name", "_event_ts"], "left_semi")
            .select("_event_name", "_event_ts")
            .distinct()
            .collect()
        }

    try:
        return _keys()
    except AnalysisException as exc:
        cond = (
            exc.getCondition()
            if hasattr(exc, "getCondition")
            else getattr(exc, "getErrorClass", lambda: None)()
        ) or ""
        if any(c in cond for c in _MISSING_TABLE_CONDITIONS):
            return set()
        probe = getattr(sink, "exists", None)
        if probe is not None and not probe(spark, table):
            return set()
        raise
    except Exception:
        probe = getattr(sink, "exists", None)
        if probe is not None and not probe(spark, table):
            return set()
        raise


def run_xlsx_etl_pipeline(
    spark: SparkSession,
    landing_dir: str,
    data_root: str,
    sink,
    table: str,
    columns: list[str],
    schema_ddl: str,
    max_files_per_trigger: int = 1024,
    max_file_bytes: int | None = None,
) -> StreamingQuery:
    """The reference's complete intended lifecycle, end-to-end
    (``main.py:5-17`` with the placeholder body filled in):

    file-event stream → accept filter (``main.py:12``) → distributed
    XLSX parse of the referenced objects → typed cast → load to the
    BigQuery-shaped sink.

    `data_root` plays the role of the GCS bucket: accepted event `name`s
    are resolved under it. Each micro-batch reads only the files named
    by its accepted events (per-object ingest, like the reference), and
    the sink append is driven from a checkpointed query.

    Admission control is ON by default: `max_files_per_trigger` bounds
    how many landing files each micro-batch admits (pass ``None`` to
    disable), and the per-batch accepted-name list is additionally
    capped at MAX_BATCH_FILES — exceeding it raises instead of silently
    collecting an unbounded list onto the driver (a landing file is one
    CloudEvent in the reference's shape, but nothing stops a producer
    from batching events per file, so the row bound is enforced, not
    assumed). `max_file_bytes` caps per-workbook size in the tolerant
    read (None = the source default); oversized objects dead-letter
    with status 'oversize' instead of being materialized.

    Fault isolation: one poisoned object must never wedge the
    checkpointed stream (a failed batch replays with the identical
    committed file list forever). Missing files, oversized workbooks,
    empty sheets, and parse failures are routed per-object to
    ``<table>_rejected`` (event key + status + error) while healthy
    objects in the same batch ingest normally — the per-invocation
    blast radius the reference gets for free from one-event-per-call.
    The idempotency probe covers BOTH tables, so a dead-lettered event
    is not re-processed on redelivery. Probe cost note: the probe
    column-prunes to the two event-key columns and semi-joins this
    batch's keys; at very large ingest history, bound it further by
    partitioning the sink on an event-key bucket or keeping a compact
    ledger table.
    """
    from etl_gcp_function_tmabrasil_spark.sources.xlsx import read_xlsx_tolerant

    stream = file_event_stream(spark, landing_dir, max_files_per_trigger)

    def etl(batch_df: DataFrame, batch_id: int) -> None:
        accepted = (
            accept_filter(batch_df)
            # epoch micros, NOT a collected datetime: plain collect()
            # renders timestamps as naive driver-local datetimes, whose
            # isoformat is neither timezone-stable nor injective (DST
            # fall-back collapses two instants) — unusable as a ledger
            # key. unix_micros is the instant itself.
            .select("name", F.unix_micros("ts").alias("ts_us"))
            .limit(MAX_BATCH_FILES + 1)
            .collect()
        )
        if not accepted:
            return
        if len(accepted) > MAX_BATCH_FILES:
            raise RuntimeError(
                f"micro-batch {batch_id} admitted > {MAX_BATCH_FILES} accepted "
                "file events; lower max_files_per_trigger or raise "
                "MAX_BATCH_FILES"
            )
        # Containment + canonicalization: the accept predicate validates
        # prefix and suffix but not '..' segments — on GCS those are
        # literal key characters, on a filesystem they'd walk out of
        # data_root and ingest an arbitrary readable .xlsx. Keying
        # everything downstream on the RESOLVED path also collapses
        # alias spellings ('minha-pasta/a.xlsx' vs
        # 'minha-pasta/b/../a.xlsx') that a raw-name key would ingest
        # twice.
        #
        # Idempotency unit = the (object, event-time) pair, not the bare
        # name: Eventarc redelivers the SAME finalize event (same name +
        # ts — dedup it, within this batch and across batches/retries),
        # while a re-UPLOAD of an object is a NEW finalize event (same
        # name, new ts) whose rows must be ingested — a name-only ledger
        # would silently drop every update. Rows land tagged with
        # (_event_name, _event_ts) so the sink + dead-letter tables ARE
        # the ledger — no separate bookkeeping table to drift.
        root = os.path.realpath(data_root)
        events: dict[tuple[str, str], str] = {}
        for r in accepted:
            p = os.path.realpath(os.path.join(data_root, r.name))
            if not p.startswith(root + os.sep):
                raise ValueError(f"file event name escapes data_root: {r.name!r}")
            canon = os.path.relpath(p, root)
            ts_s = str(r.ts_us) if r.ts_us is not None else ""
            events[(canon, ts_s)] = p
        ev_df = spark.createDataFrame(
            [(n, t) for (n, t) in events],
            "_event_name string, _event_ts string",
        )
        # ledger probe: broadcast-semi-join THIS batch's event keys
        # against the sink AND the dead-letter table (never an isin
        # over up to 100k literals; the collect is bounded by the
        # batch's event count, not ingest history) — a dead-lettered
        # event is as processed as an ingested one.
        already = _probe_event_keys(
            spark, sink, table, ev_df
        ) | _probe_event_keys(spark, sink, f"{table}_rejected", ev_df)
        todo = {k: p for k, p in events.items() if k not in already}
        if not todo:
            return
        # driver-side existence gate: an object deleted between event
        # and batch (or a name resolving to a directory) would fail the
        # scan and poison-pill the replayed batch — dead-letter it
        present = {k: p for k, p in todo.items() if os.path.isfile(p)}
        missing = [
            (n, t, "missing", f"not a readable file: {p}")
            for (n, t), p in todo.items()
            if (n, t) not in present
        ]
        # ONE binaryFile scan over the distinct resolved files; rows are
        # tagged with their event key via a broadcast join on the scan's
        # URI ('file:' + realpath). An object re-uploaded under two
        # event times in one batch fans out once per event — each
        # finalize event is processed exactly once, like the reference.
        # read_xlsx_tolerant guarantees ≥1 row per scanned file, so
        # every present event lands in the sink or the dead-letter.
        tag_df = spark.createDataFrame(
            [("file:" + p, n, t) for (n, t), p in present.items()],
            "_source_file string, _event_name string, _event_ts string",
        )
        xlsx_kwargs = (
            {} if max_file_bytes is None else {"max_file_bytes": max_file_bytes}
        )
        parsed = read_xlsx_tolerant(
            spark,
            sorted(set(present.values())),
            columns,
            schema_ddl=schema_ddl,
            **xlsx_kwargs,
        )
        tagged = parsed.join(F.broadcast(tag_df), "_source_file")
        tagged.persist()
        try:
            data = tagged.filter(F.col("_status") == "ok").drop("_status", "_error")
            sink.write(data, table, mode="append")
            dead = tagged.filter(F.col("_status") != "ok").select(
                "_event_name", "_event_ts", "_status", "_error", "_source_file"
            )
            if missing:
                dead = dead.unionByName(
                    spark.createDataFrame(
                        [(n, t, s, e, None) for n, t, s, e in missing],
                        "_event_name string, _event_ts string, _status string,"
                        " _error string, _source_file string",
                    )
                )
            sink.write(dead, f"{table}_rejected", mode="append")
        finally:
            tagged.unpersist()

    return (
        stream.writeStream.foreachBatch(etl)
        .option("checkpointLocation", os.path.join(data_root, "_etl_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
