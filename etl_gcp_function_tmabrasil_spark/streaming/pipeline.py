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

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from etl_gcp_function_tmabrasil_spark.catalog import FILE_EVENTS_WIRE_SCHEMA
from etl_gcp_function_tmabrasil_spark.sources.file_events import (
    ACCEPT_PREFIX,
    accept_filter,
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
    raw = reader.json(landing_dir)
    # wire → normalized model: size arrives as a decimal string from
    # GCS; a LongType field in the read schema would silently null it
    return raw.select(
        "bucket", "name", F.col("size").try_cast("long").alias("size"), "ts"
    )


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


def run_xlsx_etl_pipeline(
    spark: SparkSession,
    landing_dir: str,
    data_root: str,
    sink,
    table: str,
    columns: list[str],
    schema_ddl: str,
    max_files_per_trigger: int = 1024,
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
    assumed).
    """
    from etl_gcp_function_tmabrasil_spark.sources.xlsx import read_xlsx

    stream = file_event_stream(spark, landing_dir, max_files_per_trigger)

    def etl(batch_df: DataFrame, batch_id: int) -> None:
        accepted = (
            accept_filter(batch_df).select("name").limit(MAX_BATCH_FILES + 1).collect()
        )
        if not accepted:
            return
        if len(accepted) > MAX_BATCH_FILES:
            raise RuntimeError(
                f"micro-batch {batch_id} admitted > {MAX_BATCH_FILES} accepted "
                "file events; lower max_files_per_trigger or raise "
                "MAX_BATCH_FILES"
            )
        # within-batch dedup: Eventarc is at-least-once, so one micro-
        # batch can carry the same object-finalize event twice — a bare
        # list would scan and append the workbook once per copy
        names = sorted({r.name for r in accepted})
        # containment check: the accept predicate validates prefix and
        # suffix but not '..' segments; on GCS those are literal key
        # characters, on a filesystem they'd walk out of data_root and
        # ingest an arbitrary readable .xlsx
        root = os.path.realpath(data_root)
        paths = []
        for n in names:
            p = os.path.realpath(os.path.join(data_root, n))
            if not p.startswith(root + os.sep):
                raise ValueError(
                    f"file event name escapes data_root: {n!r}"
                )
            paths.append(p)
        # cross-batch / retry idempotency: skip objects whose rows are
        # already in the sink (redelivered in a later batch, or a batch
        # retried after a partial append). Accepted names all start
        # with the accept prefix, so extracting the prefixed suffix of
        # _source_file recovers the event name unambiguously under one
        # data_root; the isin filter runs sink-side, so the collect is
        # bounded by THIS batch's name count, not total ingest history.
        import re as _re

        name_expr = F.regexp_extract(
            "_source_file", f"({_re.escape(ACCEPT_PREFIX)}.*)$", 1
        )
        try:
            done_names = {
                r["n"]
                for r in sink.read(spark, table)
                .select(name_expr.alias("n"))
                .filter(F.col("n").isin(names))
                .distinct()
                .collect()
            }
        except Exception:  # first batch: sink table does not exist yet
            done_names = set()
        paths = [p for p, n in zip(paths, names) if n not in done_names]
        if not paths:
            return
        # per-batch file list → one binaryFile scan over exactly those
        # objects (names are validated by the accept predicate)
        parsed = read_xlsx(spark, paths, columns, schema_ddl=schema_ddl)
        sink.write(parsed, table, mode="append")

    return (
        stream.writeStream.foreachBatch(etl)
        .option("checkpointLocation", os.path.join(data_root, "_etl_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
