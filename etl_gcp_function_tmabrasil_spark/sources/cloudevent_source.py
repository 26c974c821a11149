"""Custom Python DataSource for CloudEvent JSONL feeds (Spark 4
``pyspark.sql.datasource`` API): the reference's Eventarc delivery
(/root/reference/main.py:5, one CloudEvent per GCS object-finalize)
re-expressed as a first-class ``spark.read.format("cloudevent_jsonl")``
source instead of a per-event function invocation.

Defensive-parse semantics mirror the reference exactly:
- a malformed/empty payload yields an all-null row, never a crash
  (``data = event.data or {}``, main.py:6);
- absent keys yield null fields (``data.get(...)``, main.py:7-9);
- GCS delivers ``size`` as a decimal *string* — coerced to long here,
  non-numeric values become null (the reference carries it opaquely to
  a log line, main.py:16; a typed engine must commit to a type).

Scale design: one InputPartition per feed file — Spark schedules
file-level parallelism exactly like its native JSON reader, and each
partition streams line-by-line (no whole-file buffering). The Python
parse path is the slow lane by design: this source exists for feeds
that need per-record defensive semantics Spark's JSON reader can't
express (e.g. ``or {}`` on the envelope, string->long size coercion
with null fallback). For well-formed landing zones, prefer
``spark.read.json`` + ``file_events.parse_cloud_events_json``.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

#: Schema of the file_events model (catalog.FILE_EVENTS_SCHEMA as DDL —
#: kept as a literal so the DataSource has no import-time Spark deps).
_SCHEMA_DDL = "bucket string, name string, size bigint, ts timestamp"


def _coerce_size(v) -> int | None:
    """GCS object size arrives as a decimal string; tolerate int too."""
    if isinstance(v, bool) or v is None:
        return None
    try:
        return int(v)
    except (TypeError, ValueError):
        return None


def _coerce_ts(v) -> datetime | None:
    """RFC 3339 timestamp (CloudEvent `time`) -> tz-aware datetime."""
    if not isinstance(v, str):
        return None
    try:
        dt = datetime.fromisoformat(v.replace("Z", "+00:00"))
    except ValueError:
        return None
    # A tz-naive RFC 3339 string must be read as UTC, not the host TZ:
    # astimezone() on a naive datetime assumes local time, which would
    # make parsed values machine-dependent.
    if dt.tzinfo is None:
        return dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc)


def parse_event_line(line: str) -> tuple:
    """One JSONL line -> (bucket, name, size, ts), never raising: the
    columnar twin of main.py:6-9's `.get` chain over `data or {}`."""
    try:
        data = json.loads(line)
    except (json.JSONDecodeError, UnicodeDecodeError):
        data = None
    if not isinstance(data, dict):
        data = {}
    bucket = data.get("bucket")
    name = data.get("name")
    return (
        bucket if isinstance(bucket, str) else None,
        name if isinstance(name, str) else None,
        _coerce_size(data.get("size")),
        _coerce_ts(data.get("timeCreated") or data.get("time")),
    )


def format_event_line(bucket, name, size, ts) -> str:
    """(bucket, name, size, ts) -> one CloudEvent JSONL line, the
    inverse of parse_event_line: `size` is re-emitted as the decimal
    STRING GCS delivers (the reader coerces it back to long), `ts` as
    an RFC 3339 string, and null fields are OMITTED (the reader's
    `.get` chain makes absent and null indistinguishable — mirroring
    the reference's payload shape, not padding it)."""
    data = {}
    if bucket is not None:
        data["bucket"] = bucket
    if name is not None:
        data["name"] = name
    if size is not None:
        data["size"] = str(size)
    if ts is not None:
        # PySpark's Arrow->Row conversion hands write() NAIVE datetimes
        # in the OS-local zone (value.astimezone().replace(tzinfo=None)).
        # Re-anchor them to an explicit instant before rendering —
        # astimezone() on a naive datetime assumes local time, the exact
        # inverse of that conversion — so the emitted RFC 3339 string
        # carries an offset and the reader's offset-aware parse is
        # host-timezone-independent (on a UTC host this is a no-op).
        if ts.tzinfo is None:
            ts = ts.astimezone(timezone.utc)
        data["timeCreated"] = ts.isoformat()
    return json.dumps(data, ensure_ascii=False)


class _WriteCommit(WriterCommitMessage):
    def __init__(self, staged: str, rows: int):
        self.staged = staged
        self.rows = rows


class CloudEventWriter(DataSourceWriter):
    """Batch writer half of the connector — Spark's two-phase task
    commit protocol done honestly: each task streams its partition to
    a UNIQUELY NAMED file under a hidden ``.staging`` directory
    (hidden names are exactly what ``_list_feed_files`` prunes, so
    half-written output is invisible to every reader even mid-job),
    returns the staged path as its commit message, and only the
    driver-side :meth:`commit` renames staged files to visible
    ``part-N-{job}.jsonl`` (job-unique suffix, so appends never clobber
    a previous run's parts) — failed or speculative attempts leave
    residue only inside ``.staging``, which commit/abort sweep.

    Expects input columns (bucket, name, size, ts) — the connector's
    schema; round-trip through the reader is exact by construction
    (same coercions, inverted).

    Crash window, stated honestly: job-level commit is rename-granular,
    not atomic — under overwrite, a crash between "remove old parts"
    and "rename staged parts in" leaves a partially replaced directory
    (the same window Spark's V1 FileOutputCommitter has). Task-level
    commit IS safe at every point: uncommitted attempts live only
    under the hidden `.staging` dir no reader lists. Pipelines that
    need atomic replace should write to a fresh directory and swap it
    (the `sinks/partitioned.py` pattern)."""

    def __init__(self, options: dict, overwrite: bool):
        import uuid

        path = options.get("path")
        if not path:
            raise ValueError(
                "cloudevent_jsonl writer requires a path: .save(dir)"
            )
        self._path = path
        self._overwrite = overwrite
        # Per-job token baked into visible part names: without it a
        # second .mode("append") write would os.replace() the previous
        # run's part-00000..N — the same silent clobber Spark's native
        # file sources prevent with job-unique part naming.
        self._job = uuid.uuid4().hex[:12]

    def _staging(self) -> str:
        return os.path.join(self._path, ".staging")

    def write(self, iterator) -> _WriteCommit:
        import uuid

        os.makedirs(self._staging(), exist_ok=True)
        staged = os.path.join(
            self._staging(), f"task-{uuid.uuid4().hex}.jsonl"
        )
        n = 0
        with open(staged, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(
                    format_event_line(row.bucket, row.name, row.size, row.ts)
                    + "\n"
                )
                n += 1
        return _WriteCommit(staged, n)

    def commit(self, messages) -> None:
        import shutil

        # Zero input partitions => write() never ran and the directory
        # may not exist yet; committing an empty result must still
        # succeed (and leave a readable empty directory behind).
        os.makedirs(self._path, exist_ok=True)
        if self._overwrite:
            for f in os.listdir(self._path):
                if not f.startswith((".", "_")) and os.path.isfile(
                    os.path.join(self._path, f)
                ):
                    os.remove(os.path.join(self._path, f))
        for i, m in enumerate(messages):
            os.replace(
                m.staged,
                os.path.join(self._path, f"part-{i:05d}-{self._job}.jsonl"),
            )
        # anything left in .staging is a failed/speculative attempt
        shutil.rmtree(self._staging(), ignore_errors=True)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(self._staging(), ignore_errors=True)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _list_feed_files(path: str, glob: str) -> list[str]:
    """Sorted visible files under `path` (or [path] for a file),
    skipping hidden/metadata names AND directories — without the dir
    prune, files under _spark_metadata/ or _checkpoint/ (basenames
    like '0', '1') would be parsed as events."""
    if os.path.isfile(path):
        return [path]
    out = []
    for root, dirs, names in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        for n in sorted(names):
            if n.startswith((".", "_")):
                continue  # spark convention: hidden/metadata files
            if glob and not _glob_match(n, glob):
                continue
            out.append(os.path.join(root, n))
    return sorted(out)


def _read_feed_file(partition: _FilePartition):
    if not partition.path:
        return
    with open(partition.path, encoding="utf-8", errors="replace") as fh:
        for line in fh:
            line = line.strip()
            if line:
                yield parse_event_line(line)


class CloudEventReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("cloudevent_jsonl requires a path: .load(dir_or_file)")
        self._path = path
        self._glob = options.get("pathGlobFilter", "")

    def _files(self) -> list[str]:
        return _list_feed_files(self._path, self._glob)

    def partitions(self):
        # One partition per feed file: the scheduler fans out exactly as
        # Spark's native file sources do; empty dirs yield a no-op scan.
        files = self._files()
        return [_FilePartition(f) for f in files] or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        yield from _read_feed_file(partition)


class CloudEventStreamReader(DataSourceStreamReader):
    """Streaming variant: the reference's trigger lifecycle (one
    CloudEvent batch per Eventarc delivery, ``main.py:5``) as a real
    Structured Streaming source with offset tracking.

    Offset model: ``{"nfiles": N}`` = the first N files of the feed in
    sorted-name order have been committed. CONTRACT: the feed is
    append-only with lexicographically increasing names (chunk_000,
    chunk_001, …) — the writer-side convention of every landing
    pipeline in this repo. That keeps the offset O(1) regardless of
    feed size (a name-set offset would grow with history — at 100 TB
    the offset log must stay metadata-sized). Each micro-batch fans
    out one InputPartition per newly admitted file, exactly like the
    batch reader; checkpoint recovery replays nothing (exactly-once
    through the parquet sink's commit log, pinned by the gate query's
    repeat invocation)."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("cloudevent_jsonl requires a path: .load(dir)")
        self._path = path
        self._glob = options.get("pathGlobFilter", "")

    def _files(self) -> list[str]:
        return _list_feed_files(self._path, self._glob)

    def initialOffset(self) -> dict:
        return {"nfiles": 0}

    def latestOffset(self) -> dict:
        return {"nfiles": len(self._files())}

    def partitions(self, start: dict, end: dict):
        files = self._files()[start["nfiles"] : end["nfiles"]]
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition):
        yield from _read_feed_file(partition)

    def commit(self, end: dict) -> None:
        # nothing to clean up: admitted files stay in place (retention
        # is the landing zone's concern, as with Spark's file source)
        pass


def _glob_match(name: str, pattern: str) -> bool:
    from fnmatch import fnmatch

    return fnmatch(name, pattern)


class CloudEventDataSource(DataSource):
    """``spark.read.format("cloudevent_jsonl").load(dir)`` after
    ``spark.dataSource.register(CloudEventDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "cloudevent_jsonl"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema) -> CloudEventReader:
        return CloudEventReader(self.options)

    def streamReader(self, schema) -> CloudEventStreamReader:
        return CloudEventStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> CloudEventWriter:
        return CloudEventWriter(self.options, overwrite)


def register(spark) -> None:
    spark.dataSource.register(CloudEventDataSource)
