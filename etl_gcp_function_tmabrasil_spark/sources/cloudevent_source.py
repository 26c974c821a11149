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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class CloudEventReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("cloudevent_jsonl requires a path: .load(dir_or_file)")
        self._path = path
        self._glob = options.get("pathGlobFilter", "")

    def _files(self) -> list[str]:
        if os.path.isfile(self._path):
            return [self._path]
        out = []
        for root, dirs, names in os.walk(self._path):
            # prune hidden/metadata DIRECTORIES too (mutating dirs
            # in-place stops the walk): without this, files under
            # _spark_metadata/ or _checkpoint/ — whose basenames like
            # '0', '1' pass the file check — are parsed as events
            dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
            for n in sorted(names):
                if n.startswith((".", "_")):
                    continue  # spark convention: hidden/metadata files
                if self._glob and not _glob_match(n, self._glob):
                    continue
                out.append(os.path.join(root, n))
        return sorted(out)

    def partitions(self):
        # One partition per feed file: the scheduler fans out exactly as
        # Spark's native file sources do; empty dirs yield a no-op scan.
        files = self._files()
        return [_FilePartition(f) for f in files] or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return
        with open(partition.path, encoding="utf-8", errors="replace") as fh:
            for line in fh:
                line = line.strip()
                if line:
                    yield parse_event_line(line)


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


def register(spark) -> None:
    spark.dataSource.register(CloudEventDataSource)
