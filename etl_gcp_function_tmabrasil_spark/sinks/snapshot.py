"""Snapshot-isolated table sink with time travel — the manifest-file
core of the lakehouse table formats (Iceberg/Delta), built from
primitives the engine already trusts: parquet data files that become
visible ONLY through an atomically renamed manifest.

Model:
- data files live under ``<table>/data/`` with job-unique names and are
  NEVER listed directly — a reader resolves ``<table>/manifest_v{N}.json``
  (the newest, or a pinned version) and reads exactly the files it
  names;
- a commit writes its data files first, then composes the new file
  list (previous snapshot's files for an append, or any subset for a
  rewrite) and publishes ``manifest_v{N}.json`` atomically with
  EXCLUSIVE-create semantics (hard-link + unlink) — readers see the
  table before the commit or after it, never between, and a version
  collision between two racing writers RAISES instead of silently
  orphaning the loser's data files (rename-wins detection, not
  last-rename-wins);
- the manifest stores the snapshot's SCHEMA (Spark StructType JSON),
  so every committed version stays readable — including an EMPTY
  snapshot (overwrite 'logical truncate', or a first commit whose
  write produced zero data files), which reads back as an empty,
  correctly-typed DataFrame — and append-time schema drift is
  detected explicitly (raise) rather than delegated silently to
  parquet's merge behavior. Iceberg/Delta version the schema in
  metadata for exactly these reasons;
- manifests store data-file paths RELATIVE to the table root, so the
  table is relocatable and a relative ``table_dir`` does not bake the
  writer's cwd into the manifest;
- old manifests stay: ``read_snapshot(version=k)`` is time travel, and
  failed/crashed commits leave at most orphan data files that no
  manifest names (invisible; a retention sweep can delete anything not
  reachable from kept manifests).

Scale notes: the manifest holds file PATHS (metadata-sized — Iceberg's
own contract; at millions of files the format shards manifests, the
same metadata/data split). Readers hand Spark the explicit file list,
so planning never lists the directory — and snapshot reads stay
parallel scans of the named parquet files with full pushdown.

Concurrency, stated honestly: version numbering is
last-manifest-plus-one, which serializes SINGLE-writer pipelines (the
reference's trigger model, main.tf:53 max 3 instances on ONE table
path); if that assumption is ever violated, the exclusive-create
publish makes the collision an ERROR the losing writer can retry —
full multi-writer coordination still belongs to a catalog service.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def _manifests(table_dir: str) -> list[int]:
    if not os.path.isdir(table_dir):
        return []
    out = []
    for f in os.listdir(table_dir):
        if f.startswith("manifest_v") and f.endswith(".json"):
            try:
                out.append(int(f[len("manifest_v") : -len(".json")]))
            except ValueError:
                continue
    return sorted(out)


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, f"manifest_v{version}.json")


def _load_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as fh:
        return json.load(fh)


def _schema_signature(schema: StructType) -> list[tuple[str, str]]:
    """Name + type per field, nullability ignored — parquet round-trips
    do not preserve nullability faithfully enough to gate on it."""
    return [(f.name, f.dataType.simpleString()) for f in schema.fields]


def commit_snapshot(
    df: DataFrame, table_dir: str, mode: str = "append"
) -> int:
    """Write ``df`` as a new snapshot of the table; returns the new
    version number. ``mode='append'`` carries the previous snapshot's
    files forward (and REJECTS a schema that drifted from the previous
    snapshot's); ``mode='overwrite'`` starts the file list fresh
    (logical truncate — old versions remain readable) and may change
    the schema. An empty ``df`` commits fine: the manifest records the
    schema, so the version reads back as an empty typed DataFrame."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown snapshot mode: {mode}")
    data_dir = os.path.join(table_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    staging_name = f"commit-{uuid.uuid4().hex}"
    staging = os.path.join(data_dir, staging_name)
    df.write.parquet(staging)
    new_files = sorted(
        os.path.join("data", staging_name, f)
        for f in os.listdir(staging)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )
    versions = _manifests(table_dir)
    files: list[str] = []
    if mode == "append" and versions:
        prev = _load_manifest(table_dir, versions[-1])
        prev_schema = StructType.fromJson(json.loads(prev["schema"]))
        if _schema_signature(prev_schema) != _schema_signature(df.schema):
            raise ValueError(
                "append-time schema drift: snapshot "
                f"v{prev['version']} has {prev_schema.simpleString()}, "
                f"append has {df.schema.simpleString()} — use "
                "mode='overwrite' to change the table's schema"
            )
        files = prev["files"]
    files = files + new_files
    version = (versions[-1] + 1) if versions else 1
    tmp = os.path.join(table_dir, f".manifest_v{version}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(
            {
                "version": version,
                "files": files,
                "schema": df.schema.json(),
            },
            fh,
        )
    dst = _manifest_path(table_dir, version)
    try:
        # exclusive create: a same-version race RAISES (FileExistsError)
        # instead of last-rename-wins silently orphaning a commit
        os.link(tmp, dst)
    finally:
        os.unlink(tmp)
    return version


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """The table as of ``version`` (default: the newest snapshot).
    Reads exactly the manifest's files — orphans from failed commits
    are structurally invisible. An empty snapshot returns an empty
    DataFrame with the manifest's recorded schema."""
    versions = _manifests(table_dir)
    if not versions:
        raise FileNotFoundError(f"no snapshot committed at {table_dir}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(
            f"snapshot v{v} does not exist at {table_dir} (have {versions})"
        )
    manifest = _load_manifest(table_dir, v)
    schema = StructType.fromJson(json.loads(manifest["schema"]))
    files = [os.path.join(table_dir, f) for f in manifest["files"]]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*files)
