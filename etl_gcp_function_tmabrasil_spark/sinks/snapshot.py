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
  rewrite) and renames ``manifest_v{N}.json`` into place atomically —
  readers see the table before the commit or after it, never between
  (snapshot isolation);
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
last-manifest-plus-one with an atomic rename, which serializes SINGLE-
writer pipelines (the reference's trigger model, main.tf:53 max 3
instances on ONE table path); concurrent writers to the SAME table
need a coordination primitive (rename-wins detection + retry) that a
real catalog service provides.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


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


def commit_snapshot(
    df: DataFrame, table_dir: str, mode: str = "append"
) -> int:
    """Write ``df`` as a new snapshot of the table; returns the new
    version number. ``mode='append'`` carries the previous snapshot's
    files forward; ``mode='overwrite'`` starts the file list fresh
    (logical truncate — old versions remain readable)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown snapshot mode: {mode}")
    data_dir = os.path.join(table_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    staging = os.path.join(data_dir, f"commit-{uuid.uuid4().hex}")
    df.write.parquet(staging)
    new_files = sorted(
        os.path.join(staging, f)
        for f in os.listdir(staging)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )
    versions = _manifests(table_dir)
    files: list[str] = []
    if mode == "append" and versions:
        with open(_manifest_path(table_dir, versions[-1])) as fh:
            files = json.load(fh)["files"]
    files = files + new_files
    version = (versions[-1] + 1) if versions else 1
    tmp = os.path.join(table_dir, f".manifest_v{version}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump({"version": version, "files": files}, fh)
    os.rename(tmp, _manifest_path(table_dir, version))
    return version


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """The table as of ``version`` (default: the newest snapshot).
    Reads exactly the manifest's files — orphans from failed commits
    are structurally invisible."""
    versions = _manifests(table_dir)
    if not versions:
        raise FileNotFoundError(f"no snapshot committed at {table_dir}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(
            f"snapshot v{v} does not exist at {table_dir} (have {versions})"
        )
    with open(_manifest_path(table_dir, v)) as fh:
        files = json.load(fh)["files"]
    if not files:
        raise FileNotFoundError(f"snapshot v{v} is empty at {table_dir}")
    return spark.read.parquet(*files)
