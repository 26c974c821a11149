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

File skipping: a commit can record per-file MIN/MAX column stats in
the manifest (``stats_cols=...``), and ``read_snapshot(...,
prune={col: (lo, hi)})`` then hands Spark only the files whose range
intersects — Iceberg/Delta data skipping from the same manifest
metadata. The stats pass is one bounded aggregation over the freshly
written files (one output row per file — metadata-sized), and pruning
is a driver-side interval test over the manifest, never a data scan.
Stats-based pruning is a FILE filter, not a row filter: callers still
apply the actual predicate (a kept file may hold rows outside the
range); files without stats for a pruned column are conservatively
kept.

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


def _collect_file_stats(
    spark: SparkSession, staging: str, rel_dir: str, stats_cols: list[str]
) -> dict[str, dict[str, list]]:
    """Per-file MIN/MAX for ``stats_cols`` over the freshly written
    staging files: one aggregation job, one output row per file
    (metadata-sized — the same scan Iceberg's writers fold into the
    commit). Keys are table-root-relative paths."""
    from pyspark.sql import functions as F

    back = spark.read.parquet(staging)
    aggs = []
    for c in stats_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    rows = (
        back.select(F.input_file_name().alias("_file"), *stats_cols)
        .groupBy("_file")
        .agg(*aggs)
        .collect()
    )
    out: dict[str, dict[str, list]] = {}
    for r in rows:
        rel = os.path.join(rel_dir, os.path.basename(r["_file"]))
        out[rel] = {
            c: [_json_stat(r[f"min_{c}"]), _json_stat(r[f"max_{c}"])]
            for c in stats_cols
        }
    return out


def _json_stat(v):
    """Stats values must survive a JSON round trip losslessly —
    numerics and strings pass through; dates/timestamps serialize to
    their ISO string (which compares consistently as text)."""
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    return str(v)


def commit_snapshot(
    df: DataFrame,
    table_dir: str,
    mode: str = "append",
    stats_cols: list[str] | None = None,
    txn_id: str | int | None = None,
) -> int:
    """Write ``df`` as a new snapshot of the table; returns the new
    version number. ``mode='append'`` carries the previous snapshot's
    files forward (and REJECTS a schema that drifted from the previous
    snapshot's); ``mode='overwrite'`` starts the file list fresh
    (logical truncate — old versions remain readable) and may change
    the schema. An empty ``df`` commits fine: the manifest records the
    schema, so the version reads back as an empty typed DataFrame.
    ``stats_cols`` records per-file MIN/MAX for those columns in the
    manifest, enabling ``read_snapshot(..., prune=...)`` file
    skipping.

    ``txn_id`` makes the commit IDEMPOTENT (Delta's txn/appId pattern):
    the manifest carries a cumulative ``txn -> version`` map, and a
    commit whose ``txn_id`` was already applied returns that recorded
    version WITHOUT writing anything — the contract a streaming
    ``foreachBatch(batch_id)`` writer needs, where a crash between
    sink write and checkpoint commit replays the batch at-least-once."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown snapshot mode: {mode}")
    versions = _manifests(table_dir)
    prev = _load_manifest(table_dir, versions[-1]) if versions else None
    txn: dict[str, int] = dict(prev.get("txn", {})) if prev else {}
    if txn_id is not None and str(txn_id) in txn:
        return txn[str(txn_id)]  # already applied — idempotent no-op
    data_dir = os.path.join(table_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    staging_name = f"commit-{uuid.uuid4().hex}"
    staging = os.path.join(data_dir, staging_name)
    df.write.parquet(staging)
    rel_dir = os.path.join("data", staging_name)
    new_files = sorted(
        os.path.join(rel_dir, f)
        for f in os.listdir(staging)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )
    stats: dict[str, dict[str, list]] = {}
    if stats_cols and new_files:
        stats = _collect_file_stats(
            df.sparkSession, staging, rel_dir, list(stats_cols)
        )
    files: list[str] = []
    if mode == "append" and prev is not None:
        prev_schema = StructType.fromJson(json.loads(prev["schema"]))
        if _schema_signature(prev_schema) != _schema_signature(df.schema):
            raise ValueError(
                "append-time schema drift: snapshot "
                f"v{prev['version']} has {prev_schema.simpleString()}, "
                f"append has {df.schema.simpleString()} — use "
                "mode='overwrite' to change the table's schema"
            )
        files = prev["files"]
        stats = {**prev.get("stats", {}), **stats}
    files = files + new_files
    version = (versions[-1] + 1) if versions else 1
    if txn_id is not None:
        txn[str(txn_id)] = version
    tmp = os.path.join(table_dir, f".manifest_v{version}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(
            {
                "version": version,
                "files": files,
                "schema": df.schema.json(),
                "stats": stats,
                "txn": txn,
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


def snapshot_files(
    table_dir: str,
    version: int | None = None,
    prune: dict[str, tuple] | None = None,
) -> list[str]:
    """The absolute data-file list of ``version`` after stats-based
    pruning: a file survives iff, for every ``col: (lo, hi)`` in
    ``prune``, its recorded [min, max] intersects [lo, hi] (``None``
    bound = unbounded; missing stats = conservatively kept). Driver-
    side interval math over the manifest — no data is scanned."""
    versions = _manifests(table_dir)
    if not versions:
        raise FileNotFoundError(f"no snapshot committed at {table_dir}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(
            f"snapshot v{v} does not exist at {table_dir} (have {versions})"
        )
    manifest = _load_manifest(table_dir, v)
    stats = manifest.get("stats", {})
    kept = []
    for rel in manifest["files"]:
        ok = True
        for col, (lo, hi) in (prune or {}).items():
            s = stats.get(rel, {}).get(col)
            if s is None or s[0] is None or s[1] is None:
                continue  # no stats -> cannot prune this file
            if (hi is not None and s[0] > hi) or (
                lo is not None and s[1] < lo
            ):
                ok = False
                break
        if ok:
            kept.append(os.path.join(table_dir, rel))
    return kept


def read_snapshot(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    prune: dict[str, tuple] | None = None,
) -> DataFrame:
    """The table as of ``version`` (default: the newest snapshot).
    Reads exactly the manifest's files — orphans from failed commits
    are structurally invisible. An empty snapshot returns an empty
    DataFrame with the manifest's recorded schema. ``prune`` skips
    files by manifest MIN/MAX stats (see ``snapshot_files``); it is a
    FILE filter — apply the actual row predicate on the result."""
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
    files = snapshot_files(table_dir, v, prune)
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*files)


def vacuum_snapshots(table_dir: str, retain_last: int = 1) -> dict:
    """Expire all but the newest ``retain_last`` versions and delete
    the data files no RETAINED manifest references — the Delta VACUUM /
    Iceberg expire_snapshots lifecycle step that keeps a
    frequently-committed table from accumulating dead files forever.

    Crash-safe ordering: expired MANIFESTS are unlinked first, so at
    every intermediate state each still-listed version remains fully
    readable (a data file is deleted only once no manifest on disk
    names it). Files never referenced by any manifest (crashed-commit
    orphans) are left alone — they are structurally invisible to
    readers (``read_snapshot`` opens manifest-named files only) and
    belong to a separate orphan sweep with an age threshold, exactly
    as Delta separates VACUUM's retention check from uncommitted-file
    cleanup.

    Driver-side file metadata ops only — nothing is scanned. Returns
    ``{expired_versions, retained_versions, deleted_files}``.
    """
    versions = _manifests(table_dir)
    if not versions:
        raise FileNotFoundError(f"no snapshot committed at {table_dir}")
    retain_last = max(1, retain_last)
    keep = versions[-retain_last:]
    drop = [v for v in versions if v not in keep]
    referenced: set[str] = set()
    for v in keep:
        referenced.update(_load_manifest(table_dir, v)["files"])
    dropped_refs: set[str] = set()
    for v in drop:
        dropped_refs.update(_load_manifest(table_dir, v)["files"])
    for v in drop:
        os.unlink(_manifest_path(table_dir, v))
    deleted: list[str] = []
    for rel in sorted(dropped_refs - referenced):
        p = os.path.join(table_dir, rel)
        if os.path.exists(p):
            os.unlink(p)
            deleted.append(rel)
    return {
        "expired_versions": drop,
        "retained_versions": keep,
        "deleted_files": deleted,
    }


def restore_snapshot(table_dir: str, to_version: int) -> int:
    """METADATA-ONLY rollback (Delta RESTORE / Iceberg rollback): make
    the table's newest version's content equal an older version's by
    writing a NEW manifest that references the old version's files —
    no data is read, copied, or rewritten, and history is preserved
    (the bad versions stay time-travelable until a vacuum expires
    them). Returns the new version number.

    The restored manifest carries the source's schema and stats
    verbatim and the NEWEST manifest's txn map (idempotence keys
    accumulate monotonically; a restore must not resurrect retired
    batch ids as 'unseen'). Same exclusive-create publish as
    commit_snapshot — a concurrent-writer race raises rather than
    silently dropping a commit.
    """
    versions = _manifests(table_dir)
    if not versions:
        raise FileNotFoundError(f"no snapshot committed at {table_dir}")
    if to_version not in versions:
        raise FileNotFoundError(
            f"snapshot v{to_version} does not exist at {table_dir}"
            f" (have {versions})"
        )
    src = _load_manifest(table_dir, to_version)
    newest = _load_manifest(table_dir, versions[-1])
    version = versions[-1] + 1
    tmp = os.path.join(table_dir, f".manifest_v{version}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(
            {
                "version": version,
                "files": src["files"],
                "schema": src["schema"],
                "stats": src.get("stats", {}),
                "txn": dict(newest.get("txn", {})),
                "restored_from": to_version,
            },
            fh,
        )
    dst = _manifest_path(table_dir, version)
    try:
        os.link(tmp, dst)
    finally:
        os.unlink(tmp)
    return version
