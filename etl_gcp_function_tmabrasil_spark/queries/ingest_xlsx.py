"""Driver-visible XLSX ingestion round trip — the reference's actual
job surface (``/root/reference/main.py:12``: accept ``minha-pasta/*.xlsx``,
process the workbook, ``main.py:17``) as an ORACLE-CHECKED query.

The query fabricates a deterministic 100-row slice of ``events`` as two
XLSX workbooks under a ``minha-pasta/`` landing prefix (plus a decoy
``.csv`` the path glob must ignore, mirroring the reference's filter
R4), reads them back distributed through the engine's ingest edge
(``sources/xlsx.py``: binaryFile scan → mapInPandas parse → Catalyst
typed casts), and returns the typed rows. The DuckDB oracle reads the
SAME slice straight from parquet — hash equality therefore proves the
entire write→parse→cast edge is lossless, including float round trips
(Python repr → string cell → double cast is exact).

Scale notes: the 100-row driver-side fabrication is test-fixture
plumbing, not the operator; the *read* path is the operator and is
per-file parallel (one task per workbook, matching the reference's
per-object invocation model, ``main.py:5``). At 100 TB the landing zone
holds many thousands of workbooks and the same plan fans out one parse
task per file with the binary column projected away before any shuffle.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from etl_gcp_function_tmabrasil_spark.catalog import load_table
from etl_gcp_function_tmabrasil_spark.sources.xlsx import read_xlsx, write_minimal_xlsx

_COLS = ["event_id", "user_id", "event_type", "value"]
_DDL = "event_id long, user_id long, event_type string, value double"
_N_ROWS = 100
_N_FILES = 2


def _landing_dir(sf_dir: str) -> str:
    # Per-PROCESS unique root: a fixed shared /tmp path let (a) a
    # concurrent driver-verify and pytest run rewrite each other's
    # workbooks mid-read (truncated zip → BadZipFile), (b) stale
    # *.xlsx from older revisions pass the glob and inflate the union,
    # and (c) another user's ownership of the fixed dir break makedirs.
    # One mkdtemp per process keeps repeat invocations in-process
    # idempotent (same dir, same filenames, whole-file rewrites).
    global _LANDING_ROOT
    if _LANDING_ROOT is None:
        _LANDING_ROOT = tempfile.mkdtemp(prefix="spark_graft_xlsx_landing_")
    sf_name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    return os.path.join(_LANDING_ROOT, sf_name, "minha-pasta")


_LANDING_ROOT: str | None = None


def xlsx_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events slice → XLSX workbooks → distributed read-back, typed."""
    landing = _landing_dir(sf_dir)
    os.makedirs(landing, exist_ok=True)
    # pre-clean any *.xlsx already in the dir (e.g. after lowering
    # _N_FILES) so the glob reads exactly this run's workbooks
    for stale in os.listdir(landing):
        if stale.endswith(".xlsx"):
            os.unlink(os.path.join(landing, stale))
    rows = (
        load_table(spark, sf_dir, "events")
        .select(*_COLS)
        .orderBy("event_id")
        .limit(_N_ROWS)
        .collect()
    )
    per_file = _N_ROWS // _N_FILES
    for i in range(_N_FILES):
        chunk = rows[i * per_file : (i + 1) * per_file]
        write_minimal_xlsx(
            os.path.join(landing, f"part{i}.xlsx"),
            _COLS,
            [[r[c] for c in _COLS] for r in chunk],
        )
    # decoy the reference's filter must ignore (main.py:12 semantics,
    # pushed down to the scan as pathGlobFilter="*.xlsx")
    with open(os.path.join(landing, "ignore.csv"), "w") as fh:
        fh.write("event_id\n-1\n")
    return read_xlsx(spark, landing, _COLS, schema_ddl=_DDL).select(*_COLS)


_XLSX_SQL = f"""
SELECT event_id, user_id, event_type, value
FROM events
ORDER BY event_id
LIMIT {_N_ROWS}
"""


QUERIES = {
    "xlsx_ingest_roundtrip": xlsx_ingest_roundtrip,
}

ORACLE = {
    "xlsx_ingest_roundtrip": _XLSX_SQL,
}
