"""Distributed XLSX ingestion — the reference's payload format
(``/root/reference/main.py:12``: objects are ``minha-pasta/*.xlsx``),
whose processing body the reference leaves as a placeholder
(``main.py:17``). Here it is made real and distributed:

    binaryFile scan (one row per workbook: path, length, content)
      → mapInPandas(parse_xlsx_bytes)  — one pandas batch per file
      → cast to a declared schema (strings at the parse edge, typed
        columns in the engine)

The parser is self-contained stdlib (zipfile + ElementTree): XLSX is a
zip of XML parts. It covers the common subset — one worksheet, shared
or inline strings, numeric cells, a header row — and fails loudly
beyond it. Swap in pandas.read_excel/openpyxl via the same
``parse_xlsx_bytes`` seam when those libs are available.

Scale notes: parallelism is per-file (matching the reference's
per-object invocation model, ``main.py:5``); each task holds one
decompressed sheet in memory — the reference's own 512 MB/worker bound
(``main.tf:51``) is respected by capping workbook size at the scan
(`maxFileSize` guard) and streaming rows out per batch.
"""

from __future__ import annotations

import io
import re
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree as ET

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")

#: Guard against a single giant workbook monopolizing task memory.
DEFAULT_MAX_FILE_BYTES = 256 * 1024 * 1024


def _col_index(ref: str) -> int:
    """'A'→0, 'B'→1, …, 'AA'→26 (cell reference column part)."""
    idx = 0
    for ch in ref:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def parse_xlsx_bytes(content: bytes) -> pd.DataFrame:
    """Parse one workbook's first worksheet into a string-typed pandas
    DataFrame, first row as header. Raises ValueError on workbooks
    outside the supported subset (no sheet, ragged header)."""
    with zipfile.ZipFile(io.BytesIO(content)) as zf:
        names = set(zf.namelist())
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", _NS):
                # direct <t> plus rich-text runs <r><t> ONLY — si.iter
                # would also swallow phonetic-run (<rPh><t>) text,
                # corrupting cells from workbooks with furigana data
                parts = [t.text or "" for t in si.findall("m:t", _NS)]
                parts += [t.text or "" for t in si.findall("m:r/m:t", _NS)]
                shared.append("".join(parts))
        sheet_name = next(
            (n for n in sorted(names) if n.startswith("xl/worksheets/sheet")), None
        )
        if sheet_name is None:
            raise ValueError("xlsx: no worksheet part found")
        root = ET.fromstring(zf.read(sheet_name))
        rows: list[dict[int, str]] = []
        for row in root.iter(f"{{{_NS['m']}}}row"):
            cells: dict[int, str] = {}
            for c in row.findall("m:c", _NS):
                ref = c.get("r", "")
                m = _CELL_REF.match(ref)
                col = _col_index(m.group(1)) if m else len(cells)
                ctype = c.get("t", "n")
                if ctype == "inlineStr":
                    t = c.find("m:is", _NS)
                    val = "".join(
                        x.text or "" for x in t.iter(f"{{{_NS['m']}}}t")
                    ) if t is not None else ""
                elif ctype == "s":
                    v = c.find("m:v", _NS)
                    val = shared[int(v.text)] if v is not None and v.text else ""
                else:
                    v = c.find("m:v", _NS)
                    val = v.text if v is not None and v.text is not None else ""
                cells[col] = val
            rows.append(cells)
    if not rows:
        return pd.DataFrame()
    header_cells = rows[0]
    if not header_cells:
        # a styled-but-cellless first <row/>: fail with a diagnosable
        # message, not max()'s bare 'arg is an empty sequence'
        raise ValueError("xlsx: first row has no cells to use as a header")
    ncols = max(header_cells) + 1
    header = [header_cells.get(i, f"col{i}") for i in range(ncols)]
    # fail loudly on VALUED data cells beyond the header's width:
    # silently truncating a ragged row to ncols would LOSE values (the
    # module contract is "fails loudly beyond the supported subset").
    # Value-LESS cells out there are fine — Excel routinely emits
    # styled-but-empty trailing cells (<c r="E2" s="1"/>), and dropping
    # an empty string loses nothing; raising on those would poison-pill
    # ordinary workbooks.
    for idx, r in enumerate(rows[1:], start=2):
        wide = [i for i, v in r.items() if i >= ncols and v not in ("", None)]
        if wide:
            raise ValueError(
                f"xlsx: data cell in row {idx} at column {max(wide) + 1} "
                f"beyond the {ncols}-column header"
            )
    data = [[r.get(i) for i in range(ncols)] for r in rows[1:]]
    return pd.DataFrame(data, columns=header, dtype=object)


def write_minimal_xlsx(path: str, columns: list[str], rows: list[list]) -> None:
    """Write a minimal single-sheet workbook (inline strings + numbers).
    Test/fixture writer — the production path is the reader above."""
    def cell_xml(col: int, row: int, v) -> str:
        ref = ""
        c = col + 1
        while c:
            c, r = divmod(c - 1, 26)
            ref = chr(ord("A") + r) + ref
        ref = f"{ref}{row + 1}"
        if v is None:
            return ""
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return f'<c r="{ref}"><v>{v}</v></c>'
        s = (
            str(v)
            .replace("&", "&amp;")
            .replace("<", "&lt;")
            .replace(">", "&gt;")
        )
        return f'<c r="{ref}" t="inlineStr"><is><t>{s}</t></is></c>'

    sheet_rows = []
    for ri, row in enumerate([columns] + rows):
        cells = "".join(cell_xml(ci, ri, v) for ci, v in enumerate(row))
        sheet_rows.append(f'<row r="{ri + 1}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(sheet_rows)}</sheetData></worksheet>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)


def read_xlsx(
    spark: SparkSession,
    path: str | list[str],
    columns: list[str],
    schema_ddl: str | None = None,
    path_glob: str = "*.xlsx",
    max_file_bytes: int = DEFAULT_MAX_FILE_BYTES,
) -> DataFrame:
    """Distributed XLSX read: one task per workbook.

    Returns string columns named `columns` plus `_source_file`; pass
    `schema_ddl` (e.g. ``"event_id long, value double"``) to cast typed
    columns engine-side (Catalyst casts, not pandas).
    """
    # Size guard BEFORE any bytes move: a metadata-only pre-scan (paths
    # and lengths — binaryFile prunes the unselected content column)
    # raises loudly on any oversized workbook, so no oversize file's
    # content is ever materialized or Arrow-shipped to Python in the
    # common path (a worker-side-only check would fire AFTER the
    # executor paid the full-content read — no OOM protection). The
    # content scan then loads exactly the validated file list — ONE
    # glob listing, and no silent `length <=` filter that would drop a
    # file grown between listing and read; that race instead hits the
    # worker-side backstop below, which fails loudly.
    meta = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", path_glob)
        .load(path)
        .select("path", "length")
        .collect()
    )
    over = [r for r in meta if r["length"] > max_file_bytes]
    if over:
        raise ValueError(
            f"xlsx too large: {over[0]['path']} ({over[0]['length']} bytes)"
        )
    out_fields = ", ".join(f"`{c}` string" for c in columns)
    out_schema = f"_source_file string, {out_fields}"
    if not meta:  # nothing matched the glob: empty frame, right schema
        df = spark.createDataFrame([], out_schema)
        return _apply_schema_ddl(df, schema_ddl)
    binary = (
        spark.read.format("binaryFile")
        .load([r["path"] for r in meta])
        .select("path", "length", "content")
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, r in pdf.iterrows():
                if r["length"] > max_file_bytes:  # grown since the pre-scan
                    raise ValueError(
                        f"xlsx too large: {r['path']} ({r['length']} bytes)"
                    )
                parsed = parse_xlsx_bytes(r["content"])
                # explicit per-column Series: a dict of all-scalar Nones
                # (empty workbook, or a header sharing no names with
                # `columns`) would make the DataFrame constructor raise
                # instead of yielding the intended null columns
                n = len(parsed)
                out = pd.DataFrame(
                    {
                        c: parsed[c].astype(object)
                        if c in parsed
                        else pd.Series([None] * n, dtype=object)
                        for c in columns
                    }
                )
                out.insert(0, "_source_file", r["path"])
                yield out

    return _apply_schema_ddl(binary.mapInPandas(parse, schema=out_schema), schema_ddl)


def read_xlsx_tolerant(
    spark: SparkSession,
    paths: list[str],
    columns: list[str],
    schema_ddl: str | None = None,
    max_file_bytes: int = DEFAULT_MAX_FILE_BYTES,
) -> DataFrame:
    """Per-file fault-isolated XLSX read for streaming ETL.

    Unlike :func:`read_xlsx` (which fails the whole job loudly — right
    for batch), every file here yields AT LEAST one row and no file can
    fail the task: a checkpointed stream replays a failed micro-batch
    with the identical file list, so one poisoned object would
    otherwise wedge ingestion permanently. Schema adds `_status`
    ('ok' | 'empty' | 'error' | 'oversize') and `_error`; data rows
    carry _status='ok', non-data files produce exactly one marker row
    with the data columns NULL. Oversized files are pruned from the
    content scan by a pushed-down length filter (no bytes move) and
    reported as driver-synthesized 'oversize' rows.

    The ≥1-row invariant is enforced, not assumed: a file that GROWS
    past `max_file_bytes` between the driver pre-scan and the executor
    content scan is removed by the pushed-down length filter with no
    marker — an anti-join of the expected paths against the distinct
    `_source_file` values actually returned synthesizes an 'oversize'
    marker for any such zero-row path, so the event dead-letters
    instead of vanishing (the scan is persisted so this backstop does
    not re-parse the batch).
    """
    out_fields = ", ".join(f"`{c}` string" for c in columns)
    out_schema = f"_source_file string, _status string, _error string, {out_fields}"
    meta = (
        spark.read.format("binaryFile").load(paths).select("path", "length").collect()
        if paths
        else []
    )
    ok_paths = [r["path"] for r in meta if r["length"] <= max_file_bytes]
    over = [
        (r["path"], "oversize", f"xlsx too large: {r['length']} bytes")
        for r in meta
        if r["length"] > max_file_bytes
    ]
    frames = []
    if ok_paths:
        binary = (
            spark.read.format("binaryFile")
            .load(ok_paths)
            .filter(F.col("length") <= max_file_bytes)  # grown-since-listing race
            .select("path", "content")
        )

        def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            def marker(path: str, status: str, error: str | None) -> pd.DataFrame:
                m = pd.DataFrame(
                    {c: pd.Series([None], dtype=object) for c in columns}
                )
                m.insert(0, "_error", error)
                m.insert(0, "_status", status)
                m.insert(0, "_source_file", path)
                return m

            for pdf in batches:
                for _, r in pdf.iterrows():
                    try:
                        parsed = parse_xlsx_bytes(r["content"])
                    except Exception as exc:  # noqa: BLE001 — isolated per file
                        yield marker(r["path"], "error", str(exc)[:500])
                        continue
                    n = len(parsed)
                    if n == 0:
                        yield marker(r["path"], "empty", None)
                        continue
                    out = pd.DataFrame(
                        {
                            c: parsed[c].astype(object)
                            if c in parsed
                            else pd.Series([None] * n, dtype=object)
                            for c in columns
                        }
                    )
                    out.insert(0, "_error", None)
                    out.insert(0, "_status", "ok")
                    out.insert(0, "_source_file", r["path"])
                    yield out

        # deferred import: queries._util → queries/__init__ imports
        # ingest_xlsx which imports this module (cycle at import time,
        # none at call time)
        from etl_gcp_function_tmabrasil_spark.queries._util import managed_persist

        scanned = managed_persist(
            binary.mapInPandas(parse, schema=out_schema),
            "sources.xlsx.tolerant_scan",
        )
        # zero-row backstop (see docstring): the length filter above can
        # drop a grown file with no marker; synthesize it here. One
        # single-string-column shuffle per batch — noise next to the
        # XLSX parse.
        expected = spark.createDataFrame(
            [(p,) for p in ok_paths], "_source_file string"
        )
        dropped = expected.join(
            scanned.select("_source_file").distinct(), "_source_file", "left_anti"
        ).select(
            "_source_file",
            F.lit("oversize").alias("_status"),
            F.lit(
                "produced no rows: grew past max_file_bytes between "
                "listing and content scan"
            ).alias("_error"),
            *[F.lit(None).cast("string").alias(c) for c in columns],
        )
        frames.append(scanned.unionByName(dropped))
    if over:
        frames.append(
            spark.createDataFrame(
                [row + (None,) * len(columns) for row in over], out_schema
            )
        )
    if not frames:
        frames.append(spark.createDataFrame([], out_schema))
    df = frames[0]
    for extra in frames[1:]:
        df = df.unionByName(extra)
    return _apply_schema_ddl(df, schema_ddl)


def _apply_schema_ddl(df: DataFrame, schema_ddl: str | None) -> DataFrame:
    """Cast the string columns named in `schema_ddl` to their declared
    types; columns of `df` not named in the DDL pass through unchanged.
    Parsed with Spark's own DDL parser — a hand-rolled comma/space
    split breaks on any parametrized type (``decimal(10,2)``)."""
    if not schema_ddl:
        return df
    from pyspark.sql.types import StructType

    typed = {f.name: f.dataType for f in StructType.fromDDL(schema_ddl).fields}
    return df.select(
        *[
            F.col(c).cast(typed[c]).alias(c) if c in typed else F.col(c)
            for c in df.columns
        ]
    )
