"""XLSX ingestion-edge tests (FIXTURES.md `xlsx_sheet`): write workbooks
mirroring a slice of `events`, read them back distributed, compare with
the same slice from parquet."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_gcp_function_tmabrasil_spark.catalog import load_table
from etl_gcp_function_tmabrasil_spark.sources.xlsx import (
    parse_xlsx_bytes,
    read_xlsx,
    write_minimal_xlsx,
)
from tests.conftest import SF_SMOKE

COLS = ["event_id", "user_id", "event_type", "value"]


@pytest.fixture(scope="module")
def xlsx_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("xlsx_landing")
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select(*COLS)
        .orderBy("event_id")
        .limit(100)
        .collect()
    )
    # two workbooks of 50 rows each → two parallel parse tasks
    for i in range(2):
        rows = [[r.event_id, r.user_id, r.event_type, r.value] for r in ev[i * 50 : (i + 1) * 50]]
        write_minimal_xlsx(str(out / f"part{i}.xlsx"), COLS, rows)
    # a decoy that must be ignored by the path glob
    (out / "ignore.csv").write_text("event_id\n999\n")
    return str(out)


def test_roundtrip_vs_parquet(spark, xlsx_dir):
    df = read_xlsx(
        spark,
        xlsx_dir,
        COLS,
        schema_ddl="event_id long, user_id long, event_type string, value double",
    )
    got = {r.event_id: (r.user_id, r.event_type, r.value) for r in df.collect()}
    want = {
        r.event_id: (r.user_id, r.event_type, r.value)
        for r in load_table(spark, SF_SMOKE, "events")
        .select(*COLS)
        .orderBy("event_id")
        .limit(100)
        .collect()
    }
    assert got == want
    assert df.count() == 100


def test_source_file_column(spark, xlsx_dir):
    df = read_xlsx(spark, xlsx_dir, COLS)
    files = {r._source_file.rsplit("/", 1)[-1] for r in df.select("_source_file").distinct().collect()}
    assert files == {"part0.xlsx", "part1.xlsx"}


def test_parse_handles_shared_and_inline_strings():
    # inline strings path (our writer) — plus empty + special chars
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.xlsx")
        write_minimal_xlsx(p, ["a", "b"], [["x<&>y", 1.5], [None, 2]])
        pdf = parse_xlsx_bytes(open(p, "rb").read())
        assert list(pdf.columns) == ["a", "b"]
        assert pdf.iloc[0]["a"] == "x<&>y"
        assert pdf.iloc[0]["b"] == "1.5"
        assert pdf.iloc[1]["a"] is None


def test_corrupt_workbook_fails_loudly(spark, tmp_path):
    bad = tmp_path / "bad.xlsx"
    bad.write_bytes(b"this is not a zip")
    with pytest.raises(Exception):
        read_xlsx(spark, str(tmp_path), COLS).collect()


def test_empty_and_header_mismatch_yield_null_columns(spark, tmp_path):
    # header-only workbook -> zero rows; workbook whose header shares no
    # names with the requested columns -> n rows of NULLs (neither may
    # crash the mapInPandas task)
    from etl_gcp_function_tmabrasil_spark.sources.xlsx import (
        read_xlsx,
        write_minimal_xlsx,
    )

    write_minimal_xlsx(str(tmp_path / "header_only.xlsx"), ["a", "b"], [])
    write_minimal_xlsx(
        str(tmp_path / "other_header.xlsx"), ["x", "y"], [[1, 2], [3, 4]]
    )
    out = read_xlsx(spark, str(tmp_path), ["a", "b"]).collect()
    by_file = {}
    for r in out:
        by_file.setdefault(r._source_file.rsplit("/", 1)[-1], []).append(r)
    assert "header_only.xlsx" not in by_file  # zero data rows
    rows = by_file["other_header.xlsx"]
    assert len(rows) == 2 and all(r.a is None and r.b is None for r in rows)


def test_ragged_row_beyond_header_fails_loudly(tmp_path):
    # a data cell to the right of the header's last column would be
    # silently dropped by a truncating read — the contract is to raise
    import zipfile

    from etl_gcp_function_tmabrasil_spark.sources.xlsx import (
        parse_xlsx_bytes,
        write_minimal_xlsx,
    )

    p = str(tmp_path / "ragged.xlsx")
    write_minimal_xlsx(p, ["a"], [[1]])
    # widen the data row past the 1-column header by editing the sheet
    with zipfile.ZipFile(p) as zf:
        names = {n: zf.read(n) for n in zf.namelist()}
    sheet = names["xl/worksheets/sheet1.xml"].decode()
    sheet = sheet.replace(
        '<c r="A2"', '<c r="E2" t="inlineStr"><is><t>lost</t></is></c><c r="A2"', 1
    )
    names["xl/worksheets/sheet1.xml"] = sheet.encode()
    with zipfile.ZipFile(p, "w") as zf:
        for n, data in names.items():
            zf.writestr(n, data)
    import pytest

    with pytest.raises(ValueError, match="beyond the 1-column header"):
        parse_xlsx_bytes(open(p, "rb").read())


def test_oversized_workbook_fails_before_content_read(spark, tmp_path):
    from etl_gcp_function_tmabrasil_spark.sources.xlsx import (
        read_xlsx,
        write_minimal_xlsx,
    )

    write_minimal_xlsx(str(tmp_path / "big.xlsx"), ["a"], [[1], [2]])
    import pytest

    with pytest.raises(ValueError, match="xlsx too large"):
        read_xlsx(spark, str(tmp_path), ["a"], max_file_bytes=10)


def test_tolerant_read_dead_letters_file_grown_after_prescan(spark, tmp_path):
    """The oversize race: a file that grows past max_file_bytes AFTER
    the driver pre-scan is removed by the content scan's pushed-down
    length filter — the anti-join backstop must synthesize its
    'oversize' marker so the event dead-letters instead of vanishing.
    The scan lists lazily at action time, so appending to the file
    between construction and collect() reproduces the race exactly."""
    from etl_gcp_function_tmabrasil_spark.sources.xlsx import read_xlsx_tolerant

    good = tmp_path / "good.xlsx"
    grower = tmp_path / "grower.xlsx"
    write_minimal_xlsx(str(good), COLS, [[1, 10, "click", 1.5]])
    write_minimal_xlsx(str(grower), COLS, [[2, 20, "view", 2.5]])
    cap = max(good.stat().st_size, grower.stat().st_size) + 1024
    df = read_xlsx_tolerant(spark, [str(good), str(grower)], COLS, max_file_bytes=cap)
    # the race: grower passes the pre-scan, then grows past the cap
    # before the content scan lists it
    with open(grower, "ab") as fh:
        fh.write(b"\0" * (cap + 1))
    rows = {r._source_file.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert rows["good.xlsx"]._status == "ok"
    assert rows["grower.xlsx"]._status == "oversize", (
        "grown file silently dropped — every requested path must yield a row"
    )
    assert rows["grower.xlsx"].event_id is None
