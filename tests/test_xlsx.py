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
