"""Malformed-input routing at the JSON scan (the format-layer analog of
the reference's reject branch, `/root/reference/main.py:13-14`):
PERMISSIVE mode keeps bad lines in a corrupt-record column so the
pipeline can dead-letter them instead of failing the job."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T


def test_permissive_json_routes_corrupt_records(spark, tmp_path):
    p = tmp_path / "raw.json"
    p.write_text(
        '{"bucket": "b", "name": "minha-pasta/a.xlsx", "size": 10}\n'
        "this is not json at all\n"
        '{"bucket": "b", "name": 42}\n'
        '{"bucket": "b", "name": "minha-pasta/b.xlsx", "size": 20}\n'
    )
    schema = T.StructType(
        [
            T.StructField("bucket", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("size", T.LongType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
        .cache()  # Spark requires materialization before filtering corrupt col
    )
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 3  # name:42 coerces? no — stays typed row with null name
    assert bad.count() == 1
    names = {r.name for r in good.collect()}
    assert "minha-pasta/a.xlsx" in names and "minha-pasta/b.xlsx" in names
