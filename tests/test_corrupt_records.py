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


def test_json_extraction_path_semantics(spark):
    """Pin the MEASURED divergences between the three JSON field
    extraction paths (Spark 4.1.2) so a path swap inside a query can
    never silently change results:

    - all three agree on plain integers, null/absent keys, malformed
      JSON, wrong-shaped values (array/object/non-numeric string);
    - VARIANT (`try_variant_get(..., 'bigint')`) additionally COERCES
      scalar-convertibles: numeric strings ("9"→9), doubles with
      truncation (1.5→1), booleans (true→1), scientific notation
      (1e3→1000) — where get_json_object+try_cast and from_json give
      NULL (from_json also NULLs numeric strings).

    json_variant_ops' oracle is only valid because the events contract
    keeps props.k a plain integer — the domain where all paths agree;
    this test is the tripwire for that assumption."""
    cases = [
        # (payload, variant, gjo_trycast, from_json)
        ('{"k": 7}', 7, 7, 7),
        ('{"k": -3}', -3, -3, -3),
        ('{"k": 9223372036854775807}', 2**63 - 1, 2**63 - 1, 2**63 - 1),
        ('{"k": "9"}', 9, 9, None),
        ('{"k": 1.5}', 1, None, None),
        ('{"k": null}', None, None, None),
        ("{}", None, None, None),
        ('{"k": [1]}', None, None, None),
        ('{"k": {"x": 1}}', None, None, None),
        ("not json", None, None, None),
        ("", None, None, None),
        ('{"k": true}', 1, None, None),
        ('{"K": 7}', None, None, None),
        ('{"k": "abc"}', None, None, None),
        ("[1,2]", None, None, None),
        ("null", None, None, None),
        ('{"k": 1e3}', 1000, None, None),
    ]
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(cases)], "i int, s string"
    )
    rows = (
        df.select(
            "i",
            F.try_variant_get(F.try_parse_json("s"), "$.k", "bigint").alias("v"),
            F.expr("try_cast(get_json_object(s, '$.k') AS BIGINT)").alias("g"),
            F.from_json("s", "k BIGINT").getField("k").alias("f"),
        )
        .orderBy("i")
        .collect()
    )
    for (payload, ev, eg, ef), r in zip(cases, rows):
        assert (r.v, r.g, r.f) == (ev, eg, ef), (
            f"{payload!r}: got variant={r.v} gjo={r.g} from_json={r.f}, "
            f"expected {ev}/{eg}/{ef}"
        )
