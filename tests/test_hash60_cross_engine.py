"""Direct cross-engine pin for the hash60 triple — the md5-prefix hash
every salted sampling stream, split, minhash sketch, and weighted-sample
key is built on. The parity gates verify it implicitly on fixture data;
this test pins it explicitly on adversarial inputs (unicode, quotes,
whitespace variants, long strings, empty) so a drift in any one of the
three definitions (`functions.text.hash60` Column form, SPARK_HASH60
expression-string form, SQL_HASH60 DuckDB form) fails here with the
offending input named, not as an opaque hash mismatch in a gate query.

Property-based (hypothesis) over printable + unicode text, plus a fixed
adversarial corpus. md5 of the UTF-8 bytes must agree byte-for-byte
across Spark's md5(), DuckDB's md5(), and the 15-hex-digit prefix must
parse to the same BIGINT through conv(…,16,10) vs '0x…'::BIGINT.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from etl_gcp_function_tmabrasil_spark.functions.text import hash60
from etl_gcp_function_tmabrasil_spark.queries._util import (
    SPARK_HASH60,
    SQL_HASH60,
)

ADVERSARIAL = [
    "",
    " ",
    "\t",
    "a",
    "doc_id/split",
    "it's quoted",
    'double "quotes"',
    "semi;colon--comment",
    "ünïcodé Ωμέγα 漢字 🎉",
    "line\nbreak",
    "null\x00byte" .replace("\x00", ""),  # embedded NUL excluded: Spark
    # literals cannot carry it through a SQL string; the engine never
    # hashes raw NULs (inputs are id||salt concatenations)
    "x" * 4096,
    "0x123",
    "-1",
]


def _spark_hash(spark, values: list[str]) -> list[int]:
    df = spark.createDataFrame([(v,) for v in values], "s string")
    col_form = df.select(hash60(F.col("s")).alias("h")).collect()
    expr_form = df.select(
        F.expr(SPARK_HASH60.format(expr="s")).alias("h")
    ).collect()
    assert [r.h for r in col_form] == [r.h for r in expr_form], (
        "hash60 Column form and SPARK_HASH60 expression form disagree"
    )
    return [r.h for r in col_form]


def _duck_hash(values: list[str]) -> list[int]:
    con = duckdb.connect()
    out = []
    for v in values:
        expr = SQL_HASH60.format(expr="?::VARCHAR")
        out.append(con.execute(f"SELECT {expr}", [v]).fetchone()[0])
    return out


def test_hash60_adversarial_corpus(spark):
    assert _spark_hash(spark, ADVERSARIAL) == _duck_hash(ADVERSARIAL)


@pytest.fixture(scope="module")
def _spark_for_property(spark):
    return spark


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",),  # no lone surrogates
                blacklist_characters="\x00",
            ),
            max_size=64,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_hash60_property(_spark_for_property, values):
    assert _spark_hash(_spark_for_property, values) == _duck_hash(values)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        # fixed-point "money" doubles with <= 2 decimals, the csum
        # validity domain (quantity/price/value columns)
        st.integers(min_value=-10_000_000, max_value=10_000_000).map(
            lambda c: c / 100.0
        ),
        min_size=1,
        max_size=50,
    )
)
def test_csum_bit_identical_to_dsum(_spark_for_property, values):
    """csum's docstring claims its integer-cents fast path is
    bit-identical to dsum's decimal accumulation on <=2-decimal
    fixed-point data — every money rollup in the registry relies on
    the two being interchangeable. Pin it property-based: for random
    cent-valued doubles (incl. negatives), the two sums must be the
    SAME double, bit for bit."""
    import struct

    from etl_gcp_function_tmabrasil_spark.queries._util import csum, dsum

    spark = _spark_for_property
    df = spark.createDataFrame([(v,) for v in values], "v double")
    row = df.agg(
        csum("v").alias("c"), dsum("v", scale=2).alias("d")
    ).collect()[0]
    cb = struct.pack("<d", row.c)
    db = struct.pack("<d", row.d)
    assert cb == db, f"csum={row.c!r} != dsum={row.d!r} for {values[:5]}..."
