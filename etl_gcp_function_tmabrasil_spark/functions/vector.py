"""Vector math over array columns via higher-order functions — the
JVM-side path for embedding operators (SURVEY.md §2.2 "embedding column
ops"). No UDFs: `zip_with` + `aggregate` keep the arithmetic inside
codegen, and the sequential left-to-right accumulation makes results
bit-reproducible across engines (the DuckDB oracle computes the same
order)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity. Callers should round before ranking so top-k
    selections are identical across engines/summation orders."""
    return dot(a, b) / (l2norm(a) * l2norm(b))


def as_double_array(col: Column) -> Column:
    """Widen array<float> to array<double> (exact)."""
    return F.transform(col, lambda x: x.cast("double"))
