"""Reusable expression libraries (all JVM-side Column expressions —
no Python in the data path): vector math over array<float/double>
columns and text/hashing primitives shared by the dedup and similarity
operators."""

from etl_gcp_function_tmabrasil_spark.functions.vector import cosine, dot, l2norm
from etl_gcp_function_tmabrasil_spark.functions.text import (
    hash60,
    tokens,
    word_shingles,
)

__all__ = ["dot", "l2norm", "cosine", "hash60", "tokens", "word_shingles"]
