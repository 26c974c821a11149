"""Text primitives shared by the text-analysis and near-dup operators:
whitespace tokenization, word shingles, and the engine-reproducible
60-bit md5 hash (SQL twin in queries/_util.SQL_HASH60)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def tokens(text: Column | str = "text") -> Column:
    """Whitespace tokens (the driver corpus is pre-normalized; production
    would lower/strip punctuation first)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def hash60(col: Column, seed: int | None = None) -> Column:
    """60-bit hash from the md5 hex prefix, as signed BIGINT — chosen
    over xxhash64 for cross-engine reproducibility (DuckDB can replicate
    it exactly; see queries/_util.SQL_HASH60)."""
    inp = F.concat(F.lit(f"{seed}:"), col) if seed is not None else col
    return F.conv(F.substring(F.md5(inp), 1, 15), 16, 10).cast("long")


def word_shingles(toks: Column, k: int = 3, fallback: Column | str = "text") -> Column:
    """k-word shingles, 1-based (matches DuckDB list indexing). Documents
    shorter than k words fall back to a single whole-text shingle."""
    fb = F.col(fallback) if isinstance(fallback, str) else fallback
    return F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(k)]
            ),
        ),
    ).otherwise(F.array(fb))
