"""Deterministic semantics pin for dedup_corpus_lines (the C4-style
repeated-line scrub): the oracle gate exercises it statistically (the
sf0.01 fixture holds 17 lines occurring >= 3 times, max 6), but the
boundary behavior — drop at exactly LINE_DUP_MIN occurrences, keep at
LINE_DUP_MIN - 1, reassembly in original line order — deserves a
handcrafted corpus where every expectation is computed by eye."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_gcp_function_tmabrasil_spark.queries.curation_ops import (
    LINE_DUP_MIN,
    LINE_WORDS,
    dedup_corpus_lines,
)

# one "line" = LINE_WORDS words; build lines from single-letter words
BOILER = " ".join(["b"] * LINE_WORDS)   # appears 3x (= LINE_DUP_MIN) → dropped
TWICE = " ".join(["t"] * LINE_WORDS)    # appears 2x → kept
UNIQ = [" ".join([f"u{d}"] * LINE_WORDS) for d in range(3)]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("line_corpus")
    docs = [
        # doc 0: boiler, uniq0, twice  → boiler dropped, 2 kept
        (0, " ".join([BOILER, UNIQ[0], TWICE])),
        # doc 1: uniq1, boiler         → boiler dropped, 1 kept
        (1, " ".join([UNIQ[1], BOILER])),
        # doc 2: boiler, twice, uniq2  → boiler dropped, 2 kept
        (2, " ".join([BOILER, TWICE, UNIQ[2]])),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
            "text": pa.array([t for _, t in docs], type=pa.string()),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([len(t) for _, t in docs], type=pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(str(out), "documents.parquet"))
    return str(out)


def test_boundary_drop_keep_and_order(spark, corpus_dir):
    assert LINE_DUP_MIN == 3, "test corpus is built for the C4 threshold"
    rows = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["n_chars_clean"])
        for r in dedup_corpus_lines(spark, corpus_dir).collect()
    }
    # doc 0: 3 lines, boiler dropped → uniq0 + twice joined by one space
    assert rows[0] == (3, 2, len(UNIQ[0]) + 1 + len(TWICE)), rows[0]
    # doc 1: 2 lines, boiler dropped → just uniq1
    assert rows[1] == (2, 1, len(UNIQ[1]))
    # doc 2: 3 lines, boiler dropped → twice + uniq2 in original order
    assert rows[2] == (3, 2, len(TWICE) + 1 + len(UNIQ[2]))


def test_below_threshold_corpus_is_untouched(spark, tmp_path):
    """A corpus where every line occurs fewer than LINE_DUP_MIN times
    must pass through byte-identical (n_kept == n_lines and cleaned
    length == original length per doc)."""
    docs = [
        (0, " ".join([UNIQ[0], TWICE])),
        (1, " ".join([TWICE, UNIQ[1]])),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
            "text": pa.array([t for _, t in docs], type=pa.string()),
            "lang": pa.array(["en"] * 2),
            "source": pa.array(["s"] * 2),
            "n_chars": pa.array([len(t) for _, t in docs], type=pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "documents.parquet"))
    for r in dedup_corpus_lines(spark, str(tmp_path)).collect():
        assert r["n_kept"] == r["n_lines"]
        original = dict(docs)[r["doc_id"]]
        assert r["n_chars_clean"] == len(original)


from hypothesis import HealthCheck, given, settings, strategies as st


def _reference(docs):
    """Plain-Python line dedup: returns {doc_id: (n_lines, n_kept,
    n_chars_clean)} for LINE_WORDS-word lines, dropping lines occurring
    >= LINE_DUP_MIN times corpus-wide, keeping document order."""
    from collections import Counter

    per_doc = {}
    counts = Counter()
    for doc_id, words in docs:
        ls = [
            " ".join(words[i : i + LINE_WORDS])
            for i in range(0, len(words), LINE_WORDS)
        ]
        per_doc[doc_id] = ls
        counts.update(ls)
    out = {}
    for doc_id, ls in per_doc.items():
        kept = [l for l in ls if counts[l] < LINE_DUP_MIN]
        out[doc_id] = (len(ls), len(kept), len(" ".join(kept)))
    return out


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus=st.lists(
        st.lists(
            # 2-word alphabet → dense cross-document line collisions
            st.sampled_from(["x", "y"]),
            min_size=1,
            max_size=3 * LINE_WORDS + 2,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_matches_python_reference_on_random_corpora(
    spark, tmp_path_factory, corpus
):
    """On random tiny-alphabet corpora (maximizing repeated lines and
    ragged trailing lines), the Spark operator must agree with the
    obvious in-process implementation exactly."""
    docs = [(i, words) for i, words in enumerate(corpus)]
    tmp = tmp_path_factory.mktemp("lines_prop")
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
            "text": pa.array([" ".join(w) for _, w in docs]),
            "lang": pa.array(["en"] * len(docs)),
            "source": pa.array(["s"] * len(docs)),
            "n_chars": pa.array(
                [len(" ".join(w)) for _, w in docs], type=pa.int64()
            ),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp), "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["n_chars_clean"])
        for r in dedup_corpus_lines(spark, str(tmp)).collect()
    }
    assert got == _reference(docs)
