"""Deterministic semantics pins for dedup_repeated_substrings (the
content-defined-anchor approximation of suffix-array substring dedup).
The oracle gate proves Spark == DuckDB; these pins prove both equal the
INTENDED semantics via an independent Python reference, and exercise
the two properties the design exists for:

- alignment robustness: the same passage embedded at offsets that
  differ by a stride-hostile amount is still detected (a fixed-stride
  sampler would structurally miss it);
- the cross-document criterion: a document repeating ITS OWN passage
  is never flagged.
"""

from __future__ import annotations

import hashlib
import os
import random
from collections import defaultdict

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_gcp_function_tmabrasil_spark.queries.curation_ops import (
    SUBSTR_A,
    SUBSTR_W,
    dedup_repeated_substrings,
)


def _windows(text: str) -> list[str]:
    """Python reference for the anchored window sampler."""
    out = []
    for p in range(len(text) - SUBSTR_W + 1):  # 0-based
        anchor = text[p : p + SUBSTR_A]
        if hashlib.md5(anchor.encode()).hexdigest()[-1] == "0":
            out.append(text[p : p + SUBSTR_W])
    return out


def _reference(docs: list[tuple[int, str]]) -> dict[int, tuple[int, int]]:
    """doc_id -> (n_windows, dup_windows) per the intended semantics."""
    per_doc = {d: _windows(t) for d, t in docs}
    owners = defaultdict(set)
    for d, ws in per_doc.items():
        for w in ws:
            owners[w].add(d)
    return {
        d: (len(ws), sum(1 for w in ws if len(owners[w]) >= 2))
        for d, ws in per_doc.items()
        if ws
    }


def _rand_text(rng: random.Random, n: int) -> str:
    return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(n))


PASSAGE_LEN = 160  # (15/16)^(160-39) miss probability ≈ 0.04%


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    rng = random.Random(20260815)
    passage = _rand_text(rng, PASSAGE_LEN)
    self_rep = _rand_text(rng, 60)
    docs = [
        # passage at offset 0 in doc 0 and offset 7 in doc 1: 7 is
        # coprime to any small stride — a positional sampler would
        # share no window between the two copies
        (0, passage + _rand_text(rng, 80)),
        (1, _rand_text(rng, 7) + passage + _rand_text(rng, 80)),
        # doc 2 repeats its own 60-char span twice — cross-doc
        # criterion must NOT flag it
        (2, self_rep + _rand_text(rng, 40) + self_rep),
        # doc 3: unique content
        (3, _rand_text(rng, 200)),
        # doc 4: too short for any window
        (4, _rand_text(rng, SUBSTR_W - 1)),
    ]
    out = tmp_path_factory.mktemp("substr_corpus")
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
            "text": pa.array([t for _, t in docs], type=pa.string()),
            "lang": pa.array(["en"] * len(docs)),
            "source": pa.array(["s"] * len(docs)),
            "n_chars": pa.array([len(t) for _, t in docs], type=pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(str(out), "documents.parquet"))
    return str(out), docs


def test_matches_python_reference(spark, corpus):
    sf_dir, docs = corpus
    got = {
        r.doc_id: (r.n_windows, r.dup_windows)
        for r in dedup_repeated_substrings(spark, sf_dir).collect()
    }
    assert got == _reference(docs)


def test_misaligned_copies_are_detected(spark, corpus):
    """The passage sits at offset 0 in doc 0 and offset 7 in doc 1 —
    detection proves window sampling is content-defined, not
    positional."""
    sf_dir, docs = corpus
    # precondition: the passage anchors at least once (rng-seeded, so
    # this is a stable fact of the fixture, not a flaky draw)
    assert _reference(docs)[0][1] > 0
    got = {r.doc_id: r.dup_windows for r in
           dedup_repeated_substrings(spark, sf_dir).collect()}
    assert got[0] > 0 and got[1] > 0


def test_self_repeat_is_not_flagged(spark, corpus):
    sf_dir, docs = corpus
    got = {r.doc_id: r.dup_windows for r in
           dedup_repeated_substrings(spark, sf_dir).collect()}
    assert got[2] == 0
    assert got[3] == 0
    assert 4 not in got  # shorter than one window -> absent


def test_anchor_positions_shift_with_the_passage():
    """The reference sampler itself: anchored windows inside the
    passage are identical across both embeddings — the invariant the
    operator's recall argument rests on."""
    rng = random.Random(7)
    passage = _rand_text(rng, PASSAGE_LEN)
    a = _windows("xyz" + passage)
    b = _windows(_rand_text(rng, 11) + passage)
    shared = set(a) & set(b)
    assert shared, "no common anchored window across shifted copies"
    for w in shared:
        assert w in passage or passage in w
