"""Round-15 operator tests: brute-force definitional recomputes in
plain Python against the registered Spark implementations."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _langid_confusion_python(rows):
    """Literal recompute of text_langid_hashed_ngram's definition:
    NB log-likelihood weights over hashed char-3-grams, 8-dp
    fixed-point, argmax with (score desc, lang asc) ties."""
    from etl_gcp_function_tmabrasil_spark.queries.text_analysis import (
        LANGID_B,
        LANGID_GRAM,
        LANGID_HOLDOUT,
    )

    def grams(text):
        t = re.sub(r"[ \t\n\r\f\x0B]+", " ", text.strip()).lower()
        return [
            t[i : i + LANGID_GRAM]
            for i in range(len(t) - LANGID_GRAM + 1)
        ]

    cnt: dict[tuple[str, int], int] = Counter()
    tot: dict[str, int] = Counter()
    nd: dict[str, int] = Counter()
    for doc_id, lang, text in rows:
        if doc_id % LANGID_HOLDOUT == 0:
            continue
        nd[lang] += 1
        for g in grams(text):
            b = _hash60(g) % LANGID_B
            cnt[(lang, b)] += 1
            tot[lang] += 1
    ndt = sum(nd.values())
    w = {
        (lang, b): round(
            math.log((cnt.get((lang, b), 0) + 1) / (tot[lang] + LANGID_B)),
            8,
        )
        for lang in tot
        for b in range(LANGID_B)
    }
    prior = {lang: round(math.log(nd[lang] / ndt), 8) for lang in nd}
    confusion: dict[tuple[str, str], int] = Counter()
    for doc_id, lang, text in rows:
        if doc_id % LANGID_HOLDOUT != 0:
            continue
        tf = Counter(_hash60(g) % LANGID_B for g in grams(text))
        # exact decimal: every term is an 8-dp fixed-point value, so
        # integer arithmetic over round(x*1e8) reproduces both engines
        scores = {
            lang2: sum(
                n * round(w[(lang2, b)] * 10**8) for b, n in tf.items()
            )
            + round(prior[lang2] * 10**8)
            for lang2 in tot
        }
        pred = min(scores, key=lambda k: (-scores[k], k))
        confusion[(lang, pred)] += 1
    return dict(confusion)


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_SMALL])
def test_langid_hashed_ngram_brute_force(spark, sf_dir):
    from etl_gcp_function_tmabrasil_spark.queries.text_analysis import (
        text_langid_hashed_ngram,
    )

    rows = [
        (r.doc_id, r.lang, r.text)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "text")
        .collect()
    ]
    want = _langid_confusion_python(rows)
    got = {
        (r.true_lang, r.pred_lang): r.n_docs
        for r in text_langid_hashed_ngram(spark, sf_dir).collect()
    }
    assert got == want
