"""Second wave of training-data-pipeline operators (north star "beyond
the reference's own operators, add the operations a large-scale
training-data pipeline would need"):

- BPE merge-pair counting: the inner-loop statistic of byte-pair-
  encoding tokenizer training — counts of adjacent token pairs, top-N
  merge candidates.
- Embedding gram matrix: the distributed accumulation pass behind
  covariance/PCA/whitening of an embedding corpus.
- Event funnel conversion: staged user-journey counts over the events
  stream (the behavioral-analytics twin of multi-step filtering).
- BM25 document scoring: the retrieval-relevance pass of a search/RAG
  index build.
- Curriculum temperature sampling: deterministic per-source
  mixture-reweighted corpus sampling (rate ∝ share^(α-1)).
- Train/val/test splitting: hash-unit interval assignment with
  per-split integrity accounting.
- Unigram LM scoring: perplexity-proxy document quality ranking under
  the corpus's own token distribution.
- Source overlap matrix: shared-shingle containment per source pair —
  the corpus-contamination audit before mixing crawl dumps.

Scale design, per operator, is documented on each function; the gram
matrix is the repo's canonical example of the "partial aggregate in
numpy, exact combine in SQL" pattern for fixed-width dense math that
per-row declarative expressions would explode 4096x.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_gcp_function_tmabrasil_spark.catalog import load_table
from etl_gcp_function_tmabrasil_spark.queries._util import (
    SPARK_HASH60,
    SQL_HASH60,
    WS_CLASS,
)

BPE_TOP_N = 40

_PAIRS = (
    "zip_with(slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1),"
    " (a, b) -> concat(a, ' ', b))"
)


def bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-40 adjacent token pairs by corpus frequency — the candidate
    ranking each BPE merge iteration computes (over words here; over
    byte tokens in a real tokenizer run, same plan).

    Scale notes: canonical word-count shape on pair keys — row-local
    zip_with builds the pair list (no quadratic anything: n-1 pairs per
    n-token doc), explode feeds a partial+final hash agg, and the top-N
    compiles to TakeOrderedAndProject (no global sort). One shuffle of
    (distinct pair, partial count) rows; at 100 TB the shuffle carries
    vocabulary-sized data, not the token stream. (r15 note: the
    layout-guarded compute spread was measured here and REJECTED —
    clean-host close-out 0.248 s without vs ~0.6-1.0 s with; the
    zip_with+explode+partial-agg front is cheap enough per row that
    the round-robin exchange of the raw text costs more than the
    parallelism buys.)
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.split("text", " ").alias("toks"))
    pairs = d.select(F.explode(F.expr(_PAIRS)).alias("pair"))
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(BPE_TOP_N)
    )


_BPE_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
p AS (
  SELECT UNNEST(list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1])) AS pair
  FROM t
)
SELECT pair, COUNT(*) AS n FROM p
GROUP BY pair ORDER BY n DESC, pair ASC LIMIT {BPE_TOP_N}
"""


GRAM_SCALE = 1_000_000  # fixed-point quantization: 6 decimal places


def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangular gram matrix G[i,j] = Σ_rows e_i·e_j over the
    embedding corpus — the accumulation pass of covariance / PCA /
    whitening (the downstream DIM×DIM eigensolve is driver-side and
    trivial; the corpus scan is the distributed work).

    Scale design — the "numpy partials, exact SQL combine" pattern:
    a declarative posexplode² would multiply the corpus 4096× before
    the shuffle. Instead an Arrow-batched mapInPandas computes each
    batch's outer-product sum as ONE int64 matmul and emits only the
    DIM·(DIM+1)/2 upper-tri partials per batch; the shuffle then
    carries O(batches · DIM²) tiny rows into a partial+final sum.
    Exactness across engines: embeddings are fixed-point quantized at
    6 dp (floor(x·1e6 + 0.5) — the engine-invariant rounding used by
    embedding_quantize_int8), so every partial is exact integer math
    and the final combine sums decimals — no float summation order
    anywhere, bit-identical to the DuckDB oracle's per-element sum.
    Int64 exactness of a partial needs max|q|²·batch_rows < 2^63; that
    holds for unit-scale embeddings at any sane Arrow batch size and is
    enforced by an explicit guard rather than assumed.
    """
    # NULL embeddings: the oracle's SUM silently ignores them (NULL
    # products), but np.array over a batch containing None raises a
    # ragged-shape ValueError and kills the job — filter them out so
    # both engines skip the same rows
    emb = (
        load_table(spark, sf_dir, "embeddings", rebalance=True)
        .select("embedding")
        .filter(F.col("embedding").isNotNull())
    )

    def gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            E = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            Q = np.floor(E * GRAM_SCALE + 0.5).astype(np.int64)
            # int64-exactness guard: each partial is a sum of len(Q)
            # products bounded by max|q|^2 — with default Arrow batches
            # (10k rows) and |x|<=1 embeddings this is ~1e16 << 2^63,
            # but a raised maxRecordsPerBatch or wild embeddings could
            # silently wrap, so refuse instead of corrupting
            max_abs = int(np.abs(Q).max()) if Q.size else 0
            if max_abs and max_abs * max_abs * len(Q) >= 2**62:
                raise OverflowError(
                    f"gram partial may exceed int64: max|q|={max_abs}, "
                    f"batch={len(Q)} rows — lower arrow.maxRecordsPerBatch "
                    "or rescale the embedding column"
                )
            G = Q.T @ Q
            iu = np.triu_indices(G.shape[0])
            yield pd.DataFrame(
                {
                    "i": (iu[0] + 1).astype("int32"),
                    "j": (iu[1] + 1).astype("int32"),
                    "partial": G[iu],
                }
            )

    partials = emb.mapInPandas(gram, "i int, j int, partial long")
    total = F.sum(F.col("partial").cast("decimal(38,0)"))
    return (
        partials.groupBy("i", "j")
        .agg(
            F.round(
                total.cast("double") / (float(GRAM_SCALE) * GRAM_SCALE), 6
            ).alias("gram")
        )
        .orderBy("i", "j")
    )


_GRAM_DIM = 64  # embeddings table dim (TESTDATA.md); validated by compare

_GRAM_SQL = f"""
WITH e AS (SELECT embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT list_transform(e, x -> CAST(FLOOR(x * {GRAM_SCALE} + 0.5) AS BIGINT)) AS q
      FROM e)
SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
  ROUND(CAST(SUM(q[i] * q[j]) AS DOUBLE)
        / ({GRAM_SCALE}.0 * {GRAM_SCALE}), 6) AS gram
FROM q, generate_series(1, {_GRAM_DIM}) t1(i), generate_series(1, {_GRAM_DIM}) t2(j)
WHERE i <= j
GROUP BY i, j ORDER BY i, j
"""


FUNNEL = ["view", "click", "purchase"]


def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged funnel over the events stream: users who viewed, then
    clicked strictly after their first view, then purchased strictly
    after that qualifying click — per-stage distinct-user counts with
    time ordering enforced (the classic product-analytics funnel).

    Scale notes: each stage is filter → per-user min aggregate, joined
    to the previous stage's (user, ts) frontier — every join and agg is
    equi-keyed on user_id, so after the first shuffle the stages reuse
    the same hash partitioning; no windows over the raw stream, no
    collect_list of event sequences. Stage predicates push to the scan.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == FUNNEL[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == FUNNEL[1])
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == FUNNEL[2])
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    stages = [
        (1, FUNNEL[0], s1),
        (2, FUNNEL[1], s2),
        (3, FUNNEL[2], s3),
    ]
    out = None
    for stage_no, name, df in stages:
        row = df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(stage_no).alias("stage"),
            F.lit(name).alias("event_type"),
            "n_users",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("stage")


_FUNNEL_SQL = f"""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = '{FUNNEL[0]}' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = '{FUNNEL[1]}' AND e.ts > s1.t1 GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = '{FUNNEL[2]}' AND e.ts > s2.t2 GROUP BY e.user_id
)
SELECT 1 AS stage, '{FUNNEL[0]}' AS event_type, COUNT(*) AS n_users FROM s1
UNION ALL
SELECT 2, '{FUNNEL[1]}', COUNT(*) FROM s2
UNION ALL
SELECT 3, '{FUNNEL[2]}', COUNT(*) FROM s3
ORDER BY stage
"""


QUERIES = {
    "bpe_merge_pairs": bpe_merge_pairs,
    "embedding_gram_matrix": embedding_gram_matrix,
    "event_funnel_conversion": event_funnel_conversion,
}

ORACLE = {
    "bpe_merge_pairs": _BPE_SQL,
    "embedding_gram_matrix": _GRAM_SQL,
    "event_funnel_conversion": _FUNNEL_SQL,
}


BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ["spark", "merge", "window", "vector"]
BM25_TOP_N = 25


def bm25_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against a fixed query-term set —
    the retrieval-scoring pass of a search/RAG index build, entirely
    declarative.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·len/avglen)),
    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)).

    Scale notes: the corpus tokenizes once; only rows matching the tiny
    query-term set survive the filter (pushable into the explode), so
    the tf aggregation shuffles O(docs·|terms|) rows max. df-per-term
    and the (N, avglen) scalars are broadcast — at 100 TB the only wide
    operation is the per-(doc, term) partial+final count. Fixed-point
    6-dp rounding before the final sum keeps the score addition
    order-free and engine-exact.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.split("text", " ").alias("toks"))
    lens = d.select("doc_id", F.size("toks").alias("dlen"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("dlen").cast("long")).alias("total_len"),
    )
    terms = F.array(*[F.lit(t) for t in BM25_TERMS])
    tf = (
        d.select("doc_id", F.explode("toks").alias("t"))
        .filter(F.array_contains(terms, F.col("t")))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    avglen = F.col("total_len").cast("double") / F.col("n_docs")
    denom = F.col("tf") + BM25_K1 * (
        1.0 - BM25_B + BM25_B * F.col("dlen") / avglen
    )
    contrib = F.round(idf * F.col("tf") * (BM25_K1 + 1.0) / denom, 6)
    scored = (
        tf.join(F.broadcast(df_t), "t")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", contrib.alias("c"))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(F.col("c").cast("decimal(18,6)")).cast("double"), 6).alias(
                "bm25"
            ),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(BM25_TOP_N)


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

_BM25_SQL = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
lens AS (SELECT doc_id, len(toks) AS dlen FROM d),
stats AS (SELECT COUNT(*) AS n_docs, SUM(dlen) AS total_len FROM lens),
tf AS (
  SELECT doc_id, t, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(toks) AS t FROM d)
  WHERE t IN ({_BM25_TERMS_SQL})
  GROUP BY doc_id, t
),
df_t AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
contrib AS (
  SELECT tf.doc_id,
    ROUND(
      ln(1.0 + (stats.n_docs - df_t.df + 0.5) / (df_t.df + 0.5))
      * tf.tf * ({BM25_K1} + 1.0)
      / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
         + {BM25_B} * lens.dlen / (CAST(stats.total_len AS DOUBLE) / stats.n_docs))),
      6) AS c
  FROM tf JOIN df_t USING (t) JOIN lens USING (doc_id) CROSS JOIN stats
)
SELECT doc_id,
  ROUND(CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE), 6) AS bm25,
  COUNT(*) AS n_terms_hit
FROM contrib GROUP BY doc_id
ORDER BY bm25 DESC, doc_id ASC LIMIT {BM25_TOP_N}
"""


CURRICULUM_ALPHA = 0.5  # temperature: rate_s ∝ share_s^(α-1), α<1 upweights tails
CURRICULUM_BUDGET_FRACTION = 0.25  # target fraction of the corpus to keep

def _hash_unit(salt: str, key: str = "doc_id") -> str:
    """Deterministic uniform-[0,1) per-KEY hash, SALTED per operator:
    curriculum sampling, train/val/test split, and weighted sampling
    must draw INDEPENDENT streams — one shared unsalted hash would
    fully correlate their selections (every curriculum-kept doc coming
    from a fixed region of the train split). Built on the engine-wide
    hash60 template (_util.SPARK_HASH60) so the cross-engine-critical
    md5 construction has one definition — as does the unit-interval
    construction (% 1000000 / 1000000.0), which lives ONLY here and in
    the oracle twin below; `key` selects the hashed column (doc_id for
    corpus ops, user_id for the group-integrity split)."""
    h = SPARK_HASH60.format(expr=f"concat(cast({key} as string), '{salt}')")
    return f"(({h}) % 1000000) / 1000000.0"


def _sql_hash_unit(salt: str, key: str = "doc_id") -> str:
    h = SQL_HASH60.format(expr=f"{key}::VARCHAR || '{salt}'")
    return f"(({h} % 1000000) / 1000000.0)"


def curriculum_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-reweighted corpus sampling by source — the mixture
    step of pretraining-data curation: per-source keep-rates ∝
    share^(α-1) (α=0.5 upweights rare sources), scaled to an overall
    25% token budget, applied as a DETERMINISTIC per-doc hash test (no
    rand(): reruns and engines agree row-for-row).

    Scale notes: pass 1 is a per-source count (tiny aggregate →
    broadcast); pass 2 is a row-local filter `hash_unit(doc_id) <
    rate(source)` — scan-speed, no shuffle of the corpus. Output is the
    per-source keep accounting (the sampled doc stream itself would be
    the same plan minus the final rollup).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    total = counts.agg(F.sum("n_src").alias("n_total"))
    # unnormalized weight w_s = share^(α-1); rate_s = min(1, budget·w_s/Σ(share·w_s))
    w = F.pow(F.col("n_src") / F.col("n_total"), CURRICULUM_ALPHA - 1.0)
    weighted = counts.crossJoin(F.broadcast(total)).select(
        "source", "n_src", "n_total", w.alias("w")
    )
    # decimal-sum 9dp-rounded addends: a raw double SUM's merge order
    # varies with partitioning, and a last-ulp shift in z can flip
    # keep_rate at a 6dp rounding midpoint — the one aggregation here
    # that must follow the repo's order-free-summation rule (_util.py)
    norm = weighted.agg(
        F.sum(
            F.round(F.col("w") * F.col("n_src") / F.col("n_total"), 9).cast(
                "decimal(28,9)"
            )
        )
        .cast("double")
        .alias("z")
    )
    rate = F.least(
        F.lit(1.0), F.round(CURRICULUM_BUDGET_FRACTION * F.col("w") / F.col("z"), 6)
    )
    rates = weighted.crossJoin(F.broadcast(norm)).select(
        "source", "n_src", rate.alias("keep_rate")
    )
    kept = (
        docs.join(F.broadcast(rates), "source")
        .filter(F.expr(_hash_unit("/curriculum")) < F.col("keep_rate"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            "n_src",
            "keep_rate",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
        .orderBy("source")
    )


_CURRICULUM_SQL = f"""
WITH docs AS (SELECT doc_id, source FROM documents),
counts AS (SELECT source, COUNT(*) AS n_src FROM docs GROUP BY source),
total AS (SELECT SUM(n_src) AS n_total FROM counts),
weighted AS (
  SELECT source, n_src, n_total,
    POW(CAST(n_src AS DOUBLE) / n_total, {CURRICULUM_ALPHA} - 1.0) AS w
  FROM counts CROSS JOIN total
),
norm AS (SELECT CAST(SUM(CAST(ROUND(w * n_src / n_total, 9)
                             AS DECIMAL(28,9))) AS DOUBLE) AS z FROM weighted),
rates AS (
  SELECT source, n_src,
    LEAST(1.0, ROUND({CURRICULUM_BUDGET_FRACTION} * w / z, 6)) AS keep_rate
  FROM weighted CROSS JOIN norm
),
kept AS (
  SELECT d.source, COUNT(*) AS n_kept
  FROM docs d JOIN rates r USING (source)
  WHERE {_sql_hash_unit("/curriculum")} < r.keep_rate
  GROUP BY d.source
)
SELECT source, n_src, keep_rate,
  COALESCE(kept.n_kept, 0) AS n_kept
FROM rates LEFT JOIN kept USING (source)
ORDER BY source
"""


SPLIT_BOUNDS = {"train": (0.0, 0.9), "val": (0.9, 0.95), "test": (0.95, 1.0)}


def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (90/5/5) by doc_id hash —
    the split every dataset build needs: reproducible across runs and
    engines (md5 arithmetic, no rand()), disjoint and exhaustive by
    construction (half-open hash-unit intervals). Row-local projection +
    a bounded-key rollup; emits per-split counts and id checksums so
    downstream jobs can assert split integrity cheaply.
    """
    docs = load_table(spark, sf_dir, "documents")
    u = F.expr(_hash_unit("/split"))
    split = (
        F.when(u < SPLIT_BOUNDS["train"][1], F.lit("train"))
        .when(u < SPLIT_BOUNDS["val"][1], F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select("doc_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("split")
    )


_SPLIT_SQL = f"""
WITH s AS (
  SELECT doc_id,
    CASE WHEN {_sql_hash_unit("/split")} < {SPLIT_BOUNDS["train"][1]} THEN 'train'
         WHEN {_sql_hash_unit("/split")} < {SPLIT_BOUNDS["val"][1]} THEN 'val'
         ELSE 'test' END AS split
  FROM documents
)
SELECT split, COUNT(*) AS n_docs,
  CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM s GROUP BY split ORDER BY split
"""


QUERIES.update(
    {
        "bm25_score_docs": bm25_score_docs,
        "curriculum_temperature_sample": curriculum_temperature_sample,
        "split_train_val_test": split_train_val_test,
    }
)

ORACLE.update(
    {
        "bm25_score_docs": _BM25_SQL,
        "curriculum_temperature_sample": _CURRICULUM_SQL,
        "split_train_val_test": _SPLIT_SQL,
    }
)


LM_SCORE_TOP_N = 30


def unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring: per-document mean token
    log-probability under the corpus's own unigram distribution — the
    perplexity-proxy quality signal pretraining pipelines use to rank
    documents (low mean logprob ⇒ rare/garbled text). Returns the 30
    lowest-scoring docs.

    Scale notes: pass 1 is the word-count shape (token → corpus count);
    pass 2 re-joins the token stream to the frequency table on the
    token key — an equi-join whose build side is the vocabulary (often
    broadcastable; here it flows through the same hash partitioning the
    count produced) — then aggregates logprobs per doc. Fixed-point
    accounting: logs are rounded to 8 dp before the decimal sum, so
    the per-doc totals are summation-order-free and engine-exact.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    freqs = toks.groupBy("t").agg(F.count(F.lit(1)).alias("tf"))
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    logp = F.round(
        F.log(F.col("tf").cast("double") / F.col("n_total")), 8
    )
    scored = (
        toks.join(freqs, "t")
        .crossJoin(F.broadcast(total))
        .select("doc_id", logp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("lp").cast("decimal(20,8)")).alias("_sum_lp"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                (F.col("_sum_lp") / F.col("n_tokens")).cast("double"), 6
            ).alias("mean_logprob"),
        )
    )
    return scored.orderBy(F.asc("mean_logprob"), F.asc("doc_id")).limit(LM_SCORE_TOP_N)


_LM_SQL = f"""
WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM documents),
freqs AS (SELECT t, COUNT(*) AS tf FROM toks GROUP BY t),
total AS (SELECT COUNT(*) AS n_total FROM toks),
scored AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
    SUM(CAST(ROUND(ln(CAST(tf AS DOUBLE) / n_total), 8) AS DECIMAL(20,8)))
      AS sum_lp
  FROM toks JOIN freqs USING (t) CROSS JOIN total
  GROUP BY doc_id
)
SELECT doc_id, n_tokens,
  ROUND(CAST(sum_lp / n_tokens AS DOUBLE), 6) AS mean_logprob
FROM scored
ORDER BY mean_logprob ASC, doc_id ASC LIMIT {LM_SCORE_TOP_N}
"""


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination audit: for every ordered source pair,
    how many distinct word-3-shingles they share and the containment of
    the smaller gram set — the corpus-overlap report run before mixing
    crawl dumps (high overlap ⇒ near-duplicate sources, double-counted
    data).

    Scale notes: the (source, gram) universe is distinct-ed FIRST
    (partial agg collapses repeats map-side), then the self-join is
    equi-keyed on the gram — candidate volume is per-gram source-list
    sized, never corpus². The 5×5 output rollup is trivially bounded.
    """
    from etl_gcp_function_tmabrasil_spark.functions.text import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    grams = (
        docs.select(
            "source", "text", F.split("text", " ").alias("toks")
        )
        .select("source", F.explode(word_shingles(F.col("toks"))).alias("g"))
        .distinct()
    )
    sizes = grams.groupBy("source").agg(F.count(F.lit(1)).alias("n_grams"))
    a, b = grams.alias("a"), grams.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source1"), F.col("b.source").alias("source2")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("source1"), F.col("n_grams").alias("n1"))
    sb = sizes.select(F.col("source").alias("source2"), F.col("n_grams").alias("n2"))
    return (
        shared.join(F.broadcast(sa), "source1")
        .join(F.broadcast(sb), "source2")
        .select(
            "source1",
            "source2",
            "n_shared",
            F.round(
                F.col("n_shared") / F.least("n1", "n2"), 6
            ).alias("containment"),
        )
        .orderBy("source1", "source2")
    )


_OVERLAP_SQL = """
WITH t AS (SELECT source, text, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT source, CASE WHEN len(toks) >= 3
    THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
    ELSE [text] END AS sh
  FROM t
),
grams AS (SELECT DISTINCT source, UNNEST(sh) AS g FROM sh),
sizes AS (SELECT source, COUNT(*) AS n_grams FROM grams GROUP BY source),
shared AS (
  SELECT a.source AS source1, b.source AS source2, COUNT(*) AS n_shared
  FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT source1, source2, n_shared,
  ROUND(CAST(n_shared AS DOUBLE) / LEAST(s1.n_grams, s2.n_grams), 6)
    AS containment
FROM shared
JOIN sizes s1 ON shared.source1 = s1.source
JOIN sizes s2 ON shared.source2 = s2.source
ORDER BY source1, source2
"""


QUERIES.update(
    {
        "unigram_lm_score": unigram_lm_score,
        "source_overlap_matrix": source_overlap_matrix,
    }
)

ORACLE.update(
    {
        "unigram_lm_score": _LM_SQL,
        "source_overlap_matrix": _OVERLAP_SQL,
    }
)


WEIGHTED_SAMPLE_K = 40


def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis-
    Spirakis one-pass construction: each doc draws key = u^(1/w)
    (u = deterministic hash-unit, w = n_chars) and the k largest keys
    ARE a weighted sample — the standard distributed algorithm, here
    with the randomness replaced by the md5 hash so runs and engines
    agree exactly.

    Scale notes: key assignment is a row-local projection; top-k
    compiles to TakeOrderedAndProject (per-partition heaps, no global
    sort). Keys are rounded to 9 dp before ranking with doc_id
    tiebreaks, so ranking is invariant to last-ulp libm differences
    between engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    u = F.expr(f"({_hash_unit('/sample')} * 1000000 + 0.5) / 1000000.0")
    key = F.round(F.pow(u, 1.0 / F.col("n_chars")), 9)
    return (
        docs.select("doc_id", "n_chars", key.alias("sample_key"))
        .orderBy(F.desc("sample_key"), F.asc("doc_id"))
        .limit(WEIGHTED_SAMPLE_K)
    )


_WEIGHTED_SQL = f"""
SELECT doc_id, n_chars,
  ROUND(POW(({_sql_hash_unit("/sample")} * 1000000 + 0.5) / 1000000.0,
            1.0 / n_chars), 9) AS sample_key
FROM documents
ORDER BY sample_key DESC, doc_id ASC LIMIT {WEIGHTED_SAMPLE_K}
"""


QUERIES["sample_weighted_topk"] = sample_weighted_topk
ORACLE["sample_weighted_topk"] = _WEIGHTED_SQL


def split_group_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-integrity train/val/test split: the assignment key is the
    USER, not the row — every event of a user lands in the same split,
    the leakage guard any behavioral/training dataset needs (a
    row-level split would put one user's near-identical events in both
    train and test). Same salted md5 hash-unit machinery as
    split_train_val_test (independent stream via the '/gsplit' salt),
    so assignment is deterministic across runs and engines.

    Scale shape: the split is a row-local function of user_id — no
    join against an assignment table, nothing broadcast, nothing
    shuffled except the bounded 3-key rollup. The rollup's
    n_users-per-split sums to the corpus's distinct-user count by
    construction (split is a FUNCTION of user), which the oracle's
    identical computation certifies."""
    ev = load_table(spark, sf_dir, "events")
    u = F.expr(_hash_unit("/gsplit", key="user_id"))
    split = (
        F.when(u < SPLIT_BOUNDS["train"][1], F.lit("train"))
        .when(u < SPLIT_BOUNDS["val"][1], F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        ev.select("user_id", "event_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("event_id").cast("long").alias("id_checksum"),
        )
        .orderBy("split")
    )


def _group_split_sql() -> str:
    u = _sql_hash_unit("/gsplit", key="user_id")
    return f"""
WITH s AS (
  SELECT user_id, event_id,
    CASE WHEN {u} < {SPLIT_BOUNDS["train"][1]} THEN 'train'
         WHEN {u} < {SPLIT_BOUNDS["val"][1]} THEN 'val'
         ELSE 'test' END AS split
  FROM events
)
SELECT split, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events,
  CAST(SUM(event_id) AS BIGINT) AS id_checksum
FROM s GROUP BY split ORDER BY split
"""


QUERIES["split_group_integrity"] = split_group_integrity
ORACLE["split_group_integrity"] = _group_split_sql()


PER_SOURCE_SAMPLE_K = 40


def sample_weighted_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BALANCED per-source weighted sampling: Efraimidis-Spirakis keys
    (u^(1/w), deterministic md5 u, w = n_chars) ranked WITHIN each
    source, keeping the top k per source — the curation step that
    caps every source's contribution while still favoring longer
    documents inside each source (a global weighted sample lets one
    giant source crowd out the rest; per-source quotas are how
    pretraining mixtures enforce composition).

    Scale shape: key assignment is row-local; per-group top-k is the
    rank-window + rn<=k pattern, which Catalyst executes with
    WindowGroupLimit (per-partition group heaps pushed below the
    shuffle) — one shuffle on source, no global sort, no group ever
    materialized whole. An independent '/srcsample' salt keeps this
    stream uncorrelated with the global sample and the splits."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    u = F.expr(f"({_hash_unit('/srcsample')} * 1000000 + 0.5) / 1000000.0")
    key = F.round(F.pow(u, 1.0 / F.col("n_chars")), 9)
    w = W.partitionBy("source").orderBy(
        F.desc("sample_key"), F.asc("doc_id")
    )
    return (
        docs.select("source", "doc_id", "n_chars", key.alias("sample_key"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PER_SOURCE_SAMPLE_K)
        .select("source", "doc_id", "n_chars", "sample_key")
        .orderBy("source", F.desc("sample_key"), "doc_id")
    )


def _per_source_sample_sql() -> str:
    u = f"({_sql_hash_unit('/srcsample')} * 1000000 + 0.5) / 1000000.0"
    return f"""
WITH keyed AS (
  SELECT source, doc_id, n_chars,
    ROUND(POW({u}, 1.0 / n_chars), 9) AS sample_key
  FROM documents
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY source ORDER BY sample_key DESC, doc_id ASC) AS rn
  FROM keyed
)
SELECT source, doc_id, n_chars, sample_key
FROM ranked WHERE rn <= {PER_SOURCE_SAMPLE_K}
ORDER BY source, sample_key DESC, doc_id
"""


QUERIES["sample_weighted_per_source"] = sample_weighted_per_source
ORACLE["sample_weighted_per_source"] = _per_source_sample_sql()


LM_LAMBDA = 0.75  # interpolation weight on the bigram term


def bigram_lm_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram language-model scoring — the stronger
    perplexity proxy after `unigram_lm_score`: per-document mean
    log P(w2|w1) with P = λ·c(w1,w2)/c(w1) + (1-λ)·c(w2)/N, the
    classic Jelinek-Mercer mix that never zeroes out (the unigram
    term backs off unseen bigrams). Returns the 30 lowest-scoring
    docs — garbled or TOKEN-ORDER-scrambled text that a unigram model
    cannot distinguish from clean prose.

    Scale shape: two word-count passes (bigram + unigram — vocabulary-
    sized shuffles, never the token stream) and two equi-joins of the
    bigram stream against them. Determinism: every probability is a
    fixed arithmetic expression over exact integer counts evaluated in
    the same operation order on both engines, rounded to 8 dp before
    the decimal per-doc sum — summation-order-free, engine-exact (the
    unigram gate's discipline)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    bi = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(toks, 1, size(toks) - 1),"
                " slice(toks, 2, size(toks) - 1),"
                " (a, b) -> struct(a as w1, b as w2))"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    uni = (
        toks.select(F.explode("toks").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("uf"))
    )
    bif = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("bf"))
    total = toks.select(F.explode("toks").alias("t")).agg(
        F.count(F.lit(1)).alias("n_total")
    )
    p = (
        F.lit(LM_LAMBDA) * (F.col("bf").cast("double") / F.col("uf1"))
        + F.lit(1.0 - LM_LAMBDA) * (F.col("uf2").cast("double") / F.col("n_total"))
    )
    lp = F.round(F.log(p), 8)
    scored = (
        bi.join(bif, ["w1", "w2"])
        .join(uni.select(F.col("t").alias("w1"), F.col("uf").alias("uf1")), "w1")
        .join(uni.select(F.col("t").alias("w2"), F.col("uf").alias("uf2")), "w2")
        .crossJoin(F.broadcast(total))
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.col("lp").cast("decimal(20,8)")).alias("_s"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round((F.col("_s") / F.col("n_bigrams")).cast("double"), 6).alias(
                "mean_logprob"
            ),
        )
    )
    return scored.orderBy(F.asc("mean_logprob"), F.asc("doc_id")).limit(
        LM_SCORE_TOP_N
    )


_BIGRAM_LM_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
bi AS (
  SELECT doc_id,
    UNNEST(list_transform(generate_series(1, len(toks) - 1),
                          i -> {{'w1': toks[i], 'w2': toks[i + 1]}})) AS p
  FROM t
),
bg AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bi),
uni AS (
  SELECT t2.t, COUNT(*) AS uf
  FROM (SELECT UNNEST(toks) AS t FROM t) t2 GROUP BY t2.t
),
bif AS (SELECT w1, w2, COUNT(*) AS bf FROM bg GROUP BY w1, w2),
total AS (SELECT COUNT(*) AS n_total FROM (SELECT UNNEST(toks) AS t FROM t)),
scored AS (
  SELECT doc_id, COUNT(*) AS n_bigrams,
    SUM(CAST(ROUND(ln(
      {LM_LAMBDA} * (CAST(bf AS DOUBLE) / u1.uf)
      + {1.0 - LM_LAMBDA} * (CAST(u2.uf AS DOUBLE) / n_total)), 8)
      AS DECIMAL(20,8))) AS s
  FROM bg
  JOIN bif USING (w1, w2)
  JOIN uni u1 ON u1.t = bg.w1
  JOIN uni u2 ON u2.t = bg.w2
  CROSS JOIN total
  GROUP BY doc_id
)
SELECT doc_id, n_bigrams,
  ROUND(CAST(s / n_bigrams AS DOUBLE), 6) AS mean_logprob
FROM scored ORDER BY mean_logprob ASC, doc_id ASC LIMIT {LM_SCORE_TOP_N}
"""

QUERIES["bigram_lm_interpolated"] = bigram_lm_interpolated
ORACLE["bigram_lm_interpolated"] = _BIGRAM_LM_SQL


def text_ccnet_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-language quality bucketing (Wenzek et al. 2020,
    arXiv:1911.00359): score every document with the unigram LM
    perplexity proxy (`unigram_lm_score`'s exact formulation, no
    limit), split each LANGUAGE's corpus into head/middle/tail by its
    own score terciles, and roll up per (lang, bucket) — the bucketing
    CCNet applies before sampling pretraining data predominantly from
    the head.

    Scale shape — thresholds, not ntile: a per-lang `ntile(3)` would
    sort a language's ENTIRE corpus inside one window partition (the
    single-task funnel; a language at 100 TB is tens of TB). CCNet
    itself assigns by perplexity THRESHOLD, so the tercile cutoffs are
    computed exactly with the banded-rank machinery
    (operators/quantiles.banded_exact_quantiles — O(bands) memory, no
    group buffering), broadcast back (one row per lang), and bucket
    assignment is a row-local comparison. Determinism: scores are the
    LM gate's fixed-point construction (8-dp rounded logs, decimal
    sums, 6-dp mean); cutoffs are the linear-interpolated quantile
    both engines define identically (pinned by agg_percentiles), so
    the >= comparisons agree bit-for-bit.
    """
    from etl_gcp_function_tmabrasil_spark.operators.quantiles import (
        banded_exact_quantiles,
    )

    from etl_gcp_function_tmabrasil_spark.queries._util import managed_persist

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    freqs = toks.groupBy("t").agg(F.count(F.lit(1)).alias("tf"))
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    logp = F.round(F.log(F.col("tf").cast("double") / F.col("n_total")), 8)
    # persisted (r15): both the tercile-cutoff derivation and the
    # bucket assignment below consume `scored`; without the persist the
    # whole LM-score pass (token explode + freq join + per-doc rollup)
    # executed twice per action (measured at sf0.1: 1.9 s → ~1.1 s).
    # The cached frame is docs-sized (4 narrow columns).
    scored = managed_persist(
        toks.join(freqs, "t")
        .crossJoin(F.broadcast(total))
        .select("doc_id", logp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("lp").cast("decimal(20,8)")).alias("_sum_lp"),
        )
        .select(
            "doc_id",
            F.round(
                (F.col("_sum_lp") / F.col("n_tokens")).cast("double"), 6
            ).alias("mean_logprob"),
        )
        .join(docs.select("doc_id", "lang", "n_chars"), "doc_id"),
        "traindata2.ccnet_scored",
    )
    cuts = banded_exact_quantiles(
        scored,
        "lang",
        "mean_logprob",
        {"q33": 1 / 3, "q67": 2 / 3},
        band_width=0.01,
        round_to=6,
    ).select("lang", "q33", "q67")
    bucketed = scored.join(F.broadcast(cuts), "lang").select(
        "lang",
        F.when(F.col("mean_logprob") >= F.col("q67"), F.lit("head"))
        .when(F.col("mean_logprob") >= F.col("q33"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
        "mean_logprob",
        "n_chars",
    )
    return (
        bucketed.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(F.col("mean_logprob").cast("decimal(20,6)")).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("avg_logprob"),
            F.round(
                F.sum(F.col("n_chars").cast("decimal(20,0)")).cast("double")
                / F.count(F.lit(1)),
                2,
            ).alias("avg_chars"),
        )
        .orderBy("lang", "bucket")
    )


_CCNET_BUCKETS_SQL = f"""
WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS t
              FROM documents),
freqs AS (SELECT t, COUNT(*) AS tf FROM toks GROUP BY t),
total AS (SELECT COUNT(*) AS n_total FROM toks),
scored AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
    SUM(CAST(ROUND(ln(CAST(tf AS DOUBLE) / n_total), 8) AS DECIMAL(20,8)))
      AS sum_lp
  FROM toks JOIN freqs USING (t) CROSS JOIN total
  GROUP BY doc_id
),
sdocs AS (
  SELECT d.lang, d.n_chars,
    ROUND(CAST(s.sum_lp / s.n_tokens AS DOUBLE), 6) AS mean_logprob
  FROM scored s JOIN documents d USING (doc_id)
),
cuts AS (
  SELECT lang,
    ROUND(quantile_cont(mean_logprob, {1 / 3!r}), 6) AS q33,
    ROUND(quantile_cont(mean_logprob, {2 / 3!r}), 6) AS q67
  FROM sdocs GROUP BY lang
),
b AS (
  SELECT s.lang,
    CASE WHEN mean_logprob >= q67 THEN 'head'
         WHEN mean_logprob >= q33 THEN 'middle'
         ELSE 'tail' END AS bucket,
    mean_logprob, n_chars
  FROM sdocs s JOIN cuts USING (lang)
)
SELECT lang, bucket, COUNT(*) AS n_docs,
  ROUND(CAST(SUM(CAST(mean_logprob AS DECIMAL(20,6))) AS DOUBLE)
        / COUNT(*), 6) AS avg_logprob,
  ROUND(CAST(SUM(CAST(n_chars AS DECIMAL(20,0))) AS DOUBLE)
        / COUNT(*), 2) AS avg_chars
FROM b GROUP BY lang, bucket
ORDER BY lang, bucket
"""

QUERIES["text_ccnet_quality_buckets"] = text_ccnet_quality_buckets
ORACLE["text_ccnet_quality_buckets"] = _CCNET_BUCKETS_SQL


PCA_ITERS = 3  #: power iterations (oracle unrolls them)


def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by POWER
    ITERATION over the gram matrix — the eigensolve step
    `embedding_gram_matrix` explicitly leaves downstream, done
    engine-side the way every fixed-point iterative operator here is
    (PageRank, k-means): the expensive corpus scan happens ONCE (the
    gram accumulation, persisted), and each iteration is a matvec over
    the DIM x DIM matrix — 64-row broadcast joins, metadata-sized
    regardless of corpus size. Pipelines use the result for whitening
    / anisotropy diagnosis before cosine-based dedup (embeddings with
    a dominant direction make every cosine look alike).

    Determinism (the PageRank discipline): x0 = 1/sqrt(DIM) = 0.125
    exactly; each matvec term is rounded to 12 dp and summed as
    DECIMAL(38,12) (no float summation order), the norm likewise, and
    the normalized components re-round to 9 dp — every iteration is
    bit-identical across engines and partitionings, so the DuckDB twin
    simply unrolls the same PCA_ITERS steps as CTEs. Output: the
    normalized direction after PCA_ITERS steps plus the eigenvalue
    estimate ||G x_{n-1}|| (the dominant-eigenvalue limit of the
    iteration, 6 dp).
    """
    gut = embedding_gram_matrix(spark, sf_dir).select(
        "i", "j", F.col("gram").alias("v")
    )
    g = gut.unionByName(
        gut.filter(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "v"
        )
    )
    # Row-local power-iteration fold (r15): after the (one) corpus-
    # sized gram accumulation the matrix is DIM×DIM — metadata-sized —
    # yet the per-iteration join/agg/crossJoin formulation compiled to
    # 262 Exchange nodes and re-derived every prior iteration inside
    # each later one (measured 2.7–8 s of stage scheduling at sf0.1).
    # Collapsing the iterations into ONE aggregate() fold over a single
    # matrix row keeps the identical arithmetic — per-term round(·,12)
    # accumulated in DECIMAL(38,12) (exact, order-free), norm the same
    # way, components re-rounded to 9 dp — so every iterate is
    # bit-identical to the unrolled form and the oracle's CTE chain.
    rows = g.groupBy("i").agg(
        F.expr("transform(array_sort(collect_list(struct(j, v))), r0 -> r0.v)")
        .alias("row")
    )
    mat = rows.groupBy().agg(
        F.expr("transform(array_sort(collect_list(struct(i, row))), m0 -> m0.row)")
        .alias("mat")
    )
    # DECIMAL(30,12) accumulators (not 38): Spark decimal ADDITION at
    # precision 38 reduces the result scale to 11 (precision-loss
    # rule), which would drop the 12th decimal the arithmetic contract
    # requires; at precision 30 the sum type is (31,12) — scale intact
    # — and the re-cast to (30,12) is exact (1e18 of integer headroom
    # vs values bounded by the gram magnitudes). The SUM aggregate in
    # the unrolled form kept scale 12 at precision 38; values are
    # identical in both formulations.
    dec = "cast(0 as decimal(30,12))"
    y_of = (
        "transform(mat, row1 -> cast(aggregate("
        "zip_with(row1, {xs}, (a0, b0) -> "
        "cast(round(a0 * b0, 12) as decimal(30,12))), "
        f"{dec}, (s0, t0) -> cast(s0 + t0 as decimal(30,12))) as double))"
    )
    nrm_of = (
        "sqrt(cast(aggregate(transform({ys}, e0 -> "
        "cast(round(e0 * e0, 12) as decimal(30,12))), "
        f"{dec}, (s1, t1) -> cast(s1 + t1 as decimal(30,12))) as double))"
    )
    # one iteration: bind y once via a singleton-array transform (no
    # SQL let-binding), then emit the normalized x and the norm
    step = (
        "element_at(transform(array({y}), yv -> named_struct("
        "'x', transform(yv, e1 -> round(e1 / {nrm}, 9)), "
        "'nrm', {nrm})), 1)"
    ).format(y=y_of.format(xs="acc.x"), nrm=nrm_of.format(ys="yv"))
    x0 = f"named_struct('x', array_repeat(cast(0.125 as double), {_GRAM_DIM}), 'nrm', cast(null as double))"
    folded = mat.select(
        F.expr(
            f"aggregate(sequence(1, {PCA_ITERS}), {x0}, (acc, it) -> {step})"
        ).alias("st")
    )
    return (
        folded.select(
            F.posexplode(F.col("st.x")).alias("dim0", "loading"),
            F.round(F.col("st.nrm"), 6).alias("eigenvalue"),
        )
        .select(
            (F.col("dim0") + 1).alias("dim"), "loading", "eigenvalue"
        )
        .orderBy("dim")
    )


def _pca_power_sql() -> str:
    """Unrolled power iteration over the gram CTE, mirroring
    embedding_pca_power bit-for-bit."""
    parts = [f"""
gut AS (
  SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
    ROUND(CAST(SUM(q[i] * q[j]) AS DOUBLE)
          / ({GRAM_SCALE}.0 * {GRAM_SCALE}), 6) AS v
  FROM q, generate_series(1, {_GRAM_DIM}) t1(i),
       generate_series(1, {_GRAM_DIM}) t2(j)
  WHERE i <= j GROUP BY i, j
),
g AS (
  SELECT i, j, v FROM gut
  UNION ALL
  SELECT j AS i, i AS j, v FROM gut WHERE i < j
),
x0 AS (
  SELECT CAST(i AS INT) AS j, CAST(0.125 AS DOUBLE) AS xv
  FROM generate_series(1, {_GRAM_DIM}) t(i)
)"""]
    for n in range(1, PCA_ITERS + 1):
        parts.append(f"""
y{n} AS (
  SELECT g.i,
    CAST(SUM(CAST(ROUND(g.v * x.xv, 12) AS DECIMAL(38,12))) AS DOUBLE) AS y
  FROM g JOIN x{n - 1} x ON g.j = x.j
  GROUP BY g.i
),
n{n} AS (
  SELECT sqrt(CAST(SUM(CAST(ROUND(y * y, 12) AS DECIMAL(38,12)))
              AS DOUBLE)) AS nrm
  FROM y{n}
),
x{n} AS (
  SELECT i AS j, ROUND(y / (SELECT nrm FROM n{n}), 9) AS xv FROM y{n}
)""")
    return f"""
WITH e AS (SELECT embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT list_transform(e, x -> CAST(FLOOR(x * {GRAM_SCALE} + 0.5)
                                         AS BIGINT)) AS q
      FROM e),{",".join(parts)}
SELECT x.j AS dim, x.xv AS loading,
  (SELECT ROUND(nrm, 6) FROM n{PCA_ITERS}) AS eigenvalue
FROM x{PCA_ITERS} x ORDER BY dim
"""


QUERIES["embedding_pca_power"] = embedding_pca_power
ORACLE["embedding_pca_power"] = _pca_power_sql()


# --- DSIR importance weights (round 11) ------------------------------------

DSIR_BUCKETS = 64  #: hashed bigram feature space (Xie et al. use 10k)
DSIR_TOP_N = 20  #: highest-weight raw docs reported


def sample_importance_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
    arXiv:2302.03169): score every RAW-domain document by how much it
    looks like the TARGET domain under hashed-bigram unigram models —
    log w(doc) = sum_f count_doc(f) * (ln p_target(f) - ln p_raw(f)),
    features = bigrams hashed into DSIR_BUCKETS buckets, both
    distributions add-1 smoothed. The weights feed Gumbel-top-k /
    logprob-threshold resampling; the score pass is the distributed
    work. Target here = the 'src0' documents, raw = the rest (the
    paper's target is e.g. Wikipedia; the split is a corpus fact both
    engines share).

    Determinism: bucket assignment is the engine-reproducible md5
    hash60 mod buckets; the log-ratio per bucket follows the
    fixed-point idiom (8-dp round into exact decimal sums), so every
    doc's weight is a stable decimal; ties in the top-N break on
    doc_id.

    Scale: two word-count-shaped aggs (bucket histograms of each
    domain — DSIR_BUCKETS rows each), a BROADCAST join of the
    64-row log-ratio table onto per-doc bucket counts, and one
    per-doc sum — the corpus shuffles once, keyed on (doc_id,
    bucket), already partially aggregated. No stage is wider than
    the corpus token stream's distinct (doc, bucket) pairs.
    """
    from etl_gcp_function_tmabrasil_spark.queries._util import managed_persist

    # compute-spread: per-row work is explode(bigrams) + one md5 per
    # bigram — amplified ~100x beyond scan cost, and the fixture is a
    # single row group, so the whole feature pass would otherwise run
    # on one task (guide §2.2/§6.2; no-op on healthy layouts)
    docs = load_table(spark, sf_dir, "documents", rebalance="compute")
    h = SPARK_HASH60.format(expr="pair")
    feats = (
        docs.select(
            "doc_id",
            "source",
            F.split("text", " ").alias("toks"),
        )
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "zip_with(slice(toks, 1, size(toks) - 1),"
                    " slice(toks, 2, size(toks) - 1),"
                    " (a, b) -> concat(a, ' ', b))"
                )
            ).alias("pair"),
        )
        .select(
            "doc_id",
            "source",
            F.expr(f"pmod({h}, {DSIR_BUCKETS})").alias("b"),
        )
    )
    feats = managed_persist(feats, "traindata2.dsir_feats")
    is_target = F.col("source") == "src0"
    # hist is persisted (DSIR_BUCKETS rows) and totals roll up FROM it
    # — the r14 shape aggregated the cached corpus-sized feats twice
    # (hist + an independent totals pass); Σ_b ct = n_target exactly
    # (every feature row lands in exactly one bucket), so this is one
    # fewer corpus pass, not an approximation (r15, guide §2.4)
    hist = managed_persist(
        feats.groupBy("b").agg(
            F.sum(F.when(is_target, 1).otherwise(0)).alias("ct"),
            F.sum(F.when(is_target, 0).otherwise(1)).alias("cr"),
        ),
        "traindata2.dsir_hist",
    )
    totals = hist.agg(
        F.sum("ct").alias("nt"),
        F.sum("cr").alias("nr"),
    )
    ratio = (
        spark.range(DSIR_BUCKETS)
        .select(F.col("id").cast("bigint").alias("b"))
        .join(hist, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.round(
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                    / (F.col("nt") + DSIR_BUCKETS)
                )
                - F.log(
                    (F.coalesce(F.col("cr"), F.lit(0)) + 1).cast("double")
                    / (F.col("nr") + DSIR_BUCKETS)
                ),
                8,
            )
            # (12,8) keeps the c*lr product inside Spark's 38-digit
            # cap (bigint*decimal(20,8) silently DROPS scale to 6)
            .cast("decimal(12,8)")
            .alias("lr"),
        )
    )
    doc_buckets = (
        feats.filter(~is_target)
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        doc_buckets.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_feats"),
            F.sum(
                F.col("c").cast("decimal(10,0)") * F.col("lr")
            ).alias("lw"),
        )
        .select(
            "doc_id",
            "n_feats",
            F.round(F.col("lw").cast("double"), 6).alias("log_weight"),
        )
        .orderBy(F.desc("log_weight"), F.asc("doc_id"))
        .limit(DSIR_TOP_N)
    )


_DSIR_SQL = f"""
WITH feats AS (
  SELECT doc_id, source,
    {SQL_HASH60.format(expr="pair")} % {DSIR_BUCKETS} AS b
  FROM (
    SELECT doc_id, source,
      UNNEST(list_transform(generate_series(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i + 1])) AS pair
    FROM (SELECT doc_id, source, string_split(text, ' ') AS toks
          FROM documents) t0) t1),
hist AS (
  SELECT b,
    SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ct,
    SUM(CASE WHEN source = 'src0' THEN 0 ELSE 1 END) AS cr
  FROM feats GROUP BY b),
totals AS (
  SELECT SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS nt,
         SUM(CASE WHEN source = 'src0' THEN 0 ELSE 1 END) AS nr
  FROM feats),
ratio AS (
  SELECT g.b,
    CAST(ROUND(ln((COALESCE(ct, 0) + 1)
                  / CAST(nt + {DSIR_BUCKETS} AS DOUBLE))
               - ln((COALESCE(cr, 0) + 1)
                    / CAST(nr + {DSIR_BUCKETS} AS DOUBLE)), 8)
         AS DECIMAL(12,8)) AS lr
  FROM (SELECT UNNEST(generate_series(0, {DSIR_BUCKETS - 1})) AS b) g
  LEFT JOIN hist ON g.b = hist.b CROSS JOIN totals),
doc_buckets AS (
  SELECT doc_id, b, COUNT(*) AS c FROM feats
  WHERE source <> 'src0' GROUP BY doc_id, b)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_feats,
  ROUND(CAST(SUM(CAST(c AS DECIMAL(10,0)) * lr) AS DOUBLE), 6)
    AS log_weight
FROM doc_buckets JOIN ratio USING (b)
GROUP BY doc_id
ORDER BY log_weight DESC, doc_id ASC LIMIT {DSIR_TOP_N}
"""

QUERIES["sample_importance_dsir"] = sample_importance_dsir
ORACLE["sample_importance_dsir"] = _DSIR_SQL


# --- Balanced class downsampling (round 12) -----------------------------------


def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced downsampling to the minority-class count — the class-
    rebalancing step before training on skewed labels: every event
    type keeps exactly min-class-count rows, selected by deterministic
    hash order (md5 hash60 of event_id, the engine's reproducible
    sampling idiom — a uniform draw under hash uniformity, identical
    on every engine and rerun).

    Scale: the per-class hash rank comes from the BANDED global-rank
    decomposition (operators/banded_rank.py, band = top hash nibble,
    group = class) — never a whole-class single-task window sort; the
    minority count is a broadcast one-row aggregate. Output is the
    per-class post-sample rollup (count + value sum + the selection's
    max rank, which must equal the minority count — the balance proof
    riding in the result).
    """
    from etl_gcp_function_tmabrasil_spark.operators.banded_rank import (
        banded_global_rank,
    )
    from etl_gcp_function_tmabrasil_spark.queries._util import (
        SPARK_HASH60,
        csum,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "value",
        F.expr(SPARK_HASH60.format(expr="cast(event_id as string)")).alias(
            "hv"
        ),
    )
    # 16 bands over the 60-bit hash: monotone in (hv, event_id) order
    banded = ev.withColumn(
        "band", F.expr("hv DIV 72057594037927936")
    )
    ranked = banded_global_rank(
        banded, "band", [F.col("hv"), F.col("event_id")],
        group=["event_type"], rank_col="r",
    )
    min_n = ev.groupBy("event_type").count().agg(
        F.min("count").alias("min_n")
    )
    picked = ranked.crossJoin(F.broadcast(min_n)).filter(
        F.col("r") <= F.col("min_n")
    )
    return (
        picked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            csum("value").alias("sum_value"),
            F.max("r").alias("max_rank"),
        )
        .orderBy("event_type")
    )


def _balanced_sql() -> str:
    from etl_gcp_function_tmabrasil_spark.queries._util import SQL_HASH60

    h = SQL_HASH60.format(expr="CAST(event_id AS VARCHAR)")
    return f"""
WITH ev AS (
  SELECT event_id, event_type, value, {h} AS hv FROM events
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY hv, event_id) AS r
  FROM ev
),
mn AS (
  SELECT MIN(c) AS min_n FROM (
    SELECT COUNT(*) AS c FROM ev GROUP BY event_type)
)
SELECT event_type, COUNT(*) AS n_sampled,
  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
  MAX(r) AS max_rank
FROM ranked CROSS JOIN mn
WHERE r <= min_n
GROUP BY event_type ORDER BY event_type
"""


QUERIES["sample_balanced_classes"] = sample_balanced_classes
ORACLE["sample_balanced_classes"] = _balanced_sql()


# --- Sequence-length bucketing for batch assembly (round 13) -----------------

#: power-of-two sequence-length caps; docs longer than the last cap get
#: their own overflow bucket so padding stays defined for every row.
BUCKET_CAPS = [32, 64, 128, 256, 512, 1024, 2048, 4096, 8192]
BUCKET_OVERFLOW = 16384


def batch_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing — the batch-assembly planner every
    trainer runs before padding variable-length documents into fixed
    tensors: assign each doc to the smallest power-of-two length cap
    that holds it, then account the PADDING WASTE each bucket would
    pay (sum over docs of cap − len, and its share of the bucket's
    token budget n_docs × cap). Bucketed batching is why training
    pipelines sort-by-length: unbucketed padding to the global max
    wastes most of the FLOPs on pad tokens.

    Scale: token counts are row-local; the rollup is one
    word-count-shaped groupBy over ≤ len(BUCKET_CAPS)+1 buckets with
    map-side combine. Exact integer arithmetic throughout; the only
    doubles are the final waste ratios (round 6).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        F.size(
            F.split(F.regexp_replace(F.trim("text"), WS_CLASS, " "), " ")
        ).alias("n_tok")
    )
    cap = F.lit(BUCKET_OVERFLOW)
    for c in reversed(BUCKET_CAPS):
        cap = F.when(F.col("n_tok") <= c, F.lit(c)).otherwise(cap)
    return (
        docs.select(cap.alias("bucket_cap"), "n_tok")
        .groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("sum_tokens"),
            F.sum(F.col("bucket_cap") - F.col("n_tok")).alias("pad_tokens"),
        )
        .select(
            "bucket_cap",
            "n_docs",
            "sum_tokens",
            "pad_tokens",
            F.round(
                F.col("pad_tokens").cast("double")
                / (F.col("n_docs") * F.col("bucket_cap")).cast("double"),
                6,
            ).alias("pad_waste"),
        )
        .orderBy("bucket_cap")
    )


def _bucketing_sql() -> str:
    ladder = str(BUCKET_OVERFLOW)
    for c in reversed(BUCKET_CAPS):
        ladder = f"CASE WHEN n_tok <= {c} THEN {c} ELSE {ladder} END"
    return f"""
WITH toks AS (
  SELECT len(string_split(
    REGEXP_REPLACE(TRIM(text), '{WS_CLASS}', ' ', 'g'), ' ')) AS n_tok
  FROM documents
),
bucketed AS (SELECT {ladder} AS bucket_cap, n_tok FROM toks)
SELECT bucket_cap, COUNT(*) AS n_docs,
  CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
  CAST(SUM(bucket_cap - n_tok) AS BIGINT) AS pad_tokens,
  ROUND(CAST(SUM(bucket_cap - n_tok) AS DOUBLE)
        / CAST(COUNT(*) * bucket_cap AS DOUBLE), 6) AS pad_waste
FROM bucketed GROUP BY bucket_cap ORDER BY bucket_cap
"""


QUERIES["batch_length_bucketing"] = batch_length_bucketing
ORACLE["batch_length_bucketing"] = _bucketing_sql()
