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
    vocabulary-sized data, not the token stream.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.split("text", " ").alias("toks"))
    pairs = d.select(F.explode_outer(F.expr(_PAIRS)).alias("pair")).filter(
        F.col("pair").isNotNull()
    )
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
    (|q|≤~1e6 ⇒ per-batch sums ≪ 2^63 for any Arrow batch size) and
    the final combine sums decimals — no float summation order
    anywhere, bit-identical to the DuckDB oracle's per-element sum.
    """
    emb = load_table(spark, sf_dir, "embeddings", rebalance=True).select("embedding")

    def gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            E = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            Q = np.floor(E * GRAM_SCALE + 0.5).astype(np.int64)
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
