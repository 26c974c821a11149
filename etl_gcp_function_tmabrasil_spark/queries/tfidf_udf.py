"""TF-IDF features (DataFrame-native) and the Python-UDF operator
surface (SURVEY.md §2.2 "UDF surface"): vectorized pandas UDF and
grouped-map applyInPandas — each with an exact SQL oracle twin so the
UDF path itself is correctness-gated.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_gcp_function_tmabrasil_spark.catalog import load_table


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF over `documents`, pure DataFrame ops (explode → term/doc
    freq → idf join), top-3 terms per doc for the first 50 docs.

    Scale notes: one explode of the token stream, one groupBy per
    (doc, term), one tiny idf dimension broadcast back. This is the
    declarative twin of MLlib's HashingTF+IDF (which trades exactness
    for a fixed-width feature vector; use MLlib when feeding models,
    this when feeding humans or joins).
    """
    docs = load_table(spark, sf_dir, "documents")
    # n_docs stays in-plan as a broadcast 1-row aggregate — no eager
    # .count() job on the driver (the no-collect discipline; at 100 TB an
    # eager count is a full extra scan serialized before the query).
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    terms = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = terms.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    scored = (
        tf.join(F.broadcast(df_), "term")
        .filter(F.col("doc_id") < 50)
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "rn", "term", "tfidf")
        .orderBy("doc_id", "rn")
    )


_TFIDF_SQL = """
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
df_ AS (SELECT term, COUNT(*) AS df
        FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, tf.term AS term,
    ROUND(tf * LN(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
  FROM tf JOIN df_ ON tf.term = df_.term CROSS JOIN n
  WHERE doc_id < 50
)
SELECT doc_id, rn, term, tfidf FROM (
  SELECT doc_id, term, tfidf,
    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rn
  FROM scored
) t WHERE rn <= 3
ORDER BY doc_id, rn
"""


def udf_pandas_scaled_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF (Arrow-batched): log1p-scale event values.

    The UDF body is numpy over a whole Arrow batch — the only acceptable
    Python-UDF shape in a hot path (row-at-a-time @udf is banned in this
    engine). Oracle: the same expression in SQL.
    """

    @F.pandas_udf("double")
    def log1p_scaled(v: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(pd.array(np.log1p(v.to_numpy()))).round(6)

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", log1p_scaled(F.col("value")).alias("value_log1p")
    )


_UDF_PANDAS_SQL = """
SELECT event_id, ROUND(LN(1.0 + value), 6) AS value_log1p
FROM events ORDER BY event_id
"""


def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-event-type z-scores computed with
    pandas inside each group. Oracle: window-function twin in SQL
    (population stddev; ddof=0 to match).

    This operator exists to exercise the grouped-map UDF surface (the
    seam a real per-group model-scoring function plugs into);
    applyInPandas materializes each group in executor memory, so at
    scale its grouping key must be high-cardinality/bounded-size. A
    z-score itself needs no UDF at 100 TB: two-pass declarative
    (groupBy mean/stddev → broadcast join → row-local arithmetic).
    """

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=0)
        z = (pdf["value"] - mu) / sd if sd and not math.isnan(sd) else pdf["value"] * 0.0
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "event_type": pdf["event_type"], "z": z.round(4)}
        )

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .applyInPandas(zscore, schema="event_id long, event_type string, z double")
    )


_UDF_ZSCORE_SQL = """
SELECT event_id, event_type,
  ROUND((value - AVG(value) OVER w) / stddev_pop(value) OVER w, 4) AS z
FROM events
WINDOW w AS (PARTITION BY event_type)
ORDER BY event_id
"""


def udf_grouped_agg_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (UDAF surface): value range per user."""

    @F.pandas_udf("double")
    def val_range(v: pd.Series) -> float:
        return float(v.max() - v.min())

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.round(val_range(F.col("value")), 6).alias("value_range"))
        .orderBy("user_id")
    )


_UDF_RANGE_SQL = """
SELECT user_id, ROUND(MAX(value) - MIN(value), 6) AS value_range
FROM events GROUP BY user_id ORDER BY user_id
"""


def udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) via LATERAL join: explode each doc's
    text into (pos, token) rows — the user-defined row-generator surface
    (SURVEY.md §2.2 "grouped-map UDF / UDTF").

    Scale notes: the UDTF runs per-partition in a Python worker with
    Arrow transfer; each input row fans out independently, so the
    operator is embarrassingly parallel with no shuffle. Prefer the
    built-in posexplode(split(...)) when semantics allow — this entry
    exists to gate the UDTF machinery itself.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: bigint, token: string")
    class TokenizePositions:
        def eval(self, text: str):
            # `is not None`, not truthiness: ''.split(' ') == [''] — an
            # empty-string doc must emit one (1, '') row exactly like
            # the oracle's string_split('', ' '); only NULL yields none
            if text is not None:
                for i, tok in enumerate(text.split(" "), start=1):
                    yield i, tok

    spark.udtf.register("tokenize_positions", TokenizePositions)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 50
    ).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT doc_id, t.pos, t.token
        FROM _udtf_docs, LATERAL tokenize_positions(text) t
        ORDER BY doc_id, pos
        """
    )


# DuckDB zips parallel UNNESTs in one select — the lateral-UDTF twin.
_UDTF_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents WHERE doc_id < 50)
SELECT doc_id,
  UNNEST(generate_series(1, len(toks))) AS pos,
  UNNEST(toks) AS token
FROM t
ORDER BY doc_id, pos
"""


def udf_arrow_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the last member of the Python UDF API family
    (scalar pandas / grouped-map / grouped-agg / UDTF / mapInPandas are
    covered elsewhere): per-batch numpy compute DIRECTLY on Arrow
    RecordBatches, skipping the Arrow→pandas conversion mapInPandas
    pays (no Series boxing, no copy for list columns — on wide
    embedding batches the conversion is most of mapInPandas' overhead).

    Computes per-vector L2 norms. Determinism contract: the float32
    embeddings are cast to double JVM-SIDE first (float32² in double is
    exact — 48-bit product fits the 53-bit mantissa), and the segment
    sums use np.add.reduceat, which accumulates SEQUENTIALLY per
    segment — the same left-to-right order as the oracle's list_sum,
    so the doubles match bit-for-bit before the presentation round."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("e")
    )
    return (
        emb.mapInArrow(_arrow_l2_batches, "vec_id bigint, l2 double")
        .select("vec_id", F.round("l2", 6).alias("l2"))
        .orderBy("vec_id")
    )


def _arrow_l2_batches(batches):
    """mapInArrow body for udf_arrow_vector_norms (module-level so the
    empty-vector edge cases are unit-testable —
    tests/test_empty_inputs.py::test_arrow_l2_batches_empty_vectors).

    Empty-row handling is done by FILTERING the reduceat index list to
    non-empty rows and scattering back into zeros: passing every start
    to np.add.reduceat is wrong on the edges (a TRAILING empty row's
    start == len(values) raises IndexError before any masking can run,
    and an all-empty batch breaks the mask's shape) — a filtered index
    list stays strictly < len(values), and because an empty row spans
    zero elements, each surviving segment still covers exactly its own
    row's extent."""
    import numpy as np
    import pyarrow as pa

    for b in batches:
        col = b.column("e")
        if isinstance(col, pa.ChunkedArray):  # defensive: combine
            col = col.combine_chunks()
        flat = col.values.to_numpy(zero_copy_only=False)
        offsets = col.offsets.to_numpy()
        # On a sliced ListArray, .values is the ENTIRE child array while
        # .offsets are absolute indices into it — reduceat's final
        # segment runs to len(flat), so trailing child values past the
        # last list's end would silently inflate the last non-empty
        # row's norm. Truncate at the last offset (absolute starts stay
        # valid; leading sliced-off values are never reached because
        # every segment begins at its own row's absolute start).
        flat = flat[: offsets[-1]]
        starts = offsets[:-1]
        nonempty = offsets[1:] > starts
        seg = np.zeros(len(starts))
        if nonempty.any():
            seg[nonempty] = np.add.reduceat(flat * flat, starts[nonempty])
        yield pa.RecordBatch.from_arrays(
            [b.column("vec_id"), pa.array(np.sqrt(seg), type=pa.float64())],
            ["vec_id", "l2"],
        )


_UDF_ARROW_SQL = """
SELECT vec_id,
  ROUND(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6) AS l2
FROM embeddings ORDER BY vec_id
"""


QUERIES = {
    "tfidf_top_terms": tfidf_top_terms,
    "udtf_token_positions": udtf_token_positions,
    "udf_pandas_scaled_value": udf_pandas_scaled_value,
    "udf_grouped_zscore": udf_grouped_zscore,
    "udf_grouped_agg_range": udf_grouped_agg_range,
    "udf_arrow_vector_norms": udf_arrow_vector_norms,
}

ORACLE = {
    "tfidf_top_terms": _TFIDF_SQL,
    "udtf_token_positions": _UDTF_SQL,
    "udf_pandas_scaled_value": _UDF_PANDAS_SQL,
    "udf_grouped_zscore": _UDF_ZSCORE_SQL,
    "udf_grouped_agg_range": _UDF_RANGE_SQL,
    "udf_arrow_vector_norms": _UDF_ARROW_SQL,
}
