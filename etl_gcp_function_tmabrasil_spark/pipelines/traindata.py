"""The end-to-end training-data curation pipeline — the north-star use
case composed from the engine's own operator families in ONE declarative
plan (normalize → quality gate → exact near-dup collapse → per-source
accounting):

1. normalize: trim + whitespace-collapse the text (scalar string fns),
2. quality gate: drop docs below a length floor or above a repetition
   ceiling (text-analysis expressions, queries/text_analysis.py),
3. dedup: collapse exact duplicates by normalized-text fingerprint,
   keeping the smallest doc_id (groupBy, the exact-dedup operator from
   queries/dedup_approx.py),
4. account: per (lang, source) — kept docs, dropped-by-dedup counts,
   surviving chars (the rollup a curation run reports).

Every stage is SQL-expressible, so the WHOLE pipeline is oracle-checked
end-to-end (registered as `pipeline_curate_documents`); the near-dup
stage (MinHash LSH) and ANN stages chain onto step 3's output in
production — they keep their own oracle/recall gates in this repo.

Scale notes: stages 1-2 are row-local; stage 3 is one shuffle on the
fingerprint; stage 4 is one shuffle on a bounded key. Nothing is
collected, counted eagerly, or iterated driver-side; the curated
DataFrame feeds `sinks/partitioned.py` or the BigQuery-shaped sink
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_gcp_function_tmabrasil_spark.catalog import load_table

MIN_CHARS = 50
MAX_REPETITION = 0.8

# the ONE whitespace class shared by every fingerprint path (queries
# and pipeline) — a second copy here would let the curation pipeline's
# fingerprints drift from the query layer's for the same documents
from etl_gcp_function_tmabrasil_spark.queries._util import WS_CLASS as _WS_CLASS


def curated_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stages 1-3: the surviving documents (doc_id, lang, source,
    norm_text, n_chars), one keeper per duplicate group.

    Single-scan dedup: group size and keeper selection come from a
    window over the fingerprint partition — one shuffle on fp, one pass
    over documents. (An earlier groupBy + join-back formulation ran the
    scan + normalization regex + quality gates TWICE, once per join
    side.)
    """
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim("text"), _WS_CLASS, " ")
    toks = F.split("norm_text", " ")
    rep_ratio = 1.0 - F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    staged = (
        docs.select("doc_id", "lang", "source", norm.alias("norm_text"), "n_chars")
        .filter(F.col("n_chars") >= MIN_CHARS)
        .filter(rep_ratio <= MAX_REPETITION)
    )
    w = W.partitionBy("fp")
    return (
        staged.withColumn("fp", F.md5("norm_text"))
        .withColumn("group_size", F.count(F.lit(1)).over(w))
        .withColumn("keeper", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keeper"))
        .select("doc_id", "lang", "source", "norm_text", "n_chars", "group_size")
    )


def curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 4: per-(lang, source) accounting of the curation run."""
    kept = curated_documents(spark, sf_dir)
    return (
        kept.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            (F.sum("group_size") - F.count(F.lit(1))).alias("deduped_away"),
            F.sum("n_chars").alias("kept_chars"),
        )
        .orderBy("lang", "source")
    )


_REPORT_SQL = f"""
WITH staged AS (
  SELECT doc_id, lang, source,
    regexp_replace(trim(text), '{_WS_CLASS}', ' ', 'g') AS norm_text, n_chars
  FROM documents
  WHERE n_chars >= {MIN_CHARS}
    AND 1.0 - CAST(len(list_distinct(string_split(
          regexp_replace(trim(text), '{_WS_CLASS}', ' ', 'g'), ' '))) AS DOUBLE)
        / len(string_split(regexp_replace(trim(text), '{_WS_CLASS}', ' ', 'g'), ' '))
        <= {MAX_REPETITION}
),
keepers AS (
  SELECT md5(norm_text) AS fp, MIN(doc_id) AS doc_id, COUNT(*) AS group_size
  FROM staged GROUP BY fp
),
kept AS (
  SELECT s.doc_id, s.lang, s.source, s.n_chars, k.group_size
  FROM staged s JOIN keepers k ON s.doc_id = k.doc_id
)
SELECT lang, source, COUNT(*) AS kept_docs,
  CAST(SUM(group_size) - COUNT(*) AS BIGINT) AS deduped_away,
  CAST(SUM(n_chars) AS BIGINT) AS kept_chars
FROM kept GROUP BY lang, source
ORDER BY lang, source
"""

#: Per-language keep-percentages for the stratified sample (language
#: rebalancing — the standard pretraining-mix knob).
SAMPLE_PCT = {"en": 80, "de": 50, "es": 50, "fr": 50, "zh": 25}


def sample_stratified_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling per language: keep a doc iff
    hash(doc_id) mod 100 < pct[lang].

    Hash-mod sampling (not `sampleBy`) on purpose: the sample is a pure
    function of the row, so re-runs, retries, and incremental backfills
    select the SAME rows — reproducibility a Bernoulli RNG sample can't
    give — and the DuckDB oracle reproduces it exactly. Row-local, no
    shuffle until the accounting agg.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(
        "pmod(cast(conv(substring(md5(cast(doc_id as string)),1,15),16,10) as bigint), 100)"
    )
    pct = F.coalesce(
        *[F.when(F.col("lang") == lang, F.lit(p)) for lang, p in SAMPLE_PCT.items()],
        F.lit(0),
    )
    return (
        docs.withColumn("bucket", bucket)
        .filter(F.col("bucket") < pct)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("sampled_docs"), F.sum("n_chars").alias("sampled_chars"))
        .orderBy("lang")
    )


def _sample_sql() -> str:
    cases = " ".join(
        f"WHEN lang = '{lang}' THEN {p}" for lang, p in SAMPLE_PCT.items()
    )
    return f"""
SELECT lang, COUNT(*) AS sampled_docs, CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
FROM documents
WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100)
      < (CASE {cases} ELSE 0 END)
GROUP BY lang
ORDER BY lang
"""


QUERIES = {
    "pipeline_curate_documents": curation_report,
    "sample_stratified_docs": sample_stratified_docs,
}
ORACLE = {
    "pipeline_curate_documents": _REPORT_SQL,
    "sample_stratified_docs": _sample_sql(),
}


def curated_documents_observed(spark: SparkSession, sf_dir: str):
    """curated_documents plus single-pass run accounting via the
    Observation API: (kept rows, kept chars, max duplicate-group size)
    are collected as metrics of the SAME job that materializes the
    output — no second scan, no separate count() action, which is how a
    production run reports itself at 100 TB without doubling cost.

    Returns (DataFrame, Observation); read `observation.get` AFTER an
    action on the DataFrame.
    """
    from pyspark.sql import Observation

    obs = Observation("curation_run")
    kept = curated_documents(spark, sf_dir).observe(
        obs,
        F.count(F.lit(1)).alias("kept_docs"),
        F.sum("n_chars").alias("kept_chars"),
        F.max("group_size").alias("max_group"),
    )
    return kept, obs
