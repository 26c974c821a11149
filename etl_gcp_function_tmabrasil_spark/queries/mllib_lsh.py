"""MLlib LSH operators — the built-in scale path for near-dup dedup and
approximate similarity join (SURVEY.md §2.2: "MinHashLSH …
approxSimilarityJoin", "BucketedRandomProjectionLSH").

These complement the explicit md5-based sketches in dedup_approx.py /
similarity.py: the explicit versions have exact DuckDB oracles (the
correctness story); these exercise Spark's own LSH estimators (the
operational story — fitted models, transform pipelines,
approxSimilarityJoin's internal explode+join). MLlib hash families are
not SQL-reproducible, so these entries carry no oracle — the driver
records rows-only checks, and `tests/test_mllib_lsh.py` gates quality
by recall against the exact operators.

Scale notes: both estimators are fit on a sample-sized statistic (their
`fit` only seeds hash functions — no data pass), transform is row-local,
and approxSimilarityJoin shuffles on hash buckets only — the same
join-on-selective-key shape as our explicit LSH, so the 100 TB story is
identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_gcp_function_tmabrasil_spark.catalog import load_table

SEED = 42


def dedup_minhash_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via MLlib HashingTF → MinHashLSH →
    approxSimilarityJoin (Jaccard distance ≤ 0.5)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("tokens"))
        .filter(F.size("tokens") > 0)
    )
    tf = HashingTF(
        inputCol="tokens", outputCol="features", numFeatures=1 << 18, binary=True
    )
    feats = tf.transform(docs)
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=SEED)
    model = mh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.5, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc1"),
            F.col("datasetB.doc_id").alias("doc2"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
        .orderBy("doc1", "doc2")
    )


def ann_brp_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate neighbor pairs via BucketedRandomProjectionLSH over
    the embedding column (euclidean distance ≤ 4.0), nearest bucketmate
    per vector."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        array_to_vector(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("features"),
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=2.0,
        numHashTables=4,
        seed=SEED,
    )
    model = brp.fit(emb)
    pairs = model.approxSimilarityJoin(emb, emb, 4.0, distCol="dist")
    w = W.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        pairs.filter(F.col("datasetA.vec_id") != F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("query_id"),
            F.col("datasetB.vec_id").alias("neighbor_id"),
            F.round("dist", 4).alias("dist"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", "neighbor_id", "dist")
        .orderBy("query_id")
    )


QUERIES = {
    "dedup_minhash_mllib": dedup_minhash_mllib,
    "ann_brp_mllib": ann_brp_mllib,
}

# No DuckDB oracle: MLlib's hash families are not SQL-reproducible.
# Quality is gated by recall tests against the exact operators.
ORACLE: dict[str, str] = {}
