"""Multimodal operators as driver-checkable queries (SURVEY.md §2.2
"multimodal columns" + north star "multimodal columns … make the
Spark-side plumbing real and tested").

The media payloads are deterministic synthetic bitstreams
(operators/multimodal.synth_media_table, seeded by media_id), so these
queries are reproducible run-to-run; they carry no DuckDB oracle —
binary codec plumbing is not SQL-expressible — and rely on the driver's
rows-only check plus the invariants in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_gcp_function_tmabrasil_spark.operators.multimodal import (
    decode_media_meta,
    extract_features,
    sample_frames,
    synth_media_table,
)

_N_MEDIA = 96


def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary → decode(meta) via mapInPandas → per-kind rollup: the
    decode plumbing end-to-end with the raw bytes projected away before
    the shuffle."""
    media = synth_media_table(spark, n=_N_MEDIA)
    return (
        decode_media_meta(media)
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_frames").alias("total_frames"),
            F.min("width").alias("min_width"),
            F.max("height").alias("max_height"),
            F.sum("content_length").alias("total_bytes"),
        )
        .orderBy("kind")
    )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary → frame-sample (row explosion) → per-media frame stats."""
    media = synth_media_table(spark, n=_N_MEDIA).filter(F.col("kind") == "video")
    return (
        sample_frames(media, every_k=2)
        .groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("frame_value").alias("sum_values"),
        )
        .orderBy("media_id")
    )


def multimodal_embed_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary → feature-extract (embedding column) → cosine nearest
    neighbor per media item: the full multimodal→similarity bridge on
    one plan (same kNN shape as queries/similarity.py)."""
    from pyspark.sql import Window as W

    from etl_gcp_function_tmabrasil_spark.functions.vector import dot as _dot

    media = synth_media_table(spark, n=_N_MEDIA)
    emb = extract_features(media, dim=16).select(
        "media_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    x, y = emb.alias("x"), emb.alias("y")
    # embeddings are L2-normalized by extract_features: cosine == dot
    cos = _dot(F.col("x.e"), F.col("y.e"))
    w = W.partitionBy("media_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        x.join(y, F.col("x.media_id") != F.col("y.media_id"))
        .select(
            F.col("x.media_id").alias("media_id"),
            F.col("y.media_id").alias("neighbor_id"),
            F.round(cos, 4).alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("media_id", "neighbor_id", "cosine")
        .orderBy("media_id")
    )


QUERIES = {
    "multimodal_decode_stats": multimodal_decode_stats,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_embed_knn": multimodal_embed_knn,
}

# No oracle: binary codec plumbing is not SQL-expressible (rows-only
# driver check; invariants live in tests/test_multimodal.py).
ORACLE: dict[str, str] = {}
