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


_EMBED_DIM = 16
_KNN_BANDS = 4
_KNN_BAND_BITS = 3  # 4 bands x 3 sign bits -> 8 buckets per band


def _knn_planes() -> list[list[float]]:
    """Deterministic hyperplanes for the 16-dim media embeddings
    (seed 43 — distinct from similarity.py's 64-dim family)."""
    import numpy as np

    rng = np.random.RandomState(43)
    return [
        [round(float(v), 6) for v in row]
        for row in rng.randn(_KNN_BANDS * _KNN_BAND_BITS, _EMBED_DIM)
    ]


def multimodal_embed_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary → feature-extract (embedding column) → approximate cosine
    nearest neighbor per media item: the full multimodal→similarity
    bridge on one plan.

    Candidates come from a banded hyperplane-LSH equi-join (4 bands × 3
    sign bits), NOT an all-pairs non-equi join — the same 100 TB shape
    as similarity.cosine_dedup_candidates: sketch is row-local, the only
    shuffle is band-keyed, fan-out is per-bucket size. Items whose every
    band bucket is a singleton have no candidates and drop out (coverage
    and recall vs the exact all-pairs answer are pinned in
    tests/test_multimodal.py)."""
    from pyspark.sql import Window as W

    from etl_gcp_function_tmabrasil_spark.functions.vector import dot as _dot

    media = synth_media_table(spark, n=_N_MEDIA)
    emb = extract_features(media, dim=_EMBED_DIM).select(
        "media_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    bands = []
    for b in range(_KNN_BANDS):
        val = None
        for j in range(_KNN_BAND_BITS):
            p = _knn_planes()[b * _KNN_BAND_BITS + j]
            lit = F.array(*[F.lit(v) for v in p])
            bit = F.when(F.round(_dot(F.col("e"), lit), 6) > 0, F.lit(2**j)).otherwise(
                F.lit(0)
            )
            val = bit if val is None else val + bit
        bands.append(val)
    bb = emb.select(
        "media_id", "e", F.posexplode(F.array(*bands)).alias("band_id", "band_val")
    )
    x, y = bb.alias("x"), bb.alias("y")
    # embeddings are L2-normalized by extract_features: cosine == dot
    cos = _dot(F.col("x.e"), F.col("y.e"))
    w = W.partitionBy("media_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        x.join(
            y,
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_val") == F.col("y.band_val"))
            & (F.col("x.media_id") != F.col("y.media_id")),
        )
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


def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary → resize(0.5) → decode → per-kind dimension rollup: the
    transform-then-reingest loop (thumbnailing / downsampling before
    feature extraction) on one plan. Compares against the original
    decode in the same result so the rows-only check pins the
    width-halving relation, not just row counts."""
    media = synth_media_table(spark, n=_N_MEDIA)
    from etl_gcp_function_tmabrasil_spark.operators.multimodal import resize_media

    orig = (
        decode_media_meta(media)
        .groupBy("kind")
        .agg(F.sum("width").alias("orig_width_sum"))
    )
    resized = (
        decode_media_meta(resize_media(media, 0.5))
        .groupBy("kind")
        .agg(F.sum("width").alias("resized_width_sum"))
    )
    return (
        orig.join(resized, "kind")
        .select(
            "kind",
            "orig_width_sum",
            "resized_width_sum",
            F.round(
                F.col("resized_width_sum") / F.col("orig_width_sum"), 3
            ).alias("shrink_ratio"),
        )
        .orderBy("kind")
    )


QUERIES = {
    "multimodal_decode_stats": multimodal_decode_stats,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_embed_knn": multimodal_embed_knn,
    "multimodal_resize_stats": multimodal_resize_stats,
}

# No oracle: binary codec plumbing is not SQL-expressible (rows-only
# driver check; invariants live in tests/test_multimodal.py).
ORACLE: dict[str, str] = {}
