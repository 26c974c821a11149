"""Multimodal plumbing tests: schema, decode, resize, frame sampling —
hermetic via the deterministic FakeCodec; the real-codec seam must raise
cleanly when its library is absent."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_gcp_function_tmabrasil_spark.operators.multimodal import (
    FakeCodec,
    PillowCodec,
    decode_media_meta,
    encode_fake_media,
    resize_media,
    sample_frames,
    synth_media_table,
)


def test_decode_meta(spark):
    media = synth_media_table(spark, 30)
    decoded = decode_media_meta(media)
    rows = {r.media_id: r for r in decoded.collect()}
    assert len(rows) == 30
    for i, r in rows.items():
        assert r.width == 64 + i % 8 * 16
        assert r.height == 48 + i % 5 * 16
        assert r.n_frames == 1 + i % 7
        assert r.content_length == 10 + 12 + r.n_frames  # magic+header+body
    assert "content" not in decoded.columns, "raw bytes must not pass through"


def test_resize_rewrites_dims_only(spark):
    media = synth_media_table(spark, 12)
    resized = resize_media(media, 0.5)
    assert resized.schema == media.schema
    before = {r.media_id: r for r in decode_media_meta(media).collect()}
    after = {r.media_id: r for r in decode_media_meta(resized).collect()}
    for i in before:
        assert after[i].width == max(1, before[i].width // 2)
        assert after[i].n_frames == before[i].n_frames  # payload untouched


def test_sample_frames_explodes_rows(spark):
    media = synth_media_table(spark, 9)
    frames = sample_frames(media, every_k=2)
    got = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    want = {i: (1 + i % 7 + 1) // 2 for i in range(9)}
    assert {r.media_id: r.n for r in got} == want
    # frame values are the deterministic synthetic bytes
    v = {(r.media_id, r.frame_index): r.frame_value for r in frames.collect()}
    assert v[(3, 0)] == (3 * 31) % 251


def test_corrupt_payload_fails_loudly(spark):
    df = spark.createDataFrame(
        [(0, "image", b"garbage", ("s", 7))],
        "media_id long, kind string, content binary, meta struct<source:string,content_length:bigint>",
    )
    with pytest.raises(Exception):
        decode_media_meta(df).collect()


def test_real_codec_seam_is_marked():
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow unexpectedly present")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        PillowCodec()


def test_arrow_batch_bound(spark):
    """Batch size honors arrow.maxRecordsPerBatch (memory-bounding knob
    for multi-MB payloads)."""
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "8")
    try:
        media = synth_media_table(spark, 64).coalesce(1)
        import pandas as pd

        sizes = []

        def record(batches):
            for pdf in batches:
                sizes.append(len(pdf))
                yield pd.DataFrame({"n": [len(pdf)]})

        media.mapInPandas(record, schema="n int").collect()
        # sizes observed on executors aren't visible here; assert via output
        out = media.mapInPandas(record, schema="n int").collect()
        assert max(r.n for r in out) <= 8
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


def test_extract_features_shape_and_determinism(spark):
    from etl_gcp_function_tmabrasil_spark.operators.multimodal import (
        extract_features,
        synth_media_table,
    )

    media = synth_media_table(spark, n=32)
    feats = extract_features(media, dim=16)
    rows = {r.media_id: r.embedding for r in feats.collect()}
    assert len(rows) == 32
    assert all(len(v) == 16 for v in rows.values())
    # L2-normalized and deterministic across runs
    import math

    for v in rows.values():
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-5
    again = {r.media_id: r.embedding for r in extract_features(media, dim=16).collect()}
    assert rows == again


def test_embed_knn_banded_lsh_vs_exact(spark):
    """multimodal_embed_knn routes candidates through a banded
    hyperplane-LSH equi-join; against the exact all-pairs answer it must
    keep high coverage and recall, and can never beat the exact best
    cosine (candidates are a subset of all pairs)."""
    import numpy as np

    from etl_gcp_function_tmabrasil_spark.operators.multimodal import (
        extract_features,
        synth_media_table,
    )
    from etl_gcp_function_tmabrasil_spark.queries.multimodal_q import (
        _N_MEDIA,
        multimodal_embed_knn,
    )

    approx = {
        r.media_id: (r.neighbor_id, r.cosine)
        for r in multimodal_embed_knn(spark, "unused").collect()
    }
    emb = extract_features(synth_media_table(spark, n=_N_MEDIA), dim=16).collect()
    vecs = {r.media_id: np.array(r.embedding, dtype=float) for r in emb}
    ids = sorted(vecs)
    exact = {
        i: max(
            (round(float(vecs[i] @ vecs[j]), 4) for j in ids if j != i),
        )
        for i in ids
    }
    assert len(approx) / len(ids) >= 0.95, "LSH banding lost >5% coverage"
    hits = sum(1 for i in approx if approx[i][1] == exact[i])
    assert hits / len(approx) >= 0.8, "recall@1 vs exact all-pairs below 0.8"
    for i in approx:
        assert approx[i][1] <= exact[i] + 1e-9, "approx NN beat exact NN"
