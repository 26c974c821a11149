"""Multimodal columns (SURVEY.md §2.2 "multimodal columns" + north star):
image/audio/video as opaque `binary` columns with typed metadata, and the
decode / feature-extract / resize / frame-sample operators as
Arrow-batched mapInPandas transforms.

The Spark-side plumbing — schemas, partitioning, UDF signatures, batch
shapes — is real and tested. The codec step is pluggable: the default
`FakeCodec` parses a deterministic synthetic header (so tests are
hermetic); `PillowCodec`/`AvCodec` raise NotImplementedError unless their
libraries are importable (they are not in this container — STUB by
design, same seam).

Scale notes: binary payloads ride the columnar path (parquet BYTE_ARRAY;
Arrow buffers into pandas with zero row-at-a-time pickling). Batches are
bounded by `spark.sql.execution.arrow.maxRecordsPerBatch` — set it low
(e.g. 64) for multi-MB media so a batch stays within executor memory.
Decoded features are tiny; write them back columnar and keep the raw
bytes out of shuffles (project them away before any join/agg).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

#: media row: opaque payload + typed metadata struct (binaryFile-shaped).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("content_length", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

_MAGIC = b"FAKEMEDIA1"  # deterministic synthetic header


def encode_fake_media(media_id: int, kind: str, width: int, height: int, n_frames: int) -> bytes:
    """Deterministic synthetic payload: magic + (w, h, frames) header +
    one byte per frame derived from media_id. Stands in for a real codec
    bitstream so plumbing tests are hermetic."""
    header = _MAGIC + struct.pack("<III", width, height, n_frames)
    body = bytes((media_id * 31 + i) % 251 for i in range(n_frames))
    return header + body


def synth_media_table(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/demos."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        w, h, frames = 64 + i % 8 * 16, 48 + i % 5 * 16, 1 + i % 7
        rows.append(
            (i, kind, encode_fake_media(i, kind, w, h, frames), (f"src{i % 4}", None))
        )
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    return df.withColumn(
        "meta",
        F.struct(
            F.col("meta.source").alias("source"),
            F.length("content").cast("long").alias("content_length"),
        ),
    )


class FakeCodec:
    """Parses the synthetic header/body. Deterministic, dependency-free."""

    def decode_meta(self, content: bytes) -> tuple[int, int, int]:
        if content is None or not content.startswith(_MAGIC):
            raise ValueError("not a FAKEMEDIA payload")
        w, h, n = struct.unpack("<III", content[len(_MAGIC) : len(_MAGIC) + 12])
        return w, h, n

    def frames(self, content: bytes) -> bytes:
        return content[len(_MAGIC) + 12 :]


class PillowCodec:
    """Real image decode via PIL — STUB: the library is not in this
    container; the class exists to mark the production seam."""

    def __init__(self) -> None:
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "PillowCodec requires Pillow; use FakeCodec in this environment"
            ) from e


def decode_media_meta(df: DataFrame, codec=None) -> DataFrame:
    """Decode (width, height, n_frames) from the payload via mapInPandas.

    Output drops the raw bytes — downstream operators get the features,
    not the payload (keep binary out of shuffles).
    """
    codec = codec or FakeCodec()
    schema = "media_id long, kind string, width int, height int, n_frames int, content_length long"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [codec.decode_meta(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "n_frames": [m[2] for m in metas],
                    "content_length": pdf["content"].map(len),
                }
            )

    return df.mapInPandas(decode, schema=schema)


def resize_media(df: DataFrame, scale: float, codec=None) -> DataFrame:
    """'Resize': rewrite the header with scaled dimensions (a real codec
    would transcode pixels; the plumbing — binary in, binary out, schema
    preserved — is identical)."""
    codec = codec or FakeCodec()

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for c in pdf["content"]:
                w, h, n = codec.decode_meta(c)
                out.append(
                    _MAGIC
                    + struct.pack("<III", max(1, int(w * scale)), max(1, int(h * scale)), n)
                    + codec.frames(c)
                )
            pdf = pdf.copy()
            pdf["content"] = out
            yield pdf

    return df.mapInPandas(resize, schema=df.schema)


def sample_frames(df: DataFrame, every_k: int, codec=None) -> DataFrame:
    """Frame sampling: keep every k-th frame byte; emits one row per
    kept frame (row-explosion shape of video → frame pipelines)."""
    codec = codec or FakeCodec()
    schema = "media_id long, frame_index int, frame_value int"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, vals = [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                frames = codec.frames(c)
                for i in range(0, len(frames), every_k):
                    ids.append(mid)
                    idxs.append(i)
                    vals.append(frames[i])
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_value": vals}
            )

    return df.mapInPandas(sample, schema=schema)


def extract_features(df: DataFrame, dim: int = 16, codec=None) -> DataFrame:
    """Feature extraction: binary payload → dense `array<float>` embedding.

    The bridge from multimodal columns into the similarity stack
    (queries/similarity.py operates on exactly this shape): header
    dimensions + a byte-histogram of the frame payload, L2-normalized —
    a deterministic stand-in for a real vision/audio encoder behind the
    same seam (swap the codec + this function's body for CLIP et al.;
    signature, batching, and output schema stay fixed).

    Scale notes: Arrow-batched mapInPandas, numpy per batch; output is
    dim floats per row, so the embedding column shuffles cheaply while
    the raw bytes stay behind in the scan projection.
    """
    import numpy as np

    codec = codec or FakeCodec()
    schema = "media_id long, kind string, embedding array<float>"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for c in pdf["content"]:
                w, h, n = codec.decode_meta(c)
                frames = np.frombuffer(codec.frames(c), dtype=np.uint8)
                hist, _ = np.histogram(frames, bins=dim - 3, range=(0, 256))
                v = np.concatenate(
                    [np.array([w, h, n], dtype=np.float64), hist.astype(np.float64)]
                )
                norm = np.linalg.norm(v)
                embs.append((v / norm if norm else v).astype(np.float32).tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "embedding": embs}
            )

    return df.mapInPandas(extract, schema=schema)
