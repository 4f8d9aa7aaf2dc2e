"""Multimodal column plumbing: opaque binary media + typed metadata.

The Spark-side shape is real and tested — binary columns, Arrow-batched
mapInPandas with explicit schemas, partition-friendly metadata extraction.
The actual media DECODING is stubbed (`decode_media`) because no image/audio
libraries exist in this container: it raises NotImplementedError unless the
deterministic fake decoder is requested, exactly as a production pipeline
would gate on codec availability.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("media", T.BinaryType(), False),
    T.StructField("media_type", T.StringType(), False),
])

META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("content_md5", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
])


def attach_fake_media(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Stand-in media: the utf-8 bytes of text as an opaque binary column.
    (Real pipelines read image/audio bytes from object storage; the binary
    column + schema discipline is identical.)"""
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.lit("application/x-fake").alias("media_type"))


def decode_media(payload: bytes, media_type: str, fake: bool = False):
    """STUB: decode image/audio bytes to pixels/samples.

    No codec libraries exist in this container. ``fake=True`` returns a
    deterministic pseudo-decode (dimensions derived from an md5 of the
    payload) so the downstream plumbing is testable; otherwise raises.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires PIL/ffmpeg, not available in this env; "
            "pass fake=True for the deterministic test decoder")
    h = hashlib.md5(payload).hexdigest()
    return {"width": int(h[:4], 16) % 1920 + 1,
            "height": int(h[4:8], 16) % 1080 + 1}


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame", T.BinaryType(), False),
    T.StructField("frame_md5", T.StringType(), False),
])


def sample_frames(media: DataFrame, stride: int = 4) -> DataFrame:
    """Video frame sampling PLUMBING: one output row per sampled frame,
    `(doc_id, frame_idx, frame binary, frame_md5)`, Arrow-batched.

    The decode is the deterministic fake (no ffmpeg in this container): a
    clip's frame count derives from md5 of the payload (1..32) and each
    sampled frame's bytes are the md5 digest of payload:idx — which makes
    the op DuckDB-oracle-checkable while keeping the production shape: a
    real pipeline swaps the two md5 lines for ffmpeg seek+decode and the
    schema, fan-out (explode inside mapInPandas, no driver loop), and
    partitioning story stay identical. Frames inherit the input row's
    partition — a downstream repartition on (doc_id, frame_idx) shards
    per-frame feature work across executors."""

    def fn(batches):
        for pdf in batches:
            ids, idxs, frames, hexes = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(payload)
                n = int(hashlib.md5(payload).hexdigest()[8:12], 16) % 32 + 1
                for i in range(0, n, stride):
                    d = hashlib.md5(payload + b":" + str(i).encode())
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(d.digest())
                    hexes.append(d.hexdigest())
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame": frames,
                "frame_md5": hexes,
            })

    return media.mapInPandas(fn, FRAME_SCHEMA)


EMBED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("dim", T.IntegerType(), False),
    T.StructField("value", T.DoubleType(), False),
])


def embed_media(media: DataFrame, dim: int = 8) -> DataFrame:
    """Feature-extraction PLUMBING: media bytes -> a dim-dimensional
    feature vector, exploded as `(doc_id, dim, value)` rows (array-free so
    the cross-engine value-hash compare is exact). The 'model' is the
    deterministic fake — value_j = md5(j|payload) mapped into [0, 1) at
    4dp — standing in for an ONNX/vision encoder the way decode_media's
    fake stands in for codecs; batch shape (one Arrow batch in, vectorized
    per-batch work, schema-typed out) is the production contract."""

    def fn(batches):
        for pdf in batches:
            ids, dims, vals = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(payload)
                for j in range(dim):
                    h = hashlib.md5(str(j).encode() + b"|" + payload)
                    ids.append(doc_id)
                    dims.append(j)
                    vals.append((int(h.hexdigest()[:8], 16) % 10_000) / 10_000.0)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "dim": pd.Series(dims, dtype="int32"),
                "value": pd.Series(vals, dtype="float64"),
            })

    return media.mapInPandas(fn, EMBED_SCHEMA)


def extract_media_meta(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched metadata extraction over binary media columns."""

    def fn(batches):
        for pdf in batches:
            metas = [decode_media(bytes(b), t, fake=fake_decode)
                     for b, t in zip(pdf["media"], pdf["media_type"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pdf["media"].map(len).astype("int64"),
                "content_md5": pdf["media"].map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "width": pd.Series([m["width"] for m in metas], dtype="int32"),
                "height": pd.Series([m["height"] for m in metas], dtype="int32"),
            })

    return media.mapInPandas(fn, META_SCHEMA)
