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
