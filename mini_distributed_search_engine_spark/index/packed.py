"""Packed (compressed) inverted index: per-(term, doc-shard) binary segments.

Shape (north rule): per-partition sorted posting lists — term -> delta-encoded
docID gaps + tf arrays, varint-compressed — built as shards, then
hierarchically merged.

Sharding is BY DOC RANGE (shard_id = doc_id DIV shard_span), which is also
the skew strategy: a stop-word-like hot term (role/tool tokens) never forms
one giant group — its postings split across all doc shards, bounding every
encode task at shard_span postings. Merging adjacent shards of a term is a
byte splice (only the first gap of the right-hand run is rewritten —
`codec.splice_gap_streams`), so merge levels cost O(bytes), not O(decode).

Query-side, doc-range shards make exact distributed top-k trivial: shards
partition the doc space, so per-shard top-k (MaxScore/WAND inside an Arrow
group) union-ed then globally ranked is exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .codec import BLOCK, decode_postings, encode_postings, splice_gap_streams, tf_norm

PACKED_SCHEMA = T.StructType([
    T.StructField("term", T.StringType(), False),
    T.StructField("shard_id", T.IntegerType(), False),
    T.StructField("df", T.LongType(), False),        # segment-local
    T.StructField("global_df", T.LongType(), False),  # term total (idf input)
    T.StructField("first_doc", T.LongType(), False),
    T.StructField("last_doc", T.LongType(), False),
    T.StructField("doc_gaps", T.BinaryType(), False),
    T.StructField("tfs", T.BinaryType(), False),
    T.StructField("dls", T.BinaryType(), False),
    T.StructField("block_last_doc", T.ArrayType(T.LongType()), False),
    T.StructField("block_max_tf_norm", T.ArrayType(T.DoubleType()), False),
    T.StructField("max_tf_norm", T.DoubleType(), False),
])

DEFAULT_SHARD_SPAN = 1 << 20  # docs per shard; bounds any encode group size


def build_packed_postings(term_doc_tf: DataFrame, avgdl: float,
                          shard_span: int = DEFAULT_SHARD_SPAN) -> DataFrame:
    """(term, doc_id, tf, dl) rows -> packed per-(term, shard) segments.

    One exchange on (term, shard_id); each group is at most shard_span
    postings regardless of term hotness.
    """
    with_shard = term_doc_tf.withColumn(
        "shard_id", (F.col("doc_id") / F.lit(shard_span)).cast("int"))

    def encode_group(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        term, shard_id = key
        enc = encode_postings(pdf["doc_id"].to_numpy(), pdf["tf"].to_numpy(),
                              pdf["dl"].to_numpy(), avgdl)
        return pd.DataFrame([{
            "term": term, "shard_id": int(shard_id),
            "df": enc["df"], "global_df": 0, "first_doc": enc["first_doc"],
            "last_doc": int(enc["block_last_doc"][-1]) if enc["block_last_doc"] else 0,
            "doc_gaps": enc["doc_gaps"], "tfs": enc["tfs"], "dls": enc["dls"],
            "block_last_doc": enc["block_last_doc"],
            "block_max_tf_norm": enc["block_max_tf_norm"],
            "max_tf_norm": enc["max_tf_norm"],
        }])

    segments = (with_shard.groupBy("term", "shard_id")
                .applyInPandas(encode_group, PACKED_SCHEMA))
    return with_global_df(segments)


def with_global_df(segments: DataFrame) -> DataFrame:
    """(Re)compute each term's total df and ride it with every segment (the
    idf input at query time, so a query is one job) — computed over the tiny
    segments table, not the posting rows. Also the repair step after an
    incremental append changes term totals."""
    totals = segments.groupBy("term").agg(
        F.sum("df").cast("long").alias("_gdf"))
    return (segments.drop("global_df").join(totals, "term")
            .withColumnRenamed("_gdf", "global_df")
            .select(*[f.name for f in PACKED_SCHEMA.fields]))


def merge_packed(packed: DataFrame, level_factor: int = 8) -> DataFrame:
    """One hierarchical merge level: coalesce up to ``level_factor`` adjacent
    doc-shards of each term into one segment via gap-stream splicing.

    new shard_id = old shard_id DIV level_factor. Exactly reproduces what a
    full re-encode would produce (gaps are identical by construction); block
    metadata concatenates unchanged — block boundaries simply stay where the
    original runs put them.
    """

    def merge_group(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        term, new_shard = key
        # first_doc tiebreak: an incremental append can put TWO segments in
        # the same (term, shard) — old and new doc ranges are disjoint, so
        # first_doc orders the splice correctly
        pdf = pdf.sort_values(["shard_id", "first_doc"])
        rows = pdf.to_dict("records")
        acc = rows[0]
        out_gaps = bytes(acc["doc_gaps"])
        tfs = bytearray(bytes(acc["tfs"]))
        dls = bytearray(bytes(acc["dls"]))
        block_last = list(acc["block_last_doc"])
        block_max = list(acc["block_max_tf_norm"])
        df = int(acc["df"])
        last_doc = int(acc["last_doc"])
        max_norm = float(acc["max_tf_norm"])
        for r in rows[1:]:
            out_gaps = splice_gap_streams(0, out_gaps, last_doc,
                                          int(r["first_doc"]), bytes(r["doc_gaps"]))
            tfs += bytes(r["tfs"])
            dls += bytes(r["dls"])
            block_last += list(r["block_last_doc"])
            block_max += list(r["block_max_tf_norm"])
            df += int(r["df"])
            last_doc = int(r["last_doc"])
            max_norm = max(max_norm, float(r["max_tf_norm"]))
        return pd.DataFrame([{
            "term": term, "shard_id": int(new_shard), "df": df,
            "global_df": int(rows[0]["global_df"]),
            "first_doc": int(rows[0]["first_doc"]), "last_doc": last_doc,
            "doc_gaps": out_gaps, "tfs": bytes(tfs), "dls": bytes(dls),
            "block_last_doc": block_last, "block_max_tf_norm": block_max,
            "max_tf_norm": max_norm,
        }])

    def merge_group_typed(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return merge_group(key, pdf.drop(columns=["_new_shard"]))

    lv = packed.withColumn("_new_shard",
                           (F.col("shard_id") / F.lit(level_factor)).cast("int"))
    return (lv.groupBy("term", "_new_shard")
            .applyInPandas(merge_group_typed, PACKED_SCHEMA))


def append_packed(old_packed: DataFrame, new_term_doc_tf: DataFrame,
                  avgdl: float,
                  shard_span: int = DEFAULT_SHARD_SPAN) -> DataFrame:
    """Incremental index append: fold NEW docs' postings into an existing
    packed index without re-encoding the old segments.

    Requires append-only doc identity: every new doc_id exceeds every old
    doc_id (the stable-docID discipline gives this for appended
    conversations, which sort after existing ones). New postings are
    encoded into segments with the same shard_span; the union is then run
    through a level_factor=1 merge, which is an identity for untouched
    shards and a byte splice for the one boundary shard where old and new
    doc ranges meet; term totals (the idf input) are recomputed over the
    segment table. Posting bytes are identical to a full rebuild (gaps
    depend only on docIDs/tfs/dls); only the advisory block-max metadata
    reflects encode-time avgdl, which the query path no longer relies on
    (wand.py derives exact bounds from decoded norms).
    """
    new_seg = build_packed_postings(new_term_doc_tf, avgdl,
                                    shard_span=shard_span)
    cols = [f.name for f in PACKED_SCHEMA.fields]
    unioned = old_packed.select(*cols).unionByName(new_seg.select(*cols))
    # Only the single boundary shard (where old and new doc ranges meet) can
    # hold duplicate (term, shard) segments — splice just that shard and
    # pass every other segment through untouched, so an append costs
    # O(new data + one shard), not a rewrite of the whole index.
    bshard = old_packed.agg(F.max("shard_id")).collect()[0][0]
    if bshard is None:  # appending to an empty index
        return with_global_df(new_seg)
    untouched = unioned.where(F.col("shard_id") != F.lit(bshard))
    spliced = merge_packed(unioned.where(F.col("shard_id") == F.lit(bshard)),
                           level_factor=1)
    return with_global_df(untouched.unionByName(spliced))


def unpack_to_rows(packed: DataFrame) -> DataFrame:
    """Inverse of build_packed_postings (for tests/round-trips):
    packed segments -> (term, doc_id, tf, dl) rows."""

    def unpack(batches):
        for pdf in batches:
            outs = []
            for r in pdf.itertuples(index=False):
                dec = decode_postings(bytes(r.doc_gaps), bytes(r.tfs), bytes(r.dls))
                outs.append(pd.DataFrame({
                    "term": r.term,
                    "doc_id": dec.doc_ids,
                    "tf": dec.tfs,
                    "dl": dec.dls,
                }))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    schema = T.StructType([
        T.StructField("term", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("tf", T.LongType()),
        T.StructField("dl", T.LongType()),
    ])
    return packed.mapInPandas(unpack, schema)
