"""Incremental index append: building on 60% of the corpus then appending
the remaining 40% must equal a one-shot full build — identical posting rows
(byte-splice correctness incl. the boundary shard) and rank-identical query
results under the full-corpus stats."""

from __future__ import annotations

import pytest

from mini_distributed_search_engine_spark.index.build import build_index
from mini_distributed_search_engine_spark.index.packed import (
    append_packed, build_packed_postings, unpack_to_rows)
from mini_distributed_search_engine_spark.query.bm25 import Query
from mini_distributed_search_engine_spark.query.wand import wand_topk
from mini_distributed_search_engine_spark.sources.transcripts import (
    synthesize_transcripts_pdf)

SPAN = 64  # small shard span so the 240-doc corpus spans several shards

QUERIES = (
    Query("i1", "apple banana", k=30),
    Query("i2", "spark shuffle partition", k=30),
    Query("i3", "running", k=30),
)


@pytest.fixture(scope="module")
def built(spark):
    pdf = synthesize_transcripts_pdf(60, seed=555)  # 240 turns
    full = spark.createDataFrame(pdf)
    # split on conv boundary: appended convs sort after existing ones, so
    # their stable docIDs continue the old range (append-only discipline)
    cut = "conv00000036"
    old = full.where(full.conv_id < cut)
    new = full.where(full.conv_id >= cut)

    idx_full = build_index(full)
    avgdl = float(idx_full.doc_stats.collect()[0]["avgdl"])

    idx_old = build_index(old)
    # the appended docs' tf rows, with docIDs continuing after the old max
    # (build over FULL corpus gives the same ids; select the new ones)
    old_n = idx_old.docs.count()
    new_tf = idx_full.term_doc_tf.where(
        idx_full.term_doc_tf.doc_id >= old_n)
    old_packed = build_packed_postings(
        idx_old.term_doc_tf, avgdl, shard_span=SPAN)

    full_packed = build_packed_postings(
        idx_full.term_doc_tf, avgdl, shard_span=SPAN)
    inc_packed = append_packed(old_packed, new_tf, avgdl, shard_span=SPAN)
    return idx_full, full_packed, inc_packed


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_append_reproduces_full_postings(spark, built):
    _, full_packed, inc_packed = built
    assert _rows(unpack_to_rows(inc_packed)) == \
        _rows(unpack_to_rows(full_packed))
    # segment layout identical too: one segment per (term, shard), same df
    seg = lambda p: _rows(p.select("term", "shard_id", "df", "global_df",
                                   "first_doc", "last_doc"))
    assert seg(inc_packed) == seg(full_packed)


def test_append_boundary_shard_spliced_bytes(spark, built):
    _, full_packed, inc_packed = built
    full_b = {(r["term"], r["shard_id"]): (bytes(r["doc_gaps"]),
                                           bytes(r["tfs"]), bytes(r["dls"]))
              for r in full_packed.collect()}
    inc_b = {(r["term"], r["shard_id"]): (bytes(r["doc_gaps"]),
                                          bytes(r["tfs"]), bytes(r["dls"]))
             for r in inc_packed.collect()}
    assert inc_b == full_b  # posting BYTES identical, boundary shard included


def test_append_rank_identity(spark, built):
    idx_full, full_packed, inc_packed = built
    a = _rows(wand_topk(spark, full_packed, idx_full.doc_stats,
                        queries=QUERIES))
    b = _rows(wand_topk(spark, inc_packed, idx_full.doc_stats,
                        queries=QUERIES))
    assert a == b and len(a) > 0


def test_purge_docs_roundtrip_and_untouched_bytes(spark, built):
    from pyspark.sql import functions as F
    from mini_distributed_search_engine_spark.index.packed import purge_docs

    idx_full, full_packed, _ = built
    # tombstone a few docs from the FIRST shard only (< SPAN)
    tomb = [1, 7, 33]
    purged = purge_docs(full_packed, tomb)

    # 1) decoded postings == original minus the tombstoned docs
    want = _rows(idx_full.term_doc_tf
                 .where(~F.col("doc_id").isin(tomb))
                 .select("term", "doc_id", "tf", "dl"))
    got = _rows(unpack_to_rows(purged).select("term", "doc_id", "tf", "dl"))
    assert got == want

    # 2) global_df (idf input) re-counts the surviving postings
    gdf = {r["term"]: r["global_df"]
           for r in purged.select("term", "global_df").distinct().collect()}
    want_gdf = {r["term"]: r["n"] for r in
                idx_full.term_doc_tf.where(~F.col("doc_id").isin(tomb))
                .groupBy("term").agg(F.count("*").alias("n")).collect()}
    assert gdf == want_gdf

    # 3) segments in shards the tombstones never touch pass through
    #    byte-identical (shard 0 holds all tombstones at SPAN=64)
    orig = {(r["term"], r["shard_id"]): bytes(r["doc_gaps"])
            for r in full_packed.where("shard_id > 0").collect()}
    after = {(r["term"], r["shard_id"]): bytes(r["doc_gaps"])
             for r in purged.where("shard_id > 0").collect()}
    assert after == orig

    # 4) full-segment deletion branch: tombstoning every doc of shard 0
    #    removes all its segments (and their terms' postings) entirely
    wiped = purge_docs(full_packed, range(SPAN))
    assert wiped.where("shard_id = 0").count() == 0
    got0 = _rows(unpack_to_rows(wiped).select("term", "doc_id", "tf", "dl"))
    want0 = _rows(idx_full.term_doc_tf
                  .where(F.col("doc_id") >= SPAN)
                  .select("term", "doc_id", "tf", "dl"))
    assert got0 == want0
