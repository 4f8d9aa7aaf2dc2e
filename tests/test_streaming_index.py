"""Streaming index ingestion parity: draining a transcript file stream
through the foreachBatch incremental-append sink must produce the same
postings and the same query results as a one-shot batch build over the
concatenated input."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from mini_distributed_search_engine_spark.index.build import build_index
from mini_distributed_search_engine_spark.index.packed import (
    build_packed_postings, unpack_to_rows)
from mini_distributed_search_engine_spark.query.bm25 import Query
from mini_distributed_search_engine_spark.query.wand import wand_topk
from mini_distributed_search_engine_spark.sources.transcripts import (
    synthesize_transcripts_pdf)
from mini_distributed_search_engine_spark.streaming.indexing import (
    StreamingIndexer, read_transcript_stream)

SPAN = 64
QUERIES = (Query("s1", "apple banana", k=30),
           Query("s2", "spark shuffle partition", k=30))


@pytest.fixture(scope="module")
def stream_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_idx")
    yield root
    shutil.rmtree(root, ignore_errors=True)


def test_stream_ingest_matches_batch_build(spark, stream_root):
    pdf = synthesize_transcripts_pdf(45, seed=888)  # 180 turns
    # three files, split on conv boundaries, in conv order (append-only);
    # maxFilesPerTrigger=1 -> three micro-batches
    src = Path(stream_root) / "in"
    src.mkdir()
    cuts = [(0, 60), (60, 120), (120, 180)]
    for i, (lo, hi) in enumerate(cuts):
        spark.createDataFrame(pdf.iloc[lo:hi]).coalesce(1).write.parquet(
            str(src / f"part{i}.parquet"))

    idx_root = Path(stream_root) / "idx"
    indexer = StreamingIndexer(spark, str(idx_root), shard_span=SPAN)
    q = indexer.start(read_transcript_stream(spark, str(src)))
    q.awaitTermination(120)

    meta = indexer._meta()
    assert meta["n_docs"] == 180 and meta["generation"] == 3

    # batch reference build over the same rows
    idx = build_index(spark.createDataFrame(pdf))
    avgdl = float(idx.doc_stats.collect()[0]["avgdl"])
    batch_packed = build_packed_postings(idx.term_doc_tf, avgdl,
                                         shard_span=SPAN)

    rows = lambda df: sorted(tuple(r) for r in df.collect())
    assert rows(unpack_to_rows(indexer.packed())) == \
        rows(unpack_to_rows(batch_packed))

    n, stream_avgdl = indexer.corpus_stats()
    assert n == 180 and stream_avgdl == pytest.approx(avgdl, rel=1e-12)

    a = rows(wand_topk(spark, indexer.packed(), indexer.doc_stats_df(),
                       queries=QUERIES))
    b = rows(wand_topk(spark, batch_packed, idx.doc_stats, queries=QUERIES))
    assert a == b and len(a) > 0


def test_stream_restart_is_idempotent(spark, stream_root):
    """Re-running start() over the drained source must not re-append."""
    idx_root = Path(stream_root) / "idx"
    indexer = StreamingIndexer(spark, str(idx_root), shard_span=SPAN)
    before = indexer._meta()
    q = indexer.start(read_transcript_stream(
        spark, str(Path(stream_root) / "in")))
    q.awaitTermination(120)
    after = indexer._meta()
    assert after["n_docs"] == before["n_docs"]
    assert after["generation"] == before["generation"]


def test_compact_with_tombstones_purges_and_fixes_stats(spark, stream_root):
    """compact(tombstones=...) — the purge half of the LSM delete
    lifecycle: postings vanish, totals rebuild, corpus stats shrink by
    exactly the deleted docs' (count, dl). Runs last: it rewrites the
    shared module root."""
    import collections

    idx_root = Path(stream_root) / "idx"
    indexer = StreamingIndexer(spark, str(idx_root), shard_span=SPAN)
    rows = lambda df: sorted(tuple(r) for r in df.collect())
    before = rows(unpack_to_rows(indexer.packed()))
    n0, avgdl0 = indexer.corpus_stats()
    tomb = [0, 5, 64]  # two docs in shard 0, one in shard 1
    dl_by_doc = {r[1]: r[3] for r in before}
    assert all(t in dl_by_doc for t in tomb), "fixture docs must exist"

    res = indexer.compact(tombstones=tomb)
    assert res["compacted"] and res["purged_docs"] == len(tomb)

    after = rows(unpack_to_rows(indexer.packed()))
    assert after == [r for r in before if r[1] not in set(tomb)]

    n1, avgdl1 = indexer.corpus_stats()
    assert n1 == n0 - len(tomb)
    want_sum = round(n0 * avgdl0) - sum(dl_by_doc[t] for t in tomb)
    assert avgdl1 == pytest.approx(want_sum / n1, rel=1e-12)

    # totals (the idf input) equal the surviving per-term posting counts
    cnt = collections.Counter(r[0] for r in after)
    gdf = {r["term"]: r["global_df"] for r in
           indexer.packed().select("term", "global_df").distinct().collect()}
    assert gdf == dict(cnt)

    # re-compacting with the same tombstones finds nothing left to purge
    # and SKIPS the O(index) rewrite (single-entry manifest, zero hits)
    res2 = indexer.compact(tombstones=tomb)
    assert res2 == {"compacted": False, "entries": 1, "purged_docs": 0}
    assert rows(unpack_to_rows(indexer.packed())) == after

    # id space stays monotone across the purge: the recorded high-water
    # mark must be the pre-purge doc count, not the shrunken live count
    assert int(indexer._meta()["next_doc_id"]) == n0

    # append AFTER the purge: new docIDs must continue from the monotone
    # high-water mark, never reusing a purged or live id (reuse would
    # interleave posting runs — the boundary splice fails loudly — or
    # resurrect engine-side tombstones recorded against the old id)
    import datetime
    late = spark.createDataFrame(
        [("convzzz00", i, "user", "apple banana quarantine epilogue",
          "search", datetime.datetime(2024, 6, 1, 0, 0, i))
         for i in range(4)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    late.coalesce(1).write.parquet(
        str(Path(stream_root) / "in" / "part_late.parquet"))
    q = indexer.start(read_transcript_stream(
        spark, str(Path(stream_root) / "in")))
    q.awaitTermination(120)
    meta = indexer._meta()
    assert int(meta["next_doc_id"]) == n0 + 4
    assert int(meta["n_docs"]) == n1 + 4
    appended = rows(unpack_to_rows(indexer.packed()))
    new_ids = {r[1] for r in appended} - {r[1] for r in after}
    assert new_ids == {n0, n0 + 1, n0 + 2, n0 + 3}


def test_stream_with_positions_matches_batch(spark, tmp_path):
    """with_positions=True maintains the packed positional index beside
    the TF segments: after draining the stream, positions_packed()
    unpacks to exactly the batch-built positional rows, serves phrase /
    span / proximity, and survives a tombstone compaction."""
    from pyspark.sql import functions as F

    from mini_distributed_search_engine_spark.functions.analyzer import (
        term_positions_pandas)
    from mini_distributed_search_engine_spark.index.build import (
        with_stable_doc_ids)
    from mini_distributed_search_engine_spark.index.positions import (
        unpack_positions)
    from mini_distributed_search_engine_spark.query.phrase import (
        phrase_match_packed)
    from mini_distributed_search_engine_spark.query.proximity import (
        wand_topk_proximity, bm25_topk_proximity)
    from mini_distributed_search_engine_spark.query.span import (
        span_near_match)

    pdf = synthesize_transcripts_pdf(45, seed=888)
    src = tmp_path / "in"
    src.mkdir()
    for i, (lo, hi) in enumerate([(0, 60), (60, 120), (120, 180)]):
        spark.createDataFrame(pdf.iloc[lo:hi]).coalesce(1).write.parquet(
            str(src / f"part{i}.parquet"))
    idx_root = tmp_path / "idx"
    indexer = StreamingIndexer(spark, str(idx_root), shard_span=SPAN,
                               with_positions=True)
    q = indexer.start(read_transcript_stream(spark, str(src)))
    q.awaitTermination(120)

    docs = with_stable_doc_ids(spark.createDataFrame(pdf))
    pos_rows = term_positions_pandas(docs, "text", stem=True).cache()
    want = sorted((r["doc_id"], r["term"], r["pos"])
                  for r in pos_rows.collect())
    got = sorted((r["doc_id"], r["term"], r["pos"])
                 for r in unpack_positions(
                     indexer.positions_packed()).collect())
    assert got == want

    # proximity over the streamed pair == declarative over batch rows
    idx = build_index(spark.createDataFrame(pdf))
    keyed = lambda df: sorted((r["query_id"], r["rank"], r["doc_id"])
                              for r in df.collect())
    assert keyed(wand_topk_proximity(
        spark, indexer.packed(), indexer.positions_packed(),
        indexer.doc_stats_df(), queries=QUERIES)) == keyed(
            bm25_topk_proximity(spark, idx.term_doc_tf, idx.term_stats,
                                idx.doc_stats, pos_rows, queries=QUERIES))
    n_phrase = len(phrase_match_packed(
        spark, indexer.positions_packed(),
        (Query("p", "apple banana", k=50),)).collect())

    # tombstone compaction purges both sides coherently
    tomb = [5, 70, 71, 130]
    rep = indexer.compact(tombstones=tomb)
    assert rep["compacted"] and rep["purged_docs"] > 0
    got2 = sorted((r["doc_id"], r["term"], r["pos"])
                  for r in unpack_positions(
                      indexer.positions_packed()).collect())
    want2 = sorted((r["doc_id"], r["term"], r["pos"]) for r in
                   pos_rows.where(~F.col("doc_id").isin(tomb)).collect())
    assert got2 == want2
    assert len(indexer._manifest(indexer._meta())) == 1
    # span still serves post-compaction
    res = span_near_match(spark, indexer.positions_packed(),
                          (Query("n", "apple banana", k=50),),
                          window=10_000).collect()
    assert all(r["doc_id"] not in set(tomb) for r in res)
    assert n_phrase >= 0  # phrase path exercised pre-compaction
    pos_rows.unpersist()


def test_stream_positions_flag_mismatch_raises(spark, tmp_path):
    """Enabling with_positions on a root whose manifest lacks positions
    must fail loudly, not silently serve a partial positional index."""
    pdf = synthesize_transcripts_pdf(10, seed=4)
    src = tmp_path / "in"
    src.mkdir()
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        str(src / "part0.parquet"))
    idx_root = tmp_path / "idx"
    indexer = StreamingIndexer(spark, str(idx_root), shard_span=SPAN)
    q = indexer.start(read_transcript_stream(spark, str(src)))
    q.awaitTermination(120)
    with pytest.raises(ValueError, match="pos_path"):
        indexer.positions_packed()
    spark.createDataFrame(pdf.assign(conv_id=pdf["conv_id"] + "zz")) \
        .coalesce(1).write.parquet(str(src / "part1.parquet"))
    indexer2 = StreamingIndexer(spark, str(idx_root), shard_span=SPAN,
                                with_positions=True)
    q2 = indexer2.start(read_transcript_stream(spark, str(src)))
    # the guard surfaces as a failed batch -> streaming query exception
    with pytest.raises(Exception, match="without positions"):
        q2.awaitTermination()


def test_stream_positions_survive_flagless_reopen(spark, tmp_path):
    """Positions are a ROOT property: a later writer that forgets
    with_positions=True must keep maintaining (not GC) the positional
    side — the silent-data-loss case from the round-5 review."""
    from mini_distributed_search_engine_spark.index.positions import (
        unpack_positions)
    pdf = synthesize_transcripts_pdf(20, seed=77)
    src = tmp_path / "in"
    src.mkdir()
    spark.createDataFrame(pdf.iloc[:40]).coalesce(1).write.parquet(
        str(src / "part0.parquet"))
    idx_root = tmp_path / "idx"
    first = StreamingIndexer(spark, str(idx_root), shard_span=SPAN,
                             with_positions=True)
    q = first.start(read_transcript_stream(spark, str(src)))
    q.awaitTermination(120)
    # second writer, flag FORGOTTEN (default False), appends more data
    spark.createDataFrame(pdf.iloc[40:].assign(
        conv_id=pdf.iloc[40:]["conv_id"] + "zz")).coalesce(1) \
        .write.parquet(str(src / "part1.parquet"))
    second = StreamingIndexer(spark, str(idx_root), shard_span=SPAN)
    q2 = second.start(read_transcript_stream(spark, str(src)))
    q2.awaitTermination(120)
    man = second._manifest(second._meta())
    assert all("pos_path" in e for e in man)   # adopted, not dropped
    # the positional index covers BOTH writers' docs
    n_docs_with_pos = (unpack_positions(second.positions_packed())
                       .select("doc_id").distinct().count())
    assert n_docs_with_pos == second._meta()["n_docs"]
