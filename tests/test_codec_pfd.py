"""PForDelta codec: roundtrip exactness, size behavior, Spark segments."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mini_distributed_search_engine_spark.index.codec import varint_encode
from mini_distributed_search_engine_spark.index.codec_pfd import (
    PFD_BLOCK, build_packed_postings_pfd, pfd_decode, pfd_encode,
    unpack_packed_pfd)


def _rt(v: np.ndarray) -> None:
    dec = pfd_decode(pfd_encode(v))
    assert dec.dtype == np.uint64
    np.testing.assert_array_equal(dec, v.astype(np.uint64))


def test_empty_and_degenerate():
    _rt(np.empty(0, dtype=np.uint64))
    _rt(np.zeros(1, dtype=np.uint64))
    _rt(np.zeros(PFD_BLOCK * 3, dtype=np.uint64))
    _rt(np.array([2**63 - 1], dtype=np.uint64))


@pytest.mark.parametrize("n", [1, 127, 128, 129, 255, 256, 1000])
def test_block_boundaries(n):
    rng = np.random.default_rng(n)
    _rt(rng.integers(0, 1 << 20, n).astype(np.uint64))


def test_exceptions_patch_wide_values():
    # mostly tiny values + a few >32-bit outliers: the packed width must
    # stay small (outliers ride the exception path), and decode must be exact
    v = np.ones(500, dtype=np.uint64)
    v[[3, 250, 499]] = [2**40, 2**55, 2**63 - 1]
    enc = pfd_encode(v)
    _rt(v)
    # 500 one-bit values + 3 exceptions must come in far under varint's
    # 1-byte-per-value floor
    assert len(enc) < len(varint_encode(v)) / 2


def test_smaller_than_varint_on_posting_shapes():
    rng = np.random.default_rng(0)
    gaps = rng.geometric(0.2, 100_000).astype(np.uint64)   # dense-term gaps
    tfs = np.minimum(rng.zipf(2.5, 100_000), 50).astype(np.uint64)
    for v in (gaps, tfs):
        assert len(pfd_encode(v)) < 0.7 * len(varint_encode(v))
        _rt(v)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=400))
def test_roundtrip_property(values):
    _rt(np.array(values, dtype=np.uint64))


def _seg_map(df):
    """(term, shard) -> hashable tuple of every other column (bytes/list
    normalized) — the byte-identity comparison for both archive tests."""
    return {(r["term"], r["shard_id"]):
            tuple(bytes(r[c]) if isinstance(r[c], (bytes, bytearray))
                  else (tuple(r[c]) if isinstance(r[c], list) else r[c])
                  for c in df.columns if c not in ("term", "shard_id"))
            for r in df.collect()}


def test_archive_restore_byte_identical(spark):
    """Archiving a serving index to PFD and restoring must reproduce every
    canonically-blocked segment byte-for-byte (blobs, block-max bounds,
    byte offsets) and every spliced segment logically."""
    from pyspark.sql import functions as F

    from mini_distributed_search_engine_spark.index.build import build_index
    from mini_distributed_search_engine_spark.index.codec_pfd import (
        archive_packed, restore_packed)
    from mini_distributed_search_engine_spark.index.packed import (
        build_packed_postings, merge_packed)
    from mini_distributed_search_engine_spark.sources.transcripts import (
        synthesize_transcripts_pdf)

    idx = build_index(spark.createDataFrame(
        synthesize_transcripts_pdf(50, seed=123)))
    avgdl = float(idx.doc_stats.collect()[0]["avgdl"])
    packed = build_packed_postings(idx.term_doc_tf, avgdl,
                                   shard_span=64).persist()

    archived = archive_packed(packed).persist()
    restored = restore_packed(archived)

    orig, back = _seg_map(packed), _seg_map(restored)
    assert orig.keys() == back.keys()
    assert orig == back  # byte-identical segments, metadata included

    def stream_bytes(df):
        return df.agg((F.sum(F.length("doc_gaps")) + F.sum(F.length("tfs"))
                       + F.sum(F.length("dls"))).alias("b")).collect()[0]["b"]

    # NOTE on size: at this toy scale (200 docs, shard_span=64) most
    # segments hold 1-5 postings, so PFD's fixed per-stream overhead
    # (4B header + 2B/block meta) outweighs the bit-packing win; the
    # at-scale comparison (0.53x on the sf0.1 index) lives in BENCH.md.
    assert stream_bytes(archived) > 0  # streams materialized

    # spliced (merged) segments don't record their source runs' block
    # boundaries: restore re-blocks canonically — logical identity here,
    # rank-identity in test_archive_restore_serves_rank_identical
    from mini_distributed_search_engine_spark.index.packed import (
        unpack_to_rows)
    merged = merge_packed(packed, level_factor=4)
    rows_orig = sorted(map(tuple, unpack_to_rows(merged).collect()))
    rows_back = sorted(map(tuple, unpack_to_rows(
        restore_packed(archive_packed(merged))).collect()))
    assert rows_orig == rows_back
    archived.unpersist()
    packed.unpersist()


def test_archive_restore_serves_rank_identical(spark):
    """WAND over a restored (archived merged) index must rank exactly like
    the original, block metadata differences notwithstanding."""
    from mini_distributed_search_engine_spark.index.build import build_index
    from mini_distributed_search_engine_spark.index.codec_pfd import (
        archive_packed, restore_packed)
    from mini_distributed_search_engine_spark.index.packed import (
        build_packed_postings, merge_packed)
    from mini_distributed_search_engine_spark.query.bm25 import Query
    from mini_distributed_search_engine_spark.query.wand import wand_topk
    from mini_distributed_search_engine_spark.sources.transcripts import (
        synthesize_transcripts_pdf)

    idx = build_index(spark.createDataFrame(
        synthesize_transcripts_pdf(50, seed=123)))
    avgdl = float(idx.doc_stats.collect()[0]["avgdl"])
    merged = merge_packed(
        build_packed_postings(idx.term_doc_tf, avgdl, shard_span=64),
        level_factor=4)
    restored = restore_packed(archive_packed(merged))
    qs = (Query("a1", "apple banana", k=20), Query("a2", "running", k=20))
    stats = idx.doc_stats.collect()[0]
    cs = (int(stats["n_docs"]), float(stats["avgdl"]))
    a = [tuple(r) for r in wand_topk(spark, merged, idx.doc_stats,
                                     queries=qs, corpus_stats=cs).collect()]
    b = [tuple(r) for r in wand_topk(spark, restored, idx.doc_stats,
                                     queries=qs, corpus_stats=cs).collect()]
    assert sorted(a) == sorted(b) and len(a) > 0


def test_archive_refuses_wrong_tier_or_kind(spark):
    """Tier/kind mix-ups must fail fast: both decoders happily chew
    arbitrary bytes, so archiving an archive (or restoring a hot index,
    or crossing TF/positions) would otherwise write silently-corrupt
    output into the tier whose whole point is replacing the hot copy."""
    from mini_distributed_search_engine_spark.index.build import build_index
    from mini_distributed_search_engine_spark.index.codec_pfd import (
        archive_packed, archive_positions, restore_packed,
        restore_positions)
    from mini_distributed_search_engine_spark.index.packed import (
        build_packed_postings)
    from mini_distributed_search_engine_spark.sources.transcripts import (
        synthesize_transcripts_pdf)

    idx = build_index(spark.createDataFrame(
        synthesize_transcripts_pdf(10, seed=7)))
    avgdl = float(idx.doc_stats.collect()[0]["avgdl"])
    hot = build_packed_postings(idx.term_doc_tf, avgdl, shard_span=64)
    cold = archive_packed(hot)

    with pytest.raises(ValueError, match="archive_packed"):
        archive_packed(cold)           # double-archive
    with pytest.raises(ValueError, match="restore_packed"):
        restore_packed(hot)            # restore a hot index
    with pytest.raises(ValueError, match="archive_positions"):
        archive_positions(hot)         # TF index through the positions path
    with pytest.raises(ValueError, match="restore_positions"):
        restore_positions(cold)        # TF archive through the positions path


def test_archive_of_streaming_root(spark, tmp_path):
    """A STREAM-built index (manifest union, spliced boundary shards —
    the maximally non-canonical layout) must archive and restore to the
    same postings and identical WAND ranks."""
    from pathlib import Path

    from mini_distributed_search_engine_spark.index.codec_pfd import (
        archive_packed, restore_packed)
    from mini_distributed_search_engine_spark.index.packed import (
        unpack_to_rows)
    from mini_distributed_search_engine_spark.query.bm25 import Query
    from mini_distributed_search_engine_spark.query.wand import wand_topk
    from mini_distributed_search_engine_spark.sources.transcripts import (
        synthesize_transcripts_pdf)
    from mini_distributed_search_engine_spark.streaming.indexing import (
        StreamingIndexer, read_transcript_stream)

    pdf = synthesize_transcripts_pdf(30, seed=321)  # 120 turns
    src = Path(tmp_path) / "in"
    src.mkdir()
    for i, (lo, hi) in enumerate([(0, 60), (60, 120)]):
        spark.createDataFrame(pdf.iloc[lo:hi]).coalesce(1).write.parquet(
            str(src / f"part{i}.parquet"))
    indexer = StreamingIndexer(spark, str(Path(tmp_path) / "idx"),
                               shard_span=64)
    indexer.start(read_transcript_stream(spark, str(src))).awaitTermination(120)

    live = indexer.packed()
    restored = restore_packed(archive_packed(live))
    rows = lambda df: sorted(tuple(r) for r in df.collect())
    assert rows(unpack_to_rows(live)) == rows(unpack_to_rows(restored))
    qs = (Query("s1", "apple banana", k=30),)
    a = rows(wand_topk(spark, live, indexer.doc_stats_df(), queries=qs))
    b = rows(wand_topk(spark, restored, indexer.doc_stats_df(), queries=qs))
    assert a == b and len(a) > 0


def test_positions_archive_restore(spark):
    """Positional cold tier: archive -> restore is byte-identical for a
    fresh packed positional index, and phrase over a restored MERGED one
    (canonically re-blocked) is rank-identical to the original."""
    from mini_distributed_search_engine_spark.functions.analyzer import (
        term_positions_pandas)
    from mini_distributed_search_engine_spark.index.build import (
        with_stable_doc_ids)
    from mini_distributed_search_engine_spark.index.codec_pfd import (
        archive_positions, restore_positions)
    from mini_distributed_search_engine_spark.index.positions import (
        build_packed_positions, merge_packed_positions)
    from mini_distributed_search_engine_spark.query.bm25 import Query
    from mini_distributed_search_engine_spark.query.phrase import (
        phrase_match_packed)
    from mini_distributed_search_engine_spark.sources.transcripts import (
        synthesize_transcripts_pdf)

    docs = with_stable_doc_ids(spark.createDataFrame(
        synthesize_transcripts_pdf(50, seed=123)))
    pos = term_positions_pandas(docs, "text", stem=True)
    packed = build_packed_positions(pos, shard_span=64).persist()

    restored = restore_positions(archive_positions(packed))
    assert _seg_map(packed) == _seg_map(restored)  # byte-identical

    merged = merge_packed_positions(packed, level_factor=4)
    restored_m = restore_positions(archive_positions(merged))
    qs = (Query("f1", "apple banana", k=200), Query("f3", "apple apple", k=200))
    a = sorted(map(tuple, phrase_match_packed(
        spark, merged, queries=qs).collect()))
    b = sorted(map(tuple, phrase_match_packed(
        spark, restored_m, queries=qs).collect()))
    assert a == b and len(a) > 0
    packed.unpersist()


def test_spark_segment_roundtrip(spark):
    """PFD segments decode back to the exact (term, doc_id, tf, dl) rows."""
    from mini_distributed_search_engine_spark.index.build import build_index
    from mini_distributed_search_engine_spark.sources.transcripts import (
        synthesize_transcripts_pdf)
    idx = build_index(spark.createDataFrame(
        synthesize_transcripts_pdf(40, seed=99)))
    tf_dl = idx.term_doc_tf.select("term", "doc_id", "tf", "dl")
    packed = build_packed_postings_pfd(tf_dl, shard_span=64)
    back = unpack_packed_pfd(packed)
    a = sorted(map(tuple, tf_dl.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
