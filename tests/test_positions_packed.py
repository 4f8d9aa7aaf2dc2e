"""Packed positional index: roundtrip identity to the row layout, and the
phrase / proximity kernels served from it must be rank-identical to the
declarative row paths — across shard spans, co-sharded layouts (merged TF
levels), and query-time tombstones."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_distributed_search_engine_spark.functions.analyzer import (
    term_positions_pandas)
from mini_distributed_search_engine_spark.index.build import (
    build_index, with_stable_doc_ids)
from mini_distributed_search_engine_spark.index.packed import (
    build_packed_postings, merge_packed)
from mini_distributed_search_engine_spark.index.positions import (
    build_packed_positions, unpack_positions)
from mini_distributed_search_engine_spark.query.bm25 import Query
from mini_distributed_search_engine_spark.query.phrase import (
    phrase_match, phrase_match_packed)
from mini_distributed_search_engine_spark.query.proximity import (
    bm25_topk_proximity, wand_topk_proximity)
from mini_distributed_search_engine_spark.query.wand import (
    compute_shard_bounds)
from mini_distributed_search_engine_spark.sources.transcripts import (
    synthesize_transcripts_pdf)

PHRASE_QUERIES = (
    Query("f1", "apple banana", k=200),
    Query("f2", "the apple", k=200),
    Query("f3", "apple apple", k=200),         # repeated-term phrase
    Query("f4", "spark shuffle partition", k=200),
    Query("f5", "apple zzzznotaterm", k=200),  # absent term -> no matches
    Query("f6", "running", k=200),             # single term: n_occ == tf
)

PROX_QUERIES = (
    Query("w1", "apple banana fig"),
    Query("w2", "spark"),
    Query("w3", "relational conditional adjustment activate", k=30),
    Query("w4", "zzznope"),
    Query("w5", "search engine index query", k=5),
    Query("w6", "user assistant"),             # hot terms under skew
)


@pytest.fixture(scope="module")
def built(spark):
    pdf = synthesize_transcripts_pdf(80, seed=99, hot_token_frac=0.3)
    docs = with_stable_doc_ids(spark.createDataFrame(pdf))
    idx = build_index(docs)
    avgdl = idx.doc_stats.collect()[0]["avgdl"]
    pos = term_positions_pandas(docs, "text", stem=True).cache()
    pos.count()
    return idx, avgdl, pos


def _key_rows(df, cols=("query_id", "rank", "doc_id")):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("shard_span", [64, 10_000])
def test_positions_roundtrip(spark, built, shard_span):
    _, _, pos = built
    packed = build_packed_positions(pos, shard_span=shard_span)
    want = sorted((r["doc_id"], r["term"], r["pos"]) for r in pos.collect())
    got = sorted((r["doc_id"], r["term"], r["pos"])
                 for r in unpack_positions(packed).collect())
    assert got == want
    # every segment's doc range stays inside its shard
    for r in packed.select("shard_id", "first_doc", "last_doc").collect():
        assert r["first_doc"] // shard_span == r["shard_id"]
        assert r["last_doc"] // shard_span == r["shard_id"]


def test_positions_roundtrip_bounded_shards(spark, built):
    """shard_bounds assignment (co-sharding with an existing TF layout)
    preserves the rows and lands every doc in its range-assigned shard."""
    idx, avgdl, pos = built
    tf_packed = merge_packed(
        build_packed_postings(idx.term_doc_tf, avgdl, shard_span=64),
        level_factor=4)
    bounds = compute_shard_bounds(tf_packed)
    packed = build_packed_positions(pos, shard_bounds=bounds)
    want = sorted((r["doc_id"], r["term"], r["pos"]) for r in pos.collect())
    got = sorted((r["doc_id"], r["term"], r["pos"])
                 for r in unpack_positions(packed).collect())
    assert got == want
    assert ({r["shard_id"] for r in packed.select("shard_id").collect()}
            <= {s for _, s in bounds})


@pytest.mark.parametrize("shard_span", [64, 10_000])
def test_phrase_packed_rank_identity(spark, built, shard_span):
    _, _, pos = built
    packed = build_packed_positions(pos, shard_span=shard_span)
    want = _key_rows(phrase_match(spark, pos, PHRASE_QUERIES),
                     ("query_id", "rank", "doc_id", "n_occ"))
    got = _key_rows(phrase_match_packed(spark, packed, PHRASE_QUERIES),
                    ("query_id", "rank", "doc_id", "n_occ"))
    assert got == want


def test_phrase_packed_tombstoned(spark, built):
    """blocked_ids inside the packed phrase kernel == filtering the row
    positions table before the declarative match."""
    _, _, pos = built
    tomb = [r["doc_id"] for r in
            pos.select("doc_id").distinct().limit(7).collect()]
    packed = build_packed_positions(pos, shard_span=64)
    want = _key_rows(phrase_match(
        spark, pos.where(~F.col("doc_id").isin(tomb)), PHRASE_QUERIES),
        ("query_id", "rank", "doc_id", "n_occ"))
    got = _key_rows(phrase_match_packed(spark, packed, PHRASE_QUERIES,
                                        blocked_ids=tomb),
                    ("query_id", "rank", "doc_id", "n_occ"))
    assert got == want


@pytest.mark.parametrize("shard_span", [64, 10_000])
def test_proximity_packed_rank_identity(spark, built, shard_span):
    idx, avgdl, pos = built
    tf_packed = build_packed_postings(idx.term_doc_tf, avgdl,
                                      shard_span=shard_span)
    pos_packed = build_packed_positions(pos, shard_span=shard_span)
    want = _key_rows(bm25_topk_proximity(
        spark, idx.term_doc_tf, idx.term_stats, idx.doc_stats, pos,
        queries=PROX_QUERIES))
    got = _key_rows(wand_topk_proximity(
        spark, tf_packed, pos_packed, idx.doc_stats, queries=PROX_QUERIES))
    assert got == want
    got_drv = _key_rows(wand_topk_proximity(
        spark, tf_packed, pos_packed, idx.doc_stats, queries=PROX_QUERIES,
        final_rank="driver"))
    assert got_drv == want


def test_proximity_packed_cosharded_merged(spark, built):
    """Positions co-sharded (via shard_bounds) with a MERGED TF layout:
    the cogroup sees aligned shards and stays rank-identical."""
    idx, avgdl, pos = built
    tf_packed = merge_packed(
        build_packed_postings(idx.term_doc_tf, avgdl, shard_span=64),
        level_factor=4)
    pos_packed = build_packed_positions(
        pos, shard_bounds=compute_shard_bounds(tf_packed))
    want = _key_rows(bm25_topk_proximity(
        spark, idx.term_doc_tf, idx.term_stats, idx.doc_stats, pos,
        queries=PROX_QUERIES))
    got = _key_rows(wand_topk_proximity(
        spark, tf_packed, pos_packed, idx.doc_stats, queries=PROX_QUERIES))
    assert got == want


def test_proximity_packed_tombstoned(spark, built):
    """blocked_ids in the proximity kernel == declarative proximity over
    tombstone-filtered tf/positions with GLOBAL corpus stats."""
    idx, avgdl, pos = built
    stats = idx.doc_stats.collect()[0]
    corpus_stats = (int(stats["n_docs"]), float(stats["avgdl"]))
    tomb = [d for d in range(0, 200, 13)]
    tf_packed = build_packed_postings(idx.term_doc_tf, avgdl, shard_span=64)
    pos_packed = build_packed_positions(pos, shard_span=64)
    want = _key_rows(bm25_topk_proximity(
        spark, idx.term_doc_tf.where(~F.col("doc_id").isin(tomb)),
        idx.term_stats, idx.doc_stats,
        pos.where(~F.col("doc_id").isin(tomb)),
        queries=PROX_QUERIES, corpus_stats=corpus_stats))
    got = _key_rows(wand_topk_proximity(
        spark, tf_packed, pos_packed, idx.doc_stats, queries=PROX_QUERIES,
        blocked_ids=tomb))
    assert got == want


def test_proximity_cosharding_guard(spark, built):
    """A positional table packed with a DIFFERENT shard span must fail
    loudly inside the kernel, not silently score every bonus as 0."""
    idx, avgdl, pos = built
    tf_packed = build_packed_postings(idx.term_doc_tf, avgdl, shard_span=64)
    pos_misaligned = build_packed_positions(pos, shard_span=10_000)
    with pytest.raises(Exception, match="co-sharded"):
        wand_topk_proximity(spark, tf_packed, pos_misaligned,
                            idx.doc_stats, queries=PROX_QUERIES).collect()


def test_redact_pii_zero_padded_ip(spark):
    """Zero-padded quads (syslog/firewall exports) still redact; octet
    overflow ('1.2.3.400') stays untouched."""
    from mini_distributed_search_engine_spark.functions.textstats import (
        redact_pii)
    docs = spark.createDataFrame(
        [(0, "src 192.168.001.007 dropped"),
         (1, "at 010.001.001.007 end"),
         (2, "semver 1.2.3.400 is fine"),
         (3, "plain 10.1.1.7 here")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert "[IPV4]" in rows[0]["text_redacted"] and rows[0]["n_ipv4"] == 1
    assert "[IPV4]" in rows[1]["text_redacted"] and rows[1]["n_ipv4"] == 1
    assert rows[2]["text_redacted"] == "semver 1.2.3.400 is fine"
    assert rows[2]["n_ipv4"] == 0
    assert "[IPV4]" in rows[3]["text_redacted"]


def test_positions_merge_levels(spark, built):
    """Hierarchical positional merges: byte-splice levels reproduce the
    rows exactly and the phrase kernel stays rank-identical."""
    from mini_distributed_search_engine_spark.index.positions import (
        merge_packed_positions)
    _, _, pos = built
    packed = build_packed_positions(pos, shard_span=64)
    merged = merge_packed_positions(
        merge_packed_positions(packed, level_factor=4), level_factor=4)
    want = sorted((r["doc_id"], r["term"], r["pos"]) for r in pos.collect())
    got = sorted((r["doc_id"], r["term"], r["pos"])
                 for r in unpack_positions(merged).collect())
    assert got == want
    assert merged.count() < packed.count()
    base = _key_rows(phrase_match_packed(spark, packed, PHRASE_QUERIES),
                     ("query_id", "rank", "doc_id", "n_occ"))
    lvl = _key_rows(phrase_match_packed(spark, merged, PHRASE_QUERIES),
                    ("query_id", "rank", "doc_id", "n_occ"))
    assert lvl == base


def test_positions_purge(spark, built):
    """purge_positions removes exactly the tombstoned docs' positions and
    leaves every non-intersecting segment byte-identical."""
    from mini_distributed_search_engine_spark.index.positions import (
        purge_positions)
    _, _, pos = built
    packed = build_packed_positions(pos, shard_span=64).cache()
    tomb = [3, 64, 65, 130]
    purged = purge_positions(packed, tomb)
    want = sorted((r["doc_id"], r["term"], r["pos"]) for r in
                  pos.where(~F.col("doc_id").isin(tomb)).collect())
    got = sorted((r["doc_id"], r["term"], r["pos"])
                 for r in unpack_positions(purged).collect())
    assert got == want
    # untouched segments (no tombstone in their PRE-purge range) pass
    # through byte-equal
    before = {(r["term"], r["shard_id"]):
              (bytes(r["pos_deltas"]), r["first_doc"], r["last_doc"])
              for r in packed.collect()}
    tomb_sorted = sorted(tomb)
    import bisect
    n_same = 0
    for r in purged.collect():
        blob, fd, ld = before[(r["term"], r["shard_id"])]
        if bisect.bisect_left(tomb_sorted, fd) == bisect.bisect_right(
                tomb_sorted, ld):
            assert bytes(r["pos_deltas"]) == blob
            n_same += 1
    assert n_same > 0
    # phrase over the purged pack == phrase over filtered rows
    a = _key_rows(phrase_match_packed(spark, purged, PHRASE_QUERIES),
                  ("query_id", "rank", "doc_id", "n_occ"))
    b = _key_rows(phrase_match(
        spark, pos.where(~F.col("doc_id").isin(tomb)), PHRASE_QUERIES),
        ("query_id", "rank", "doc_id", "n_occ"))
    assert a == b
    packed.unpersist()


def test_positions_append(spark, built):
    """Incremental positional append == full rebuild, byte-for-byte on
    the posting streams; old-range appends fail loudly."""
    from mini_distributed_search_engine_spark.index.positions import (
        append_packed_positions)
    _, _, pos = built
    cut = 150
    old = build_packed_positions(
        pos.where(F.col("doc_id") < cut), shard_span=64)
    appended = append_packed_positions(
        old, pos.where(F.col("doc_id") >= cut), shard_span=64)
    rebuilt = build_packed_positions(pos, shard_span=64)
    a = {(r["term"], r["shard_id"]):
         (bytes(r["doc_gaps"]), bytes(r["pos_counts"]),
          bytes(r["pos_deltas"]), r["df"], r["n_pos"])
         for r in appended.collect()}
    b = {(r["term"], r["shard_id"]):
         (bytes(r["doc_gaps"]), bytes(r["pos_counts"]),
          bytes(r["pos_deltas"]), r["df"], r["n_pos"])
         for r in rebuilt.collect()}
    assert a == b
    with pytest.raises(ValueError, match="append-only"):
        append_packed_positions(old, pos.where(F.col("doc_id") < 10),
                                shard_span=64)
