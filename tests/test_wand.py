"""MaxScore/WAND over the packed index must be rank-identical to the
exhaustive DataFrame path, across shard spans, merge levels, and skew."""

from __future__ import annotations

import pytest

from mini_distributed_search_engine_spark.index.build import build_index
from mini_distributed_search_engine_spark.index.packed import (
    build_packed_postings, merge_packed, unpack_to_rows)
from mini_distributed_search_engine_spark.query.bm25 import Query, bm25_topk
from mini_distributed_search_engine_spark.query.wand import wand_topk
from mini_distributed_search_engine_spark.sources.transcripts import (
    synthesize_transcripts_pdf)

QUERIES = (
    Query("w1", "apple banana fig"),
    Query("w2", "spark"),
    Query("w3", "relational conditional adjustment activate", k=30),
    Query("w4", "zzznope"),
    Query("w5", "search engine index query", k=5),
    Query("w6", "user assistant"),  # hot terms under skew
)


@pytest.fixture(scope="module")
def built(spark):
    pdf = synthesize_transcripts_pdf(80, seed=99, hot_token_frac=0.3)
    idx = build_index(spark.createDataFrame(pdf))
    avgdl = idx.doc_stats.collect()[0]["avgdl"]
    return idx, avgdl


def _collect_ranked(df):
    return sorted((r["query_id"], r["rank"], r["doc_id"], r["score"])
                  for r in df.collect())


@pytest.mark.parametrize("shard_span", [64, 10_000])
def test_wand_matches_exhaustive(spark, built, shard_span):
    idx, avgdl = built
    packed = build_packed_postings(idx.term_doc_tf, avgdl, shard_span=shard_span)
    got = _collect_ranked(wand_topk(spark, packed, idx.doc_stats, queries=QUERIES))
    want = _collect_ranked(bm25_topk(spark, idx.term_doc_tf, idx.term_stats,
                                     idx.doc_stats, queries=QUERIES))
    assert [g[:3] for g in got] == [w[:3] for w in want]  # identical ranks/docs
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], abs=1e-6)


def test_merge_preserves_postings_and_results(spark, built):
    idx, avgdl = built
    packed = build_packed_postings(idx.term_doc_tf, avgdl, shard_span=64)
    merged = merge_packed(packed, level_factor=4)
    merged2 = merge_packed(merged, level_factor=4)  # second level
    # posting-level equivalence: unpack and compare against the tf table
    orig = {(r["term"], r["doc_id"]): (r["tf"], r["dl"])
            for r in idx.term_doc_tf.collect()}
    got = {(r["term"], r["doc_id"]): (r["tf"], r["dl"])
           for r in unpack_to_rows(merged2).collect()}
    assert got == orig
    # query-level equivalence across merge levels
    want = _collect_ranked(wand_topk(spark, packed, idx.doc_stats, queries=QUERIES))
    got_m = _collect_ranked(wand_topk(spark, merged2, idx.doc_stats, queries=QUERIES))
    assert got_m == want
    # merge actually reduced segment count
    assert merged2.count() < packed.count()


def test_wand_filtered_matches_exhaustive(spark, built):
    """allowed_docs threaded into the packed kernel (cogrouped per shard)
    must rank-match the exhaustive path's semi-join filter — same global
    corpus stats, candidates restricted to the allowed set."""
    from pyspark.sql import functions as F
    idx, avgdl = built
    allowed = idx.docs.where(F.col("role") == "user").select("doc_id")
    packed = build_packed_postings(idx.term_doc_tf, avgdl, shard_span=64)
    got = _collect_ranked(wand_topk(spark, packed, idx.doc_stats,
                                    queries=QUERIES, allowed_docs=allowed))
    want = _collect_ranked(bm25_topk(spark, idx.term_doc_tf, idx.term_stats,
                                     idx.doc_stats, queries=QUERIES,
                                     allowed_docs=allowed))
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], abs=1e-6)
    # the filter actually bites: fewer results than the unfiltered run
    unfiltered = _collect_ranked(wand_topk(spark, packed, idx.doc_stats,
                                           queries=QUERIES))
    assert {g[:3] for g in got} != {u[:3] for u in unfiltered}
    # every result doc is in the allowed set
    ok = {r["doc_id"] for r in allowed.collect()}
    assert all(g[2] in ok for g in got)


def test_wand_filtered_empty_allowed(spark, built):
    idx, avgdl = built
    packed = build_packed_postings(idx.term_doc_tf, avgdl, shard_span=64)
    empty = idx.docs.where("doc_id < 0").select("doc_id")
    out = wand_topk(spark, packed, idx.doc_stats, queries=QUERIES,
                    allowed_docs=empty)
    assert out.count() == 0


def test_wand_filtered_conjunctive(spark, built):
    """AND semantics + metadata filter: intersection docs masked by the
    allowed set, scores from global stats — equals the exhaustive
    conjunctive run restricted to allowed docs."""
    from pyspark.sql import functions as F
    from mini_distributed_search_engine_spark.query.bm25 import (
        bm25_topk_conjunctive)
    idx, avgdl = built
    allowed = idx.docs.where(F.col("role") == "user").select("doc_id")
    packed = build_packed_postings(idx.term_doc_tf, avgdl, shard_span=64)
    qs = (Query("c1", "user assistant", k=50), Query("c2", "spark", k=50))
    got = _collect_ranked(wand_topk(spark, packed, idx.doc_stats, queries=qs,
                                    conjunctive=True, allowed_docs=allowed))
    # exhaustive equivalent: intersect-then-score over the allowed postings
    # (removing a doc's rows removes it from every term's list, so the
    # intersection is exactly "allowed docs containing all terms"; stats
    # are passed separately and stay global)
    tf_allowed = idx.term_doc_tf.join(allowed, "doc_id", "semi")
    want = _collect_ranked(bm25_topk_conjunctive(
        spark, tf_allowed, idx.term_stats, idx.doc_stats, queries=qs))
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], abs=1e-6)


def test_driver_rank_identity(spark, built):
    """final_rank='driver' (per-shard top-k heap-merged driver-side, the
    serving mode) must produce exactly the window path's (query_id, rank,
    doc_id, score) rows — same rounded-score-desc, doc-id-asc discipline."""
    idx, avgdl = built
    packed = build_packed_postings(idx.term_doc_tf, avgdl, shard_span=64)
    want = _collect_ranked(wand_topk(spark, packed, idx.doc_stats,
                                     queries=QUERIES))
    got = _collect_ranked(wand_topk(spark, packed, idx.doc_stats,
                                    queries=QUERIES, final_rank="driver"))
    assert got == want
    with pytest.raises(ValueError):
        wand_topk(spark, packed, idx.doc_stats, queries=QUERIES,
                  final_rank="heap")
