"""Span/near retrieval: the packed sliding-window kernel must match a
brute-force cross-product oracle over the analyzed term sequences."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_distributed_search_engine_spark.functions.analyzer import analyze
from mini_distributed_search_engine_spark.functions.analyzer import (
    term_positions_pandas)
from mini_distributed_search_engine_spark.index.build import (
    with_stable_doc_ids)
from mini_distributed_search_engine_spark.index.positions import (
    build_packed_positions, merge_packed_positions)
from mini_distributed_search_engine_spark.query.bm25 import Query
from mini_distributed_search_engine_spark.query.span import (
    _min_span, span_count_pandas, span_near_match)
from mini_distributed_search_engine_spark.sources.transcripts import (
    synthesize_transcripts_pdf)

QUERIES = (
    Query("n1", "apple banana", k=500),
    Query("n2", "spark shuffle partition", k=500),
    Query("n3", "search engine", k=500),
    Query("n4", "apple zzzznotaterm", k=500),   # absent term -> empty
    Query("n5", "running", k=500),              # single term: span 0
)


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = synthesize_transcripts_pdf(60, seed=99)
    docs = with_stable_doc_ids(spark.createDataFrame(pdf))
    pos = term_positions_pandas(docs, "text", stem=True).cache()
    pos.count()
    docs_terms = [analyze(t) for t in pdf["text"]]
    return pos, docs_terms


def test_min_span_unit():
    import numpy as np
    a = np.array([0, 10, 50])
    b = np.array([12, 40])
    c = np.array([11, 60])
    assert _min_span([a, b, c]) == 2      # (10, 12, 11)
    assert _min_span([a]) == 0
    assert _min_span([np.array([5]), np.array([5])]) == 0


@pytest.mark.parametrize("window", [3, 8, 10_000])
def test_span_matches_bruteforce(spark, corpus, window):
    pos, docs_terms = corpus
    packed = build_packed_positions(pos, shard_span=64)
    got = {}
    for r in span_near_match(spark, packed, QUERIES,
                             window=window).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["min_span"]))
    for q in QUERIES:
        spans = span_count_pandas(docs_terms, q.text)
        exp = sorted(((d, s) for d, s in enumerate(spans)
                      if s is not None and s < window),
                     key=lambda r: (r[1], r[0]))[:q.k]
        rows = sorted(got.get(q.query_id, []))
        assert [(d, s) for _, d, s in rows] == exp, q.text


def test_span_merged_levels_and_blocked(spark, corpus):
    pos, _ = corpus
    packed = build_packed_positions(pos, shard_span=64)
    merged = merge_packed_positions(packed, level_factor=4)
    base = sorted((r["query_id"], r["rank"], r["doc_id"], r["min_span"])
                  for r in span_near_match(spark, packed, QUERIES).collect())
    lvl = sorted((r["query_id"], r["rank"], r["doc_id"], r["min_span"])
                 for r in span_near_match(spark, merged, QUERIES).collect())
    assert lvl == base
    tomb = sorted({d for _, _, d, _ in base})[:5]
    blocked = sorted((r["query_id"], r["rank"], r["doc_id"], r["min_span"])
                     for r in span_near_match(spark, packed, QUERIES,
                                              blocked_ids=tomb).collect())
    want = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["min_span"]) for r in
        span_near_match(
            spark, build_packed_positions(
                pos.where(~F.col("doc_id").isin(tomb)), shard_span=64),
            QUERIES).collect())
    assert blocked == want
