"""Reference-Searcher scoring parity: tfidf_blend_topk / tfidf_rerank_topk
vs a brute-force pure-Python mirror of Searcher.java:189-307 (tf weight
1+log10, idf log10(1+1500/df), threshold 0.4, 0.15-constant PageRank blend,
title/body match bucketing)."""

from __future__ import annotations

import math

import pytest

from mini_distributed_search_engine_spark.functions.analyzer import analyze
from mini_distributed_search_engine_spark.index.build import build_index
from mini_distributed_search_engine_spark.query.bm25 import Query
from mini_distributed_search_engine_spark.query.tfidf import (
    N_EST, PR_CONST, RESULT_CAP, TFIDF_WEIGHT, THRESHOLD, tfidf_blend_topk,
    tfidf_rerank_topk)
from mini_distributed_search_engine_spark.sources.transcripts import (
    synthesize_transcripts_pdf)

QUERIES = (
    Query("t1", "apple banana", k=RESULT_CAP),
    Query("t2", "search tool index", k=RESULT_CAP),   # role/tool title hits
    Query("t3", "the you are", k=RESULT_CAP),          # stop-only -> empty
    Query("t4", "running assistant", k=RESULT_CAP),
)


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = synthesize_transcripts_pdf(40, seed=321)
    idx = build_index(spark.createDataFrame(pdf))
    docs_terms = [analyze(t) for t in pdf["text"]]
    titles_terms = [set(analyze(f"{r} {t}"))
                    for r, t in zip(pdf["role"], pdf["tool"])]
    return idx, docs_terms, titles_terms


def _oracle_blend(docs_terms, qtext):
    """(doc_id, tfidf_rounded, blended_rounded) for docs above threshold."""
    qterms = sorted(set(analyze(qtext)))
    dfs = {}
    for terms in docs_terms:
        for t in set(terms):
            dfs[t] = dfs.get(t, 0) + 1
    out = []
    for doc_id, terms in enumerate(docs_terms):
        s = 0.0
        for t in qterms:
            tf = terms.count(t)
            if tf == 0:
                continue
            s += (1.0 + math.log10(tf)) * math.log10(1.0 + N_EST / dfs[t])
        s = round(s, 6)
        if s > THRESHOLD:
            out.append((doc_id, s, PR_CONST * PR_CONST + TFIDF_WEIGHT * s))
    out.sort(key=lambda r: (-r[2], r[0]))
    return out[:RESULT_CAP]


def test_blend_matches_python_oracle(spark, corpus):
    idx, docs_terms, _ = corpus
    got = tfidf_blend_topk(spark, idx.term_doc_tf, idx.term_stats,
                           QUERIES).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for q in QUERIES:
        exp = _oracle_blend(docs_terms, q.text)
        rows = sorted(by_q.get(q.query_id, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in rows] == [d for d, _, _ in exp], q.text
        for r, (_, _, blended) in zip(rows, exp):
            assert r["score"] == pytest.approx(blended, abs=1e-9)
    assert "t3" not in by_q  # stop-only query yields nothing


def test_rerank_bucketing(spark, corpus):
    idx, docs_terms, titles_terms = corpus
    got = tfidf_rerank_topk(spark, idx.term_doc_tf, idx.term_stats, idx.docs,
                            QUERIES).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for q in QUERIES:
        if q.query_id not in by_q:
            continue
        rows = sorted(by_q[q.query_id], key=lambda r: r["rank"])
        qterms = set(analyze(q.text))
        # same doc set as the blend stage
        exp_docs = {d for d, _, _ in _oracle_blend(docs_terms, q.text)}
        assert {r["doc_id"] for r in rows} == exp_docs
        # match counts against the python analyzer
        for r in rows:
            body = sum(1 for t in qterms if t in docs_terms[r["doc_id"]])
            title = sum(1 for t in qterms if t in titles_terms[r["doc_id"]])
            assert (r["body_matches"], r["title_matches"]) == (body, title)
        # global ordering: buckets desc, score desc in-bucket, doc_id ties
        keys = [(-r["title_matches"], -r["body_matches"], -r["score"],
                 r["doc_id"]) for r in rows]
        assert keys == sorted(keys)


def test_rerank_moves_title_hits_first(spark, corpus):
    """A query whose terms hit role/tool must float title-matching docs to
    the top regardless of their blend score."""
    idx, _, titles_terms = corpus
    q = (Query("tt", "search tool index", k=RESULT_CAP),)
    rows = sorted(tfidf_rerank_topk(spark, idx.term_doc_tf, idx.term_stats,
                                    idx.docs, q).collect(),
                  key=lambda r: r["rank"])
    assert rows, "query must match something"
    tm = [r["title_matches"] for r in rows]
    assert max(tm) > 0
    # title_matches is the primary re-rank key: non-increasing in rank order
    assert tm == sorted(tm, reverse=True)
