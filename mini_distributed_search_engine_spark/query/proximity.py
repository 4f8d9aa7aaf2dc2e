"""Proximity-boosted BM25: term closeness breaks score ties.

Classic IR refinement the reference's Searcher lacks (its blend is
TF-weight + PageRank only, Searcher.java:240-317): documents where the
query terms appear NEAR each other outrank documents that merely contain
them scattered. Score = BM25 + w * sum over unordered query-term pairs of
1 / (1 + min |pos_a - pos_b|) — the bonus peaks at 1 per pair for
adjacent terms and decays hyperbolically, a standard pairwise-min-dist
formulation (Rasolofo & Savoy 2003 shape).

Distributed shape: the positional index is pruned to query terms with the
same literal IN-list the BM25 scan uses, then the pair distances come
from ONE self-join keyed on (query_id, doc_id) — fan-out per doc is
occ(t1) x occ(t2) of QUERY terms only (bounded by the per-doc query-term
occurrences, not the doc length), and the min/sum aggregations partial-
aggregate map-side. The bonus then LEFT-joins onto the BM25 scores: docs
matching a single term keep bonus 0 and rank purely by BM25 (OR
semantics preserved).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .bm25 import (DEFAULT_QUERY_SET, Query, _bm25_raw_scores,
                   analyzed_query_terms)

PROX_W = 1.0  # bonus weight: one adjacent pair ~ one strong BM25 term


def bm25_topk_proximity(spark: SparkSession, term_doc_tf: DataFrame,
                        term_stats: DataFrame, doc_stats: DataFrame,
                        positions: DataFrame,
                        queries: tuple[Query, ...] = DEFAULT_QUERY_SET,
                        stem: bool = True, w: float = PROX_W,
                        round_scores: int | None = 6,
                        corpus_stats: tuple[int, float] | None = None
                        ) -> DataFrame:
    """(query_id, rank, doc_id, score): BM25 + pairwise proximity bonus.

    ``positions``: the positional index (doc_id, term, pos) — the same
    table `phrase_match` consumes (pos over the post-analyzer sequence).
    Rank/tie-break discipline identical to `bm25_topk` (rounded score
    desc, doc_id asc), so results are engine-invariant and DuckDB can
    oracle them.
    """
    qrows = analyzed_query_terms(queries, stem=stem)
    if not qrows:
        qrows = [("__none__", "__none__", 0)]
    raw = _bm25_raw_scores(spark, term_doc_tf, term_stats, doc_stats, qrows,
                           corpus_stats=corpus_stats)

    term_list = sorted({t for _, t, _ in qrows})
    qterms = spark.createDataFrame(qrows, "query_id string, term string, k int")
    qpos = (positions.where(F.col("term").isin(term_list))
            .join(F.broadcast(qterms.select("query_id", "term")), "term")
            .select("query_id", "doc_id", "term", "pos"))
    a = qpos.select("query_id", "doc_id", F.col("term").alias("t1"),
                    F.col("pos").alias("p1"))
    b = qpos.select("query_id", "doc_id", F.col("term").alias("t2"),
                    F.col("pos").alias("p2"))
    pairmin = (a.join(b, ["query_id", "doc_id"])
               .where(F.col("t1") < F.col("t2"))
               .groupBy("query_id", "doc_id", "t1", "t2")
               .agg(F.min(F.abs(F.col("p1") - F.col("p2"))).alias("d")))
    bonus = (pairmin.groupBy("query_id", "doc_id")
             .agg(F.sum(1.0 / (1.0 + F.col("d"))).alias("bns")))

    scored = (raw.join(bonus, ["query_id", "doc_id"], "left")
              .withColumn("raw2", F.col("raw_score")
                          + F.lit(float(w)) * F.coalesce("bns", F.lit(0.0))))
    score = F.round(F.col("raw2"), round_scores) if round_scores is not None \
        else F.col("raw2")
    scored = scored.withColumn("score", score)
    win = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                                 F.col("doc_id").asc())
    return (scored.withColumn("rank", F.row_number().over(win))
            .where(F.col("rank") <= F.col("k"))
            .select("query_id", "rank", "doc_id", "score"))
