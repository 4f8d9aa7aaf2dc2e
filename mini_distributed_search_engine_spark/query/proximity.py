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

import itertools
import math

import numpy as np
import pandas as pd
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


def _min_pair_dist(x: np.ndarray, y: np.ndarray) -> int:
    """min |x_i - y_j| over two sorted position arrays — searchsorted
    neighbors only, O((|x|) log |y|), never the cross product."""
    idx = np.searchsorted(y, x)
    big = np.int64(1) << 62
    lo = np.where(idx > 0, x - y[np.maximum(idx - 1, 0)], big)
    hi = np.where(idx < y.size, y[np.minimum(idx, y.size - 1)] - x, big)
    return int(np.minimum(lo, hi).min())


def wand_topk_proximity(spark: SparkSession, packed: DataFrame,
                        packed_pos: DataFrame, doc_stats: DataFrame,
                        queries: tuple[Query, ...] = DEFAULT_QUERY_SET,
                        stem: bool = True, w: float = PROX_W,
                        round_scores: int | None = 6,
                        corpus_stats: tuple[int, float] | None = None,
                        blocked_ids=None,
                        final_rank: str = "window") -> DataFrame:
    """`bm25_topk_proximity` served from the COMPRESSED indexes: packed
    TF segments (`index/packed.py`) cogrouped per doc-range shard with
    packed positional segments (`index/positions.py`). Rank-identical to
    the declarative row path (test-enforced; same rounded-score-desc,
    doc-id-asc discipline), one Spark job warm.

    REQUIRES the two packed tables to share the shard_id mapping — build
    the positional side with ``build_packed_positions(shard_bounds=
    compute_shard_bounds(packed))`` so positions co-shard with the TF
    layout (merge levels included); the kernel then sees both halves of
    a doc range in one Arrow group with no row-level join.

    Pruning stays sound under the bonus: a doc's proximity bonus is at
    most ``w * C(m, 2)`` for m query terms (each pair contributes <= 1),
    so MaxScore's remaining-bound and block-max tests carry that slack
    while theta stays the k-th best *BM25-only* pool score — a lower
    bound of the k-th best final score, since the bonus is non-negative.
    Surviving candidates decode ONLY the position blocks that hold them
    (`_PSeg.lists_for`); the exact bonus then reranks the pool.

    ``blocked_ids``: query-time tombstones, dropped at candidate decode
    (same LSM discipline as `wand_topk`).
    """
    from ..index.packed import _as_sorted_ids
    from ..index.positions import _PSeg
    from .wand import _Seg, _in_sorted, rank_candidates, CAND_SCHEMA

    qrows = analyzed_query_terms(queries, stem=stem)
    if corpus_stats is None:
        stats = doc_stats.collect()[0]
        corpus_stats = (int(stats["n_docs"]), float(stats["avgdl"]))
    n_docs, avgdl = corpus_stats
    term_list = sorted({t for _, t, _ in qrows})
    if not term_list:
        return spark.createDataFrame(
            [], "query_id string, rank int, doc_id long, score double")
    per_query: dict[str, tuple[list, int]] = {}
    for query_id, term, k in qrows:
        per_query.setdefault(query_id, ([], k))
        per_query[query_id][0].append(term)
    queries_meta = [(q, ts, k) for q, (ts, k) in per_query.items()]
    eps = 10.0 ** (-round_scores) if round_scores is not None else 0.0

    blocked = None
    if blocked_ids is not None:
        blocked = _as_sorted_ids(blocked_ids)
        if blocked.size == 0:
            blocked = None

    def shard_fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        segs = {r.term: _Seg(r, n_docs, avgdl)
                for r in left.itertuples(index=False)}
        psegs = {r.term: _PSeg(r) for r in right.itertuples(index=False)}
        out_q, out_d, out_s = [], [], []
        for query_id, qterms, k in queries_meta:
            terms = [(t, segs[t]) for t in qterms if t in segs]
            if not terms or k <= 0:
                continue
            # MaxScore with bonus slack (see docstring), mirroring
            # wand._shard_topk's disjunctive branch
            slack = w * (len(terms) * (len(terms) - 1) / 2.0)
            terms.sort(key=lambda x: -(x[1].idf * x[1].ub_norm))
            ubs = np.array([seg.idf * seg.ub_norm for _, seg in terms])
            rem = np.cumsum(ubs[::-1])[::-1]
            pool_docs = np.empty(0, dtype=np.int64)
            pool_scores = np.empty(0, dtype=np.float64)
            theta = -math.inf
            for i, (t, seg) in enumerate(terms):
                if rem[i] + slack < theta - eps:
                    break
                docs_i, norms_i = seg.full()
                if pool_docs.size:
                    new_mask = ~np.isin(docs_i, pool_docs, assume_unique=True)
                    new_docs = docs_i[new_mask]
                    own = norms_i[new_mask]
                else:
                    new_docs, own = docs_i, norms_i
                if blocked is not None and new_docs.size:
                    bmask = ~_in_sorted(new_docs, blocked)
                    new_docs, own = new_docs[bmask], own[bmask]
                if new_docs.size == 0:
                    continue
                own = seg.idf * own
                cand_lb = (np.concatenate([pool_scores, own])
                           if pool_scores.size else own)
                if cand_lb.size >= k:
                    theta = max(theta, float(np.partition(cand_lb, -k)[-k]))
                if theta > -math.inf and any(
                        s._full is None for j, (_, s) in enumerate(terms)
                        if j != i):
                    bound = own + slack
                    for j, (_, seg2) in enumerate(terms):
                        if j != i:
                            bound += seg2.idf * seg2.block_ub_at(new_docs)
                    keep = bound >= theta - eps
                    new_docs, own = new_docs[keep], own[keep]
                    if new_docs.size == 0:
                        continue
                scores = own.copy()
                for j, (_, seg2) in enumerate(terms):
                    if j != i:
                        scores += seg2.idf * seg2.lookup(new_docs)
                pool_docs = np.concatenate([pool_docs, new_docs])
                pool_scores = np.concatenate([pool_scores, scores])
                if pool_docs.size >= k:
                    theta = np.partition(pool_scores, -k)[-k]
            if not pool_docs.size:
                continue
            # exact proximity bonus over the pool (positions decoded
            # only for candidate blocks); pair ordering (t1 < t2 by
            # string) matches the declarative/oracle formulation
            order = np.argsort(pool_docs)
            sd = pool_docs[order]
            final = pool_scores[order].copy()
            uniq = sorted({t for t, _ in terms})
            if len(uniq) >= 2:
                plists = {t: psegs[t].lists_for(sd)
                          for t in uniq if t in psegs}
                for ta, tb in itertools.combinations(
                        [t for t in uniq if t in plists], 2):
                    la, lb = plists[ta], plists[tb]
                    for j in range(sd.size):
                        if la[j].size and lb[j].size:
                            final[j] += w / (
                                1.0 + _min_pair_dist(la[j], lb[j]))
            sel_scores = (np.round(final, round_scores)
                          if round_scores is not None else final)
            take = min(k, sd.size)
            top = np.lexsort((sd, -sel_scores))[:take]
            out_q += [(query_id, k)] * take
            out_d.append(sd[top])
            out_s.append(final[top])
        if not out_q:
            return pd.DataFrame({"query_id": pd.Series(dtype="str"),
                                 "doc_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64"),
                                 "k": pd.Series(dtype="int32")})
        return pd.DataFrame({"query_id": [q for q, _ in out_q],
                             "doc_id": np.concatenate(out_d),
                             "score": np.concatenate(out_s),
                             "k": np.array([k for _, k in out_q],
                                           dtype="int32")})

    sel_tf = packed.where(F.col("term").isin(term_list))
    sel_pos = packed_pos.where(F.col("term").isin(term_list))
    cands = (sel_tf.groupBy("shard_id")
             .cogroup(sel_pos.groupBy("shard_id"))
             .applyInPandas(shard_fn, CAND_SCHEMA))
    return rank_candidates(spark, cands, round_scores, final_rank,
                           {q: k for q, (_, k) in per_query.items()})
