"""Exact top-k over the packed index with MaxScore pruning (WAND family).

Distributed shape: query terms -> literal IN-list prune of the packed
segments (row-group/cache-batch pruning) -> one Arrow group per doc-shard
(shards partition the doc space, so per-shard exact top-k union-ed then
globally ranked is exact) -> global rank window. One Spark job: idf inputs
(per-term global df) are stored IN the segments, and corpus stats
(n_docs, avgdl) are a one-row collect at call time.

Inside a shard (numpy, no per-posting Python): term-at-a-time MaxScore.
Terms sorted by upper bound U_t = idf_t * max_tf_norm_t (precomputed segment
metadata). Processing term i, every still-unscored doc lacks all of
t_1..t_{i-1}, so its best possible score is RB_i = sum_{j>=i} U_j; once
RB_i < theta - eps (current k-th best minus half a rounding unit), no unseen
doc can reach the ROUNDED top-k and we stop without decoding the remaining
lists. The eps guard plus ranking on rounded scores with the (score DESC,
doc_id ASC) tie-break keeps results engine-invariant under float association
noise. Proven rank-identical to the exhaustive DataFrame path in
tests/test_wand.py.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..index.codec import decode_postings, tf_norm
from .bm25 import DEFAULT_QUERY_SET, Query, analyzed_query_terms

CAND_SCHEMA = T.StructType([
    T.StructField("query_id", T.StringType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("score", T.DoubleType(), False),
    # per-query k rides with every candidate row so the final rank filter
    # needs no extra broadcast join (one fewer stage on the serving path)
    T.StructField("k", T.IntegerType(), False),
])


def _shard_topk(queries_meta: list[tuple[str, list[str], int]],
                n_docs: int, avgdl: float, round_scores: int | None,
                conjunctive: bool = False):
    """applyInPandas fn: one doc-shard's segments -> per-query top-k
    candidates. queries_meta: (query_id, terms, k); idf comes from the
    segments' stored global_df. ``conjunctive=True`` = AND semantics:
    sorted-array posting-list intersection (a doc's postings for every term
    live in the same doc-range shard, so per-shard intersection is exact)."""
    eps = 10.0 ** (-round_scores) if round_scores is not None else 0.0

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        decoded: dict[str, tuple] = {}
        for r in pdf.itertuples(index=False):
            dec = decode_postings(bytes(r.doc_gaps), bytes(r.tfs), bytes(r.dls))
            contrib = tf_norm(dec.tfs, dec.dls, avgdl)
            idf = math.log(1.0 + (n_docs - r.global_df + 0.5)
                           / (r.global_df + 0.5))
            # The MaxScore upper bound is derived from the DECODED norms,
            # not the segment's stored encode-time max_tf_norm: the stored
            # bound was computed with the avgdl at encode time, which drifts
            # after incremental appends — the derived bound is exact under
            # any current avgdl (and this path decodes every selected
            # segment anyway, so it costs one vector max).
            mx = float(contrib.max()) if contrib.size else 0.0
            decoded[r.term] = (idf, dec.doc_ids, contrib, mx)
        out_q, out_d, out_s = [], [], []
        for query_id, qterms, k in queries_meta:
            terms = [(t,) + decoded[t] for t in qterms if t in decoded]
            if not terms or k <= 0:
                continue
            if conjunctive:
                if len(terms) < len(qterms):
                    continue  # a term absent from this shard -> no doc here has it
                # intersect smallest-first, then score the survivors exactly
                lists = sorted((t[2] for t in terms), key=len)
                docs = lists[0]
                for arr in lists[1:]:
                    docs = docs[np.isin(docs, arr, assume_unique=True)]
                    if docs.size == 0:
                        break
                if docs.size == 0:
                    continue
                scores = np.zeros(docs.size, dtype=np.float64)
                for (_, idf2, docs2, contrib2, _) in terms:
                    pos = np.searchsorted(docs2, docs)
                    scores += idf2 * contrib2[pos]
                sel_scores = (np.round(scores, round_scores)
                              if round_scores is not None else scores)
                take = min(k, docs.size)
                order = np.lexsort((docs, -sel_scores))[:take]
                out_q += [(query_id, k)] * take
                out_d.append(docs[order])
                out_s.append(scores[order])
                continue
            # (term, idf, doc_ids, tf_norms, max_norm) sorted by U desc
            terms.sort(key=lambda x: -(x[1] * x[4]))
            ubs = np.array([idf * mx for _, idf, _, _, mx in terms])
            rem = np.cumsum(ubs[::-1])[::-1]  # RB_i = sum of U_j, j >= i
            pool_docs = np.empty(0, dtype=np.int64)
            pool_scores = np.empty(0, dtype=np.float64)
            theta = -math.inf
            for i, (t, idf, docs_i, _, _) in enumerate(terms):
                if rem[i] < theta - eps:
                    break
                if pool_docs.size:
                    new_mask = ~np.isin(docs_i, pool_docs, assume_unique=True)
                    new_docs = docs_i[new_mask]
                else:
                    new_docs = docs_i
                if new_docs.size == 0:
                    continue
                scores = np.zeros(new_docs.size, dtype=np.float64)
                for (t2, idf2, docs2, contrib2, _) in terms:
                    pos = np.searchsorted(docs2, new_docs)
                    pos_c = np.minimum(pos, docs2.size - 1)
                    hit = docs2[pos_c] == new_docs
                    scores[hit] += idf2 * contrib2[pos_c[hit]]
                pool_docs = np.concatenate([pool_docs, new_docs])
                pool_scores = np.concatenate([pool_scores, scores])
                if pool_docs.size >= k:
                    theta = np.partition(pool_scores, -k)[-k]
            if pool_docs.size:
                # per-shard selection follows the GLOBAL ordering discipline:
                # rounded score desc, doc_id asc
                sel_scores = (np.round(pool_scores, round_scores)
                              if round_scores is not None else pool_scores)
                take = min(k, pool_docs.size)
                order = np.lexsort((pool_docs, -sel_scores))[:take]
                out_q += [(query_id, k)] * take
                out_d.append(pool_docs[order])
                out_s.append(pool_scores[order])
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

    return fn


def wand_topk(spark: SparkSession, packed: DataFrame, doc_stats: DataFrame,
              queries: tuple[Query, ...] = DEFAULT_QUERY_SET,
              stem: bool = True,
              round_scores: int | None = 6,
              corpus_stats: tuple[int, float] | None = None,
              conjunctive: bool = False) -> DataFrame:
    """Exact BM25 top-k via per-shard MaxScore over the packed index.

    Output schema identical to `bm25.bm25_topk`:
    (query_id, rank, doc_id, score). Pass ``corpus_stats=(n_docs, avgdl)``
    (e.g. cached by SearchEngine at warmup) to skip the doc_stats collect —
    a warm query is then a single Spark job. ``conjunctive=True`` = AND
    semantics (sorted posting-list intersection per shard), matching
    `bm25.bm25_topk_conjunctive`.
    """
    qrows = analyzed_query_terms(queries, stem=stem)
    if corpus_stats is None:
        stats = doc_stats.collect()[0]
        corpus_stats = (int(stats["n_docs"]), float(stats["avgdl"]))
    n_docs, avgdl = corpus_stats
    term_list = sorted({t for _, t, _ in qrows})
    if not term_list:
        return spark.createDataFrame(
            [], "query_id string, rank int, doc_id long, score double")
    sel = packed.where(F.col("term").isin(term_list))
    per_query: dict[str, tuple[list, int]] = {}
    for query_id, term, k in qrows:
        per_query.setdefault(query_id, ([], k))
        per_query[query_id][0].append(term)
    queries_meta = [(q, ts, k) for q, (ts, k) in per_query.items()]

    fn = _shard_topk(queries_meta, n_docs, avgdl, round_scores,
                     conjunctive=conjunctive)

    def fn_typed(pdf: pd.DataFrame) -> pd.DataFrame:
        return fn(pdf)

    cands = sel.groupBy("shard_id").applyInPandas(fn_typed, CAND_SCHEMA)
    score = F.round(F.col("score"), round_scores) if round_scores is not None \
        else F.col("score")
    scored = cands.withColumn("score", score)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col("doc_id").asc())
    out = (scored.withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= F.col("k")))
    return out.select("query_id", "rank", "doc_id", "score")
