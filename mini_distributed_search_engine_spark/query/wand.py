"""Exact top-k over the packed index with MaxScore pruning (WAND family).

Distributed shape: query terms -> literal IN-list prune of the packed
segments -> one Arrow group per doc-shard (shards partition the doc space,
so per-shard exact top-k union-ed then globally ranked is exact) -> global
rank window.

Inside a shard (numpy, no per-posting Python): term-at-a-time MaxScore.
Terms sorted by upper bound U_t = idf_t * max_tf_norm_t (the segment's
precomputed block-max aggregate). Processing term i, every still-unscored
doc lacks all of t_1..t_{i-1}, so its best possible score is
RB_i = sum_{j>=i} U_j; once RB_i < theta (current k-th best), no unseen doc
can enter the top-k and we stop WITHOUT decoding the remaining lists.
Stopping only on strict < preserves exact tie-break semantics
(score DESC, doc_id ASC). Scoring a term's new docs looks up the other
terms' contributions by searchsorted — vectorized over the whole doc batch.

Proven rank-identical to the exhaustive DataFrame path in
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
])


def _shard_topk(queries_meta: list[tuple[str, dict[str, float], int]],
                avgdl: float):
    """Returns the applyInPandas fn: one doc-shard's segments -> per-query
    top-k candidates. queries_meta: (query_id, {term: idf}, k)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        decoded: dict[str, tuple[np.ndarray, np.ndarray, float]] = {}
        for r in pdf.itertuples(index=False):
            dec = decode_postings(bytes(r.doc_gaps), bytes(r.tfs), bytes(r.dls))
            contrib = tf_norm(dec.tfs, dec.dls, avgdl)
            decoded[r.term] = (dec.doc_ids, contrib, float(r.max_tf_norm))
        out_q, out_d, out_s = [], [], []
        for query_id, idfs, k in queries_meta:
            terms = [(t, idfs[t]) + decoded[t] for t in idfs if t in decoded]
            if not terms or k <= 0:
                continue
            # (term, idf, doc_ids, tf_norms, max_norm) sorted by U desc
            terms.sort(key=lambda x: -(x[1] * x[4]))
            ubs = np.array([idf * mx for _, idf, _, _, mx in terms])
            rem = np.cumsum(ubs[::-1])[::-1]  # RB_i = sum of U_j, j >= i
            pool_docs = np.empty(0, dtype=np.int64)
            pool_scores = np.empty(0, dtype=np.float64)
            theta = -math.inf
            for i, (t, idf, docs_i, _, _) in enumerate(terms):
                if rem[i] < theta:
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
                take = min(k, pool_docs.size)
                order = np.lexsort((pool_docs, -pool_scores))[:take]
                out_q += [query_id] * take
                out_d.append(pool_docs[order])
                out_s.append(pool_scores[order])
        if not out_q:
            return pd.DataFrame({"query_id": pd.Series(dtype="str"),
                                 "doc_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        return pd.DataFrame({"query_id": out_q,
                             "doc_id": np.concatenate(out_d),
                             "score": np.concatenate(out_s)})

    return fn


def wand_topk(spark: SparkSession, packed: DataFrame, doc_stats: DataFrame,
              queries: tuple[Query, ...] = DEFAULT_QUERY_SET,
              stem: bool = True,
              round_scores: int | None = 6) -> DataFrame:
    """Exact BM25 top-k via per-shard MaxScore over the packed index.

    Output schema identical to `bm25.bm25_topk`:
    (query_id, rank, doc_id, score).
    """
    qrows = analyzed_query_terms(queries, stem=stem)
    stats = doc_stats.collect()[0]
    n_docs, avgdl = stats["n_docs"], float(stats["avgdl"])
    term_list = sorted({t for _, t, _ in qrows})
    if not term_list:
        return spark.createDataFrame(
            [], "query_id string, rank int, doc_id long, score double")
    sel = packed.where(F.col("term").isin(term_list))
    # global df per query term (sum over shards) -> idf, driver-side (tiny)
    dfs = {r["term"]: r["gdf"] for r in
           sel.groupBy("term").agg(F.sum("df").alias("gdf")).collect()}
    queries_meta = []
    per_query: dict[str, tuple[dict, int]] = {}
    for query_id, term, k in qrows:
        per_query.setdefault(query_id, ({}, k))
        if term in dfs:
            per_query[query_id][0][term] = math.log(
                1.0 + (n_docs - dfs[term] + 0.5) / (dfs[term] + 0.5))
    queries_meta = [(q, idfs, k) for q, (idfs, k) in per_query.items()]

    cands = (sel.repartition("shard_id").groupBy("shard_id")
             .applyInPandas(lambda pdf: _shard_topk(queries_meta, avgdl)(pdf),
                            CAND_SCHEMA))
    # per-shard top-k already limits candidates to k per (query, shard)
    kdf = F.broadcast(spark.createDataFrame(
        [(q.query_id, q.k) for q in queries], "query_id string, k int"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col("doc_id").asc())
    out = (cands.withColumn("rank", F.row_number().over(w))
           .join(kdf, "query_id")
           .where(F.col("rank") <= F.col("k")))
    score = F.round(F.col("score"), round_scores) if round_scores is not None \
        else F.col("score")
    return out.select("query_id", "rank", "doc_id", score.alias("score"))
