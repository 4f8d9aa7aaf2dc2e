"""BM25 scoring + top-k retrieval (k1=1.2, b=0.75).

Replaces the reference's TF-IDF/PageRank blend (`jobs/Searcher.java:189-231`
— tf weight 1+log10(tf), idf log10(1+1500/df), a constant-offset "PageRank"
blend) with pure BM25 per the north rule.

IDF variant (documented because rank-identity depends on it):
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))
— the Lucene/standard non-negative Robertson form.

Query-time plan (the reference does per-term KVS point lookups,
Searcher.java:163-176; ours is the Spark-native equivalent):
  broadcast the tiny analyzed query-term set -> broadcast-hash semi-join
  prunes the postings scan to matching terms only -> per-(query,doc) partial
  aggregation -> per-query top-k with deterministic tie-break
  (score DESC, doc_id ASC) giving rank-identity.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.analyzer import analyze

K1 = 1.2
B = 0.75


@dataclass(frozen=True)
class Query:
    query_id: str
    text: str
    k: int = 10


# Reference-style query set over the sf documents vocabulary: single common
# term, single rare term, multi-term, absent term, stop-words-only,
# punctuation/case junk, digit junk, one k=500 (Searcher.java:244 cap).
DEFAULT_QUERY_SET: tuple[Query, ...] = (
    Query("q01", "spark query"),
    Query("q02", "vector"),
    Query("q03", "merge sort batch"),
    Query("q04", "the a you only"),          # stop words only -> empty
    Query("q05", "zzzznotaterm"),            # absent term -> empty
    Query("q06", "customer table scan"),
    Query("q07", "window", k=500),
    Query("q08", "dup"),
    Query("q09", "fast value slow"),
    Query("q10", "Group-BY: Joins! 42 supercalifragilisticexpialidocious"),
)


def analyzed_query_terms(queries: tuple[Query, ...] = DEFAULT_QUERY_SET,
                         stem: bool = True) -> list[tuple[str, str, int]]:
    """(query_id, term, k) rows — unique terms per query, same analyzer as
    indexing (driver-side: the query set is tiny and gets broadcast)."""
    rows = []
    for q in queries:
        for term in sorted(set(analyze(q.text, stem=stem))):
            rows.append((q.query_id, term, q.k))
    return rows


def _bm25_raw_scores(spark: SparkSession, term_doc_tf: DataFrame,
                     term_stats: DataFrame, doc_stats: DataFrame,
                     qrows: list, allowed_docs: DataFrame | None = None,
                     corpus_stats: tuple[int, float] | None = None
                     ) -> DataFrame:
    """(query_id, k, doc_id, raw_score): the shared BM25 scoring core —
    literal term IN-list prune, broadcast query/stats joins, partial-agg
    contribution sum. bm25_topk ranks this directly; the proximity
    variant adds its bonus before ranking.

    ``corpus_stats=(n_docs, avgdl)`` (e.g. cached by SearchEngine at
    warmup) skips the per-call one-row doc_stats collect — without it
    every exhaustive query pays a blocking driver job before the real
    scan even starts (same contract as wand.wand_topk)."""
    qterms = spark.createDataFrame(qrows, "query_id string, term string, k int")
    if corpus_stats is None:
        stats = doc_stats.collect()[0]
        corpus_stats = (int(stats["n_docs"]), float(stats["avgdl"]))
    n_docs, avgdl = corpus_stats

    # Literal IN-list on term BEFORE the joins: unlike a join, a literal
    # predicate prunes parquet row-groups (PushedFilters) and in-memory
    # cache batches by min/max stats — the Spark-native analogue of the
    # reference's per-term KVS point lookup (Searcher.java:163).
    term_list = sorted({t for _, t, _ in qrows})
    pruned = term_doc_tf.where(F.col("term").isin(term_list))
    sel = pruned.join(F.broadcast(qterms), "term")
    sel = sel.join(F.broadcast(term_stats.where(F.col("term").isin(term_list))),
                   "term")
    if allowed_docs is not None:
        sel = sel.join(allowed_docs.select("doc_id"), "doc_id", "semi")
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    tf_part = (F.col("tf") * (K1 + 1.0)) / (
        F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.lit(float(avgdl))))
    return (sel.withColumn("contrib", idf * tf_part)
            .groupBy("query_id", "k", "doc_id")
            .agg(F.sum("contrib").alias("raw_score")))


def bm25_topk(spark: SparkSession, term_doc_tf: DataFrame,
              term_stats: DataFrame, doc_stats: DataFrame,
              queries: tuple[Query, ...] = DEFAULT_QUERY_SET,
              stem: bool = True,
              round_scores: int | None = 6,
              allowed_docs: DataFrame | None = None,
              corpus_stats: tuple[int, float] | None = None) -> DataFrame:
    """Exact BM25 top-k for a query set.

    Returns (query_id, rank, doc_id, score); score rounded to
    ``round_scores`` decimals for cross-engine comparison (ranking is done on
    the unrounded float64).

    ``allowed_docs`` (a frame with a doc_id column) restricts results to a
    metadata-filtered doc subset (e.g. role = 'user') via a semi-join on
    the PRUNED postings — the filter meets the postings after the term
    IN-list already cut the scan to query terms, so its cost is
    O(matching postings), not O(index). Corpus statistics (idf, avgdl)
    stay corpus-global, the standard filtered-search semantics. At scale
    a selective doc filter broadcasts; a broad one falls back to a
    shuffle join on doc_id, which AQE sizes at runtime."""
    qrows = analyzed_query_terms(queries, stem=stem)
    if not qrows:
        qrows = [("__none__", "__none__", 0)]
    scored = _bm25_raw_scores(spark, term_doc_tf, term_stats, doc_stats,
                              qrows, allowed_docs, corpus_stats=corpus_stats)
    # Rank on the ROUNDED score when rounding is requested: float association
    # order differs between engines/plans, so two structurally-near-tied docs
    # can swap raw order by 1 ulp — ranking on the rounded value plus the
    # doc_id tie-break makes the (rank, doc_id) pairs engine-invariant.
    score = F.round(F.col("raw_score"), round_scores) if round_scores is not None \
        else F.col("raw_score")
    scored = scored.withColumn("score", score)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col("doc_id").asc())
    out = (scored.withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= F.col("k")))
    return out.select("query_id", "rank", "doc_id", "score")


# Conjunctive query set: term combinations whose intersection is a strict
# subset of their union on the sf documents tables (e.g. 'dup' appears in
# ~5% of docs, 'key' in ~75% — AND keeps only the overlap), so the AND
# semantics are actually exercised, unlike the 31-word-vocab DEFAULT set
# where long docs contain every common term.
AND_QUERY_SET: tuple[Query, ...] = (
    Query("a01", "dup key", k=500),
    Query("a02", "key fast value", k=500),
    Query("a03", "fast line vector", k=500),
    Query("a04", "dup zzzznotaterm", k=500),   # absent term -> empty
    Query("a05", "window", k=20),               # single term == OR semantics
)


def bm25_topk_conjunctive(spark: SparkSession, term_doc_tf: DataFrame,
                          term_stats: DataFrame, doc_stats: DataFrame,
                          queries: tuple[Query, ...] = AND_QUERY_SET,
                          stem: bool = True,
                          round_scores: int | None = 6,
                          corpus_stats: tuple[int, float] | None = None
                          ) -> DataFrame:
    """Conjunctive (AND) BM25 top-k: a doc qualifies only if it contains
    EVERY analyzed query term (posting-list intersection semantics); ranking
    among qualifying docs is the same BM25 sum with the same tie-break.

    Same broadcast-semi-join plan as `bm25_topk` plus a per-(query, doc)
    matched-term count compared against the query's term count — the
    declarative form of an intersection; the packed-index path
    (`wand.wand_topk(..., conjunctive=True)`) does the literal sorted-array
    intersection inside shards.
    """
    qrows = analyzed_query_terms(queries, stem=stem)
    if not qrows:
        qrows = [("__none__", "__none__", 0)]
    qterms = spark.createDataFrame(qrows, "query_id string, term string, k int")
    if corpus_stats is None:
        stats = doc_stats.collect()[0]
        corpus_stats = (int(stats["n_docs"]), float(stats["avgdl"]))
    n_docs, avgdl = corpus_stats
    term_list = sorted({t for _, t, _ in qrows})
    nterms = {}
    for q, _, _ in qrows:
        nterms[q] = nterms.get(q, 0) + 1
    ndf = F.broadcast(spark.createDataFrame(
        list(nterms.items()), "query_id string, nterms int"))

    pruned = term_doc_tf.where(F.col("term").isin(term_list))
    sel = pruned.join(F.broadcast(qterms), "term")
    sel = sel.join(F.broadcast(term_stats.where(F.col("term").isin(term_list))),
                   "term")
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    tf_part = (F.col("tf") * (K1 + 1.0)) / (
        F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.lit(float(avgdl))))
    scored = (sel.withColumn("contrib", idf * tf_part)
              .groupBy("query_id", "k", "doc_id")
              .agg(F.sum("contrib").alias("raw_score"),
                   # (term, doc_id) is unique in term_doc_tf, so the row
                   # count IS the distinct matched-term count
                   F.count(F.lit(1)).cast("int").alias("nhit"))
              .join(ndf, "query_id")
              .where(F.col("nhit") == F.col("nterms")))
    score = F.round(F.col("raw_score"), round_scores) if round_scores is not None \
        else F.col("raw_score")
    scored = scored.withColumn("score", score)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col("doc_id").asc())
    out = (scored.withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= F.col("k")))
    return out.select("query_id", "rank", "doc_id", "score")


def bm25_scores_pandas(docs_terms: list[list[str]], query_terms: list[str],
                       k1: float = K1, b: float = B) -> list[float]:
    """Brute-force single-node oracle (pure Python/numpy-free, test-only):
    same IDF/TF formulas, fixed association order (sorted unique terms)."""
    import math
    n = len(docs_terms)
    dls = [len(d) for d in docs_terms]
    avgdl = sum(dls) / n if n else 0.0
    dfs: dict[str, int] = {}
    tfs: list[dict[str, int]] = []
    for d in docs_terms:
        cnt: dict[str, int] = {}
        for t in d:
            cnt[t] = cnt.get(t, 0) + 1
        tfs.append(cnt)
        for t in cnt:
            dfs[t] = dfs.get(t, 0) + 1
    scores = []
    for i in range(n):
        s = 0.0
        for t in sorted(set(query_terms)):
            tf = tfs[i].get(t, 0)
            if tf == 0 or t not in dfs:
                continue
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dls[i] / avgdl))
        scores.append(s)
    return scores
