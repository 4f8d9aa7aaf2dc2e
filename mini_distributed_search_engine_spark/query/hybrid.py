"""Hybrid retrieval: BM25 lexical + embedding-cosine semantic candidates
fused with Reciprocal Rank Fusion (RRF).

The modern retrieval-stack default (and what an LLM-era user of the
reference engine would bolt on next): run the text query through the
inverted index AND an embedding query through the vector path, then fuse
by rank — rrf(d) = sum over systems of 1 / (K + rank_sys(d)) with the
standard K=60 (Cormack et al., SIGIR 2009). Fusing on ranks, not scores,
sidesteps incomparable score scales.

Plan shape: both candidate lists are the existing top-k operators (each
already broadcast-pruned), the fusion is a union + one groupBy over
O(queries x k_each) rows, then a per-query top-k window — the fusion
stage is negligible at any corpus scale because it only ever sees the
candidate lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.similarity import cosine_topk
from .bm25 import Query, bm25_topk

RRF_K = 60

# (hybrid query id, text for the lexical leg, vec_id whose embedding is
# the semantic leg) — the vec doubles as the "encoded query" since the
# sandbox has no text encoder; a production stack swaps in encoder output.
HYBRID_QUERIES: tuple[tuple[str, str, int], ...] = (
    ("h01", "spark query", 0),
    ("h02", "vector", 1),
    ("h03", "merge sort batch", 2),
)


def _fuse(spark: SparkSession, b: DataFrame, c: DataFrame,
          pairs: tuple[tuple[str, str, int], ...],
          k: int, rrf_k: int) -> DataFrame:
    """RRF fusion of a lexical rank list (query_id, doc_id, rank) and a
    semantic one (query_vec_id, vec_id, rank); ties by doc_id asc. The
    fusion only ever sees the two candidate lists (O(queries x k_each)
    rows), so its cost is corpus-size-independent."""
    m = spark.createDataFrame([(qid, v) for qid, _, v in pairs],
                              "query_id string, qvec long")
    cm = (c.join(F.broadcast(m), c["query_vec_id"] == m["qvec"])
          .select("query_id", F.col("vec_id").alias("doc_id"), "rank"))
    fused = (b.unionByName(cm)
             .groupBy("query_id", "doc_id")
             .agg(F.round(F.sum(F.lit(1.0) / (F.lit(float(rrf_k))
                                              + F.col("rank"))), 6)
                  .alias("rrf")))
    w = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(),
                                               F.col("doc_id").asc())
    return (fused.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", F.col("rank").cast("int").alias("rank"),
                    "doc_id", "rrf"))


def _hybrid(spark: SparkSession, term_doc_tf: DataFrame,
            term_stats: DataFrame, doc_stats: DataFrame,
            embeddings: DataFrame, semantic_leg,
            pairs: tuple[tuple[str, str, int], ...],
            k: int, k_each: int, rrf_k: int) -> DataFrame:
    """Shared wiring for both hybrids: BM25 lexical leg + the given
    semantic-leg callable (embeddings, query_ids, k) -> (query_vec_id,
    rank, vec_id, ...), fused with RRF. One implementation so the legs
    can never silently diverge (the oracle side mirrors this with
    sql_hybrid_topk(ann=...))."""
    texts = tuple(Query(qid, text, k=k_each) for qid, text, _ in pairs)
    b = (bm25_topk(spark, term_doc_tf, term_stats, doc_stats, queries=texts)
         .select("query_id", "doc_id", "rank"))
    c = semantic_leg(embeddings,
                     query_ids=tuple(v for _, _, v in pairs), k=k_each)
    return _fuse(spark, b, c, pairs, k, rrf_k)


def hybrid_topk(spark: SparkSession, term_doc_tf: DataFrame,
                term_stats: DataFrame, doc_stats: DataFrame,
                embeddings: DataFrame,
                pairs: tuple[tuple[str, str, int], ...] = HYBRID_QUERIES,
                k: int = 10, k_each: int = 20,
                rrf_k: int = RRF_K) -> DataFrame:
    """(query_id, rank, doc_id, rrf): RRF fusion of BM25 top-k_each and
    EXACT cosine top-k_each per hybrid query. The exact semantic leg is
    O(corpus) per query — the correctness baseline and batch one-pass
    shape; `hybrid_ann_topk` below is the serving path."""
    return _hybrid(spark, term_doc_tf, term_stats, doc_stats, embeddings,
                   cosine_topk, pairs, k, k_each, rrf_k)


def hybrid_ann_topk(spark: SparkSession, term_doc_tf: DataFrame,
                    term_stats: DataFrame, doc_stats: DataFrame,
                    embeddings: DataFrame,
                    pairs: tuple[tuple[str, str, int], ...] = HYBRID_QUERIES,
                    k: int = 10, k_each: int = 20,
                    rrf_k: int = RRF_K) -> DataFrame:
    """Serving-shaped hybrid: the semantic candidates come from IVF-flat
    ANN (`similarity.ivf_ann_topk` — probe-pruned to ~n_probe/n_centroids
    of the corpus per query; swap in `ivf_partitioned_topk` over the
    at-rest layout for directory-pruned IO) instead of the exact cosine
    pass. Candidates differ from `hybrid_topk` wherever ANN recall does,
    so it carries its own oracle (the IVF CTEs nested in place of the
    exact leg); recall vs the exact-leg hybrid is pytest-bounded."""
    from ..functions.similarity import ivf_ann_topk
    return _hybrid(spark, term_doc_tf, term_stats, doc_stats, embeddings,
                   ivf_ann_topk, pairs, k, k_each, rrf_k)
