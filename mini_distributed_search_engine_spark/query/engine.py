"""SearchEngine — the user-facing query API.

Replaces the reference's Searcher HTTP endpoint (`jobs/Searcher.java:128-317`:
per-request KVS point lookups + driver-side heap). Construction warms the
session the way Searcher's startup warmed its IDF cache
(Searcher.java:64-81,126): the packed index and stats are cached once; each
`search()` is then a small Spark job.

    eng = SearchEngine(spark, index_root)           # from a StagedIndexBuild
    eng.search("spark shuffle", k=10)               # -> list of result rows
    eng.search_batch([...Query...])                 # -> DataFrame
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .bm25 import Query, bm25_topk
from .wand import wand_topk


class SearchEngine:
    def __init__(self, spark: SparkSession, index_root: str,
                 use_packed: bool = True):
        self.spark = spark
        self.use_packed = use_packed
        self.doc_stats = spark.read.parquet(f"{index_root}/stats/doc_stats")
        self._stats_row = self.doc_stats.collect()[0]  # warm once
        self._corpus_stats = (int(self._stats_row["n_docs"]),
                              float(self._stats_row["avgdl"]))
        if use_packed:
            # Cache hash-partitioned on shard_id: the per-query
            # groupBy(shard_id).applyInPandas then needs NO exchange (the
            # cached partitioning already satisfies its clustered
            # distribution), so a warm query is one shuffle-free scan stage
            # plus the tiny global-rank stage.
            n = spark.sparkContext.defaultParallelism
            self.packed = (spark.read.parquet(f"{index_root}/merged/data")
                           .repartition(n, "shard_id").cache())
            self.packed.count()
        else:
            self.tf = spark.read.parquet(f"{index_root}/term_doc_tf/data").cache()
            self.tf.count()
            self.term_stats = spark.read.parquet(
                f"{index_root}/stats/term_stats").cache()
            self.term_stats.count()
        self.docs = spark.read.parquet(f"{index_root}/docs/data")

    def search_batch(self, queries: tuple[Query, ...],
                     hydrate: bool = False) -> DataFrame:
        if self.use_packed:
            out = wand_topk(self.spark, self.packed, self.doc_stats,
                            queries=queries,
                            corpus_stats=self._corpus_stats)
        else:
            out = bm25_topk(self.spark, self.tf, self.term_stats,
                            self.doc_stats, queries=queries)
        if hydrate:
            from pyspark.sql import functions as F
            meta = self.docs.select("doc_id", "conv_id", "turn_idx", "role",
                                    F.substring("text", 1, 80).alias("snippet"))
            out = out.join(meta, "doc_id").select(
                "query_id", "rank", "doc_id", "score",
                "conv_id", "turn_idx", "role", "snippet")
        return out

    def search(self, text: str, k: int = 10, hydrate: bool = True) -> list:
        df = self.search_batch((Query("q", text, k=k),), hydrate=hydrate)
        return df.orderBy("rank").collect()
