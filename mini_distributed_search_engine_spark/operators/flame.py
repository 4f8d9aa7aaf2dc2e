"""Flame-operator analogues, Spark-first (SURVEY.md §2.1 inventory).

The reference's Flame engine exposes ~25 string-typed RDD operators executed
as serialized-lambda HTTP fan-outs over a KVS (`flame/FlameRDD.java`,
`flame/Worker.java`). Each maps to a declarative Spark primitive; this module
implements them as concrete DataFrame programs over the sf test tables so
each inventory row has a runnable `queries()` entry with a DuckDB oracle.

Notes on deliberate deviations:
* `sample` (FlameRDD.java:120, Bernoulli per element) is made DETERMINISTIC
  via an md5-prefix predicate so Spark and the oracle agree row-for-row —
  the reference's Math.random() sampling is not reproducible even against
  itself.
* `fold`'s zero-applied-per-worker quirk (FlameRDDImpl.java:145-162) is a
  bug-shaped artifact we do not copy; Catalyst's partial/final aggregation
  is the correct semantics.
* `join` (flame/Worker.java:416-443) is an index-nested-loop over remote
  point lookups; ours is whatever Catalyst picks (broadcast-hash here, the
  customer side being small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Fixed driver-local list for the parallelize analogue (the reference tests
# feed randomized word lists; ours is deterministic for the oracle).
PARALLELIZE_DATA = ("spark", "flame", "kvs", "index", "bm25", "rank",
                    "merge", "shard")


# 0. parallelize: driver-local list -> distributed table with synthetic keys
#    (flame/FlameContext.java:28, FlameContextImpl.java:48-63). Spark:
#    createDataFrame; the reference's hashed row keys become an explicit
#    position column (its row keys only exist to spread the KVS ring).
def parallelize_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = [(i, w) for i, w in enumerate(PARALLELIZE_DATA)]
    return spark.createDataFrame(rows, "pos int, value string")


# 1. fromTable: scan + project/filter fused lambda (flame/Worker.java:312-347)
#    -> predicate pushdown + column pruning reach the parquet scan.
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (li.where(F.col("l_quantity") > 45)
            .select("l_orderkey", "l_partkey",
                    F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
                    .alias("revenue")))


# 2. flatMap + mapToPair + foldByKey: the canonical FlameWordCount
#    (test/FlameWordCount.java:15-27) over documents.text.
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.regexp_replace(F.lower("text"),
                                                  "[^a-z0-9]+", " ")), r"\s+")).alias("word"))
    return (toks.where(F.col("word") != "")
            .groupBy("word").agg(F.count("*").cast("long").alias("cnt")))


# 3. distinct (flame/Worker.java:158-174: value-as-key collision dedup)
def distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "orders").select("o_custkey").distinct()


# 4. join (flame/Worker.java:416-443) — broadcast-hash here.
def join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    return (j.groupBy("c_mktsegment")
            .agg(F.count("*").cast("long").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("total_price")))


# 5. fold (flame/Worker.java:204-231 + FlameRDDImpl.java:145-162):
#    partial+final aggregation, Catalyst-native.
def fold_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(F.sum("l_quantity").alias("sum_qty"),
                  F.max("l_extendedprice").alias("max_price"),
                  F.min("l_extendedprice").alias("min_price"),
                  F.count("*").cast("long").alias("cnt"))


# 6. groupBy (flame/Worker.java:281-309: key-extractor grouping)
def groupby_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.count("*").cast("long").alias("cnt"),
                 F.sum("l_quantity").alias("sum_qty")))


# 7. intersection (flame/Worker.java:236-257: in-memory retainAll -> df.intersect)
def intersection_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    ords = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return cust.intersect(ords)


# 8. cogroup (flame/Worker.java:495-531: full-outer cogroup)
def cogroup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (_t(spark, sf_dir, "orders").groupBy(F.col("o_custkey").alias("custkey"))
         .agg(F.count("*").cast("long").alias("n_orders")))
    b = (_t(spark, sf_dir, "customer").groupBy(F.col("c_custkey").alias("custkey"))
         .agg(F.count("*").cast("long").alias("n_cust")))
    return (a.join(b, "custkey", "full_outer")
            .select("custkey",
                    F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
                    F.coalesce("n_cust", F.lit(0)).cast("long").alias("n_cust")))


# 9. sample (flame/FlameRDD.java:120) — deterministic md5-prefix Bernoulli.
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    key = F.concat(F.col("l_orderkey").cast("string"), F.lit("_"),
                   F.col("l_linenumber").cast("string"))
    return (li.where(F.substring(F.md5(key), 1, 2) < "1a")
            .select("l_orderkey", "l_linenumber", "l_quantity"))


# 10. take(n) (flame/FlameRDD.java:63) — made deterministic with an ORDER BY;
#     the reference allows "any n" (scan order), which is unverifiable.
def take_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (_t(spark, sf_dir, "orders")
            .select("o_orderkey", "o_totalprice")
            .orderBy("o_orderkey").limit(10))


# 11. count (flame/FlameRDD.java:36)
def count_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").agg(F.count("*").cast("long").alias("cnt"))


# 12. mapPartitions (flame/Worker.java:472-493) -> mapInPandas, Arrow-batched.
#     Computes per-row whitespace token counts over documents (doubles as the
#     training-data token_count op).
def mappartitions_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("n_tokens", T.LongType())])

    def fn(batches):
        for pdf in batches:
            out = pdf[["doc_id"]].copy()
            out["n_tokens"] = pdf["text"].str.split().map(len).astype("int64")
            yield out

    return docs.mapInPandas(fn, schema)


# 13. parallelize (flame/FlameContext.java:28) -> createDataFrame; exercised
#     implicitly by every query-term broadcast.


# 14/16/17/23. collect / saveAsTable / destroy (FlameRDD.java:43,56,78 and the
#     pair-RDD twins) as one driver-checkable lifecycle query: persist the
#     aggregate (the reference materializes every op into a KVS table), save
#     it to parquet, read the saved table back and collect it (the read-back
#     executes against the SAVED copy; the returned frame is a localized
#     snapshot of those rows so the scratch dir can be removed), and
#     unpersist the source. The oracle checks the whole write→read
#     lifecycle result, not just the aggregate.
def save_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    out = (_t(spark, sf_dir, "lineitem")
           .groupBy("l_returnflag", "l_linestatus")
           .agg(F.count("*").cast("long").alias("cnt"),
                F.sum("l_quantity").alias("sum_qty"))
           .persist())
    # mkdtemp per invocation: a FIXED shared path raced when two
    # correctness runs on one host overwrote/rmtree'd it mid-read
    path = tempfile.mkdtemp(prefix="mdse_flame_save_roundtrip_")
    try:
        out.write.mode("overwrite").parquet(path)   # saveAsTable
        saved = spark.read.parquet(path)
        return spark.createDataFrame(saved.collect(), saved.schema)
    finally:
        out.unpersist()                             # destroy (even on error)
        shutil.rmtree(path, ignore_errors=True)
