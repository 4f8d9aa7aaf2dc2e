"""Bucketed index layout: the term-equality join between term_doc_tf and
term_stats must run with NO shuffle exchange on either side when both are
written bucketed on term — the cluster-scale co-location contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from mini_distributed_search_engine_spark.index.build import (
    build_index, write_index_bucketed)
from mini_distributed_search_engine_spark.sources.transcripts import (
    synthesize_transcripts)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    idx = build_index(synthesize_transcripts(spark, 200), stem=True)
    tf_tbl, ts_tbl = write_index_bucketed(
        idx.term_doc_tf, idx.term_stats, "t_bucketed", str(tmp_path),
        buckets=8)
    try:
        tf = spark.table(tf_tbl)
        ts = spark.table(ts_tbl)
        joined = tf.join(ts, "term").groupBy("term").agg(
            F.sum(F.col("tf") * F.col("df")).alias("w"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both scans carry the bucket spec; the join itself needs no
        # term-hash Exchange (AQE leaves bucketed children alone)
        assert plan.count("Exchange hashpartitioning(term") == 0, plan
        assert "Bucketed: true" in plan, plan

        # and the bucketed copy holds exactly the same rows
        orig = {(r["term"], r["doc_id"], r["tf"])
                for r in idx.term_doc_tf.select(
                    "term", "doc_id", "tf").collect()}
        got = {(r["term"], r["doc_id"], r["tf"])
               for r in tf.select("term", "doc_id", "tf").collect()}
        assert got == orig
    finally:
        for name in (tf_tbl, ts_tbl):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        idx.unpersist()
