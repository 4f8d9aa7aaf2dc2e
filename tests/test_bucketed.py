"""Bucketed index layout: the term-equality join between term_doc_tf and
term_stats must run with NO shuffle exchange on either side when both are
written bucketed on term — the cluster-scale co-location contract. The
broadcast threshold is disabled for the join assertion so the plan is a
genuine SortMergeJoin over bucketed scans (a broadcast would trivially
have no exchange and prove nothing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mini_distributed_search_engine_spark.index.build import (
    build_index, register_bucketed, write_index_bucketed)
from mini_distributed_search_engine_spark.sources.transcripts import (
    synthesize_transcripts)


def _assert_colocated_join(spark, tf_tbl, ts_tbl):
    tf = spark.table(tf_tbl)
    ts = spark.table(ts_tbl)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = tf.join(ts, "term").groupBy("term").agg(
            F.sum(F.col("tf") * F.col("df")).alias("w"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        # neither side needs a term-hash Exchange: both scans are bucketed
        assert plan.count("Exchange hashpartitioning(term") == 0, plan
        assert "Bucketed: true" in plan, plan
        return joined.collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    idx = build_index(synthesize_transcripts(spark, 200), stem=True)
    tf_tbl, ts_tbl = write_index_bucketed(
        idx.term_doc_tf, idx.term_stats, "t_bucketed", str(tmp_path),
        buckets=8)
    try:
        first = _assert_colocated_join(spark, tf_tbl, ts_tbl)

        # exactly one file per bucket (repartition-before-bucketBy)
        import pathlib
        tf_files = [p for p in pathlib.Path(tmp_path, tf_tbl).glob("*.parquet")]
        assert len(tf_files) == 8, tf_files

        # the bucketed copy holds exactly the same rows
        orig = {(r["term"], r["doc_id"], r["tf"])
                for r in idx.term_doc_tf.select(
                    "term", "doc_id", "tf").collect()}
        got = {(r["term"], r["doc_id"], r["tf"])
               for r in spark.table(tf_tbl).select(
                   "term", "doc_id", "tf").collect()}
        assert got == orig

        # cross-session story: the writer's catalog is in-memory, so a new
        # session sees only the files. Simulate one by dropping the
        # entries, then re-register from the _bucketed.json descriptor —
        # the bucket spec (and the zero-exchange join) must come back.
        for name in (tf_tbl, ts_tbl):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        names = register_bucketed(spark, str(tmp_path))
        assert set(names) == {tf_tbl, ts_tbl}
        second = _assert_colocated_join(spark, tf_tbl, ts_tbl)
        assert sorted(map(tuple, first)) == sorted(map(tuple, second))
    finally:
        for name in (tf_tbl, ts_tbl):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        idx.unpersist()


def test_doc_bucketed_window_has_no_exchange(spark, tmp_path):
    """The doc_id-bucketed TF table: doc_keywords' per-doc top-n window
    must plan with ZERO Exchange (the O(postings) doc_id re-shuffle the
    plain layout pays), and the keywords must equal the plain path's."""
    from mini_distributed_search_engine_spark.functions.textstats import (
        doc_keywords)
    idx = build_index(synthesize_transcripts(spark, 200), stem=True)
    names = write_index_bucketed(
        idx.term_doc_tf, idx.term_stats, "t_docbucket", str(tmp_path),
        buckets=8, with_doc_bucketed=True)
    try:
        assert names[-1] == "t_docbucket_term_doc_tf_by_doc"
        n_docs = int(idx.doc_stats.collect()[0]["n_docs"])
        tf_by_doc = spark.table(names[-1])
        ts = F.broadcast(spark.table("t_docbucket_term_stats"))
        out = doc_keywords(tf_by_doc, ts, n_docs)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # BroadcastExchange (term_stats) is fine; no SHUFFLE exchange —
        # in particular none on doc_id in front of the window
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        got = sorted(map(tuple, out.collect()))
        want = sorted(map(tuple, doc_keywords(
            idx.term_doc_tf, idx.term_stats, n_docs).collect()))
        assert got == want and len(got) > 0
        # cross-session story: re-register from the descriptor (now with a
        # per-table clustered_by) and re-check the zero-exchange plan
        for n in names:
            spark.sql(f"DROP TABLE IF EXISTS {n}")
        assert set(register_bucketed(spark, str(tmp_path))) == set(names)
        out2 = doc_keywords(spark.table(names[-1]), ts, n_docs)
        plan2 = out2._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan2, plan2
    finally:
        for n in names:
            spark.sql(f"DROP TABLE IF EXISTS {n}")
        idx.unpersist()
