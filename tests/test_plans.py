"""Physical-plan quality gates: the optimizations we rely on at 100 TB must
actually appear in the plans (catch regressions that stay correct but stop
pruning/broadcasting)."""

from __future__ import annotations

import pytest

from mini_distributed_search_engine_spark.index.build import build_index
from mini_distributed_search_engine_spark.operators import flame
from mini_distributed_search_engine_spark.query.bm25 import Query, bm25_topk
from mini_distributed_search_engine_spark.sources.transcripts import (
    synthesize_transcripts_pdf)

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushed_to_scan(spark):
    df = flame.scan_filter_project(spark, SF)
    plan = df.queryExecution if False else df._jdf.queryExecution().toString()
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45" in plan
    # column pruning: scan must not read all 11 lineitem columns
    assert "l_comment" not in plan
    assert "ReadSchema" in plan


def test_query_terms_join_is_broadcast(spark):
    idx = build_index(spark.createDataFrame(synthesize_transcripts_pdf(10)))
    topk = bm25_topk(spark, idx.term_doc_tf, idx.term_stats, idx.doc_stats,
                     queries=(Query("q", "apple banana"),))
    plan = plan_of(topk)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_term_inlist_prunes_parquet(spark, tmp_path):
    from mini_distributed_search_engine_spark.index.build import write_index
    from pyspark.sql import functions as F
    idx = build_index(spark.createDataFrame(synthesize_transcripts_pdf(10)))
    write_index(idx, str(tmp_path / "ix"))
    tf = spark.read.parquet(str(tmp_path / "ix" / "term_doc_tf"))
    q = tf.where(F.col("term").isin("appl", "banana"))
    plan = q._jdf.queryExecution().toString()
    assert "PushedFilters" in plan and "In(term" in plan
