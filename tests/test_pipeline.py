"""Checkpoint/resume: killed-after-stage-N rebuild must skip committed
stages and produce an index identical to a fresh build (SURVEY.md §5)."""

from __future__ import annotations

import shutil

from mini_distributed_search_engine_spark.index.packed import unpack_to_rows
from mini_distributed_search_engine_spark.plans.pipeline import StagedIndexBuild
from mini_distributed_search_engine_spark.sources.transcripts import (
    synthesize_transcripts_pdf)


def test_pipeline_resume(spark, tmp_path):
    tr = spark.createDataFrame(synthesize_transcripts_pdf(30, seed=5))
    root = tmp_path / "idx"
    p1 = StagedIndexBuild(spark, str(root), run_id="run1")
    s1 = p1.run(tr, shard_span=64, merge_factor=4)
    assert set(s1.values()) == {"built"}
    baseline = {(r["term"], r["doc_id"]): (r["tf"], r["dl"])
                for r in unpack_to_rows(p1.read("merged", "data")).collect()}

    # simulated kill after 'stats': later stages lose their commits
    shutil.rmtree(root / "packed")
    shutil.rmtree(root / "merged")
    p2 = StagedIndexBuild(spark, str(root), run_id="run2")
    s2 = p2.run(tr, shard_span=64, merge_factor=4)
    assert s2 == {"docs": "skipped", "term_doc_tf": "skipped",
                  "stats": "skipped", "packed": "built", "merged": "built"}
    resumed = {(r["term"], r["doc_id"]): (r["tf"], r["dl"])
               for r in unpack_to_rows(p2.read("merged", "data")).collect()}
    assert resumed == baseline

    # idempotent full re-run: everything skipped
    s3 = StagedIndexBuild(spark, str(root), run_id="run3").run(
        tr, shard_span=64, merge_factor=4)
    assert set(s3.values()) == {"skipped"}

    # lineage records both runs, with per-shard rows for packed/merged
    lin = p2.lineage().collect()
    assert {r["run_id"] for r in lin} == {"run1", "run2"}
    packed_rows = [r for r in lin if r["stage"] == "packed" and r["run_id"] == "run2"]
    assert packed_rows and all(r["bytes"] > 0 and r["doc_count"] > 0
                               and r["term_lo"] <= r["term_hi"] for r in packed_rows)
