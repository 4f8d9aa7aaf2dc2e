"""Incremental streaming storage guarantees: a micro-batch writes O(batch)
segment bytes (not a rewrite of the whole index), superseded generation
files are garbage-collected, and a foreign checkpoint over an existing
index root fails loudly instead of silently skipping batches."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from mini_distributed_search_engine_spark.sources.transcripts import (
    synthesize_transcripts_pdf)
from mini_distributed_search_engine_spark.streaming.indexing import (
    StreamingIndexer, read_transcript_stream)

SPAN = 64


def _dir_bytes(p: Path) -> int:
    return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_inc")
    yield root
    shutil.rmtree(root, ignore_errors=True)


def test_small_batch_writes_small_bytes_and_prunes(spark, roots):
    pdf = synthesize_transcripts_pdf(155, seed=321)   # 620 turns
    src = roots / "in"
    src.mkdir()
    n = len(pdf)
    big, small = pdf.iloc[:n - 20], pdf.iloc[n - 20:]
    spark.createDataFrame(big).coalesce(1).write.parquet(str(src / "p0.parquet"))
    spark.createDataFrame(small).coalesce(1).write.parquet(str(src / "p1.parquet"))

    idx_root = roots / "idx"
    indexer = StreamingIndexer(spark, str(idx_root), shard_span=SPAN)
    q = indexer.start(read_transcript_stream(spark, str(src)))
    q.awaitTermination(120)

    meta = indexer._meta()
    assert meta["generation"] == 2 and meta["n_docs"] == n
    man = meta["manifest"]
    assert [e["path"] for e in man] == ["segs_g1", "segs_g2"]
    # batch 2 indexed 20/620 turns: its segment file must be a small
    # fraction of the bulk file, not a rewritten copy of the index
    b1 = _dir_bytes(idx_root / "segs_g1")
    b2 = _dir_bytes(idx_root / "segs_g2")
    assert b2 < b1 / 3, (b1, b2)
    # only manifest-referenced segment dirs remain on disk; only the
    # current generation's totals remain
    seg_dirs = sorted(p.name for p in idx_root.glob("segs_g*"))
    assert seg_dirs == ["segs_g1", "segs_g2"]
    tot_dirs = sorted(p.name for p in idx_root.glob("totals_g*"))
    assert tot_dirs == ["totals_g2"]
    # the small batch's entry starts at the spliced boundary shard
    assert man[1]["start_shard"] == (n - 20) // SPAN


def test_foreign_checkpoint_fails_loudly(spark, roots):
    idx_root = roots / "idx"
    indexer = StreamingIndexer(spark, str(idx_root), shard_span=SPAN)
    indexer._checkpoint_id = "file:///somewhere/else/_checkpoint"
    batch = spark.createDataFrame(synthesize_transcripts_pdf(3, seed=9))
    with pytest.raises(RuntimeError, match="checkpoint"):
        indexer.process_batch(batch, 0)
    # and the index was not touched
    assert indexer._meta()["generation"] == 2


def test_same_checkpoint_restart_skips_batches(spark, roots):
    idx_root = roots / "idx"
    indexer = StreamingIndexer(spark, str(idx_root), shard_span=SPAN)
    before = indexer._meta()
    q = indexer.start(read_transcript_stream(spark, str(roots / "in")))
    q.awaitTermination(120)
    after = indexer._meta()
    assert after["n_docs"] == before["n_docs"]
    assert after["generation"] == before["generation"]


def test_streaming_lineage_rows(spark, roots):
    """Each committed batch leaves one lineage row with its byte cost."""
    lineage = spark.read.parquet(str(roots / "idx" / "_lineage")).collect()
    stages = {r["run_id"]: r for r in lineage}
    assert {"batch_0", "batch_1"} <= set(stages)
    assert all(r["stage"] == "stream_append" for r in lineage)
    assert stages["batch_0"]["doc_count"] == 600
    assert stages["batch_1"]["doc_count"] == 20
    assert 0 < stages["batch_1"]["bytes"] < stages["batch_0"]["bytes"]
    assert all(r["wall_ms"] > 0 for r in lineage)
