"""Structured Streaming parity: availableNow-drained stream results must
equal the identical batch plan over the same files."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from mini_distributed_search_engine_spark.streaming.events import (
    dedup_stream, read_event_stream, run_available_now, windowed_counts)

SRC = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(SRC, d / "part-0.parquet")
    return str(d)


def test_windowed_counts_stream_equals_batch(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir)
    got = run_available_now(windowed_counts(stream), "wc_stream", mode="complete")
    batch = windowed_counts(spark.read.parquet(stream_dir))
    want = {(r["w_start_epoch"], r["event_type"]): (r["cnt"], r["total_value"])
            for r in batch.collect()}
    got_m = {(r["w_start_epoch"], r["event_type"]): (r["cnt"], r["total_value"])
             for r in got.collect()}
    assert got_m == want and len(want) > 0


def test_dedup_stream(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir)
    got = run_available_now(dedup_stream(stream), "dedup_stream")
    n_src = spark.read.parquet(stream_dir).count()
    assert got.count() == spark.read.parquet(stream_dir).dropDuplicates(
        ["event_id"]).count() == n_src  # event_ids unique in fixture
