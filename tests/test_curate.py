"""Corpus curation job: the dedup -> lang -> quality funnel composes the
tested ops and only ever narrows the corpus, keeping canonical docs."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "jobs"))


def test_curate_funnel(spark):
    from curate_job import curate
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    curated, report = curate(spark, docs, langs=("en",), min_quality=0.1)
    assert (report["docs_in"] >= report["after_dedup"]
            >= report["after_lang"] >= report["after_quality"] > 0)
    assert curated.count() == report["after_quality"]
    # curated is a subset of the input with the full document schema
    assert curated.columns == docs.columns
    # duplicates kept exactly one canonical copy
    from mini_distributed_search_engine_spark.functions.dedup import exact_dedup
    d = exact_dedup(curated)
    assert d.where("doc_id <> canonical_id").count() == 0


def test_curate_quality_threshold_monotone(spark):
    from curate_job import curate
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    _, loose = curate(spark, docs, langs=("en",), min_quality=0.0)
    _, tight = curate(spark, docs, langs=("en",), min_quality=0.8)
    assert tight["after_quality"] <= loose["after_quality"]
