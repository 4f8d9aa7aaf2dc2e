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


def test_curate_full_funnel_with_decontam_and_redaction(spark):
    from pyspark.sql import functions as F
    from curate_job import curate
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # plant PII into a known doc so the redaction pass has work
    docs = docs.withColumn(
        "text", F.when(F.col("doc_id") == 0,
                       F.concat(F.col("text"), F.lit(" mail a@b.co now")))
        .otherwise(F.col("text")))
    bench = docs.where("doc_id % 11 = 0").select("doc_id", "text")
    curated, rep = curate(spark, docs, langs=("en",), min_quality=0.0,
                          max_repetition=0.95, benchmark=bench,
                          decontam_k=3, redact=True)
    assert (rep["docs_in"] >= rep["after_dedup"] >= rep["after_lang"]
            >= rep["after_quality"] >= rep["after_repetition"]
            >= rep["after_decontam"] > 0)
    assert curated.count() == rep["after_decontam"]
    assert curated.columns == docs.columns
    # benchmark members (which share all their 3-grams with themselves)
    # are gone whenever they survived the earlier stages
    survivors = {r["doc_id"] for r in curated.select("doc_id").collect()}
    assert not survivors & {r["doc_id"] for r in bench.collect()}
    # PII got scrubbed if doc 0 survived; either way no raw email remains
    leaked = curated.where(F.col("text").rlike(
        "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+")).count()
    assert leaked == 0 and rep["pii_redactions"] >= 0
