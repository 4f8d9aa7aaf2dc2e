"""spark-submit entrypoint: corpus CURATION — the training-data pipeline
the individual ops exist for, composed end to end.

    documents parquet
      -> exact dedup        (keep each text group's canonical doc)
      -> language filter    (keep docs whose predicted lang is allowed)
      -> quality filter     (keep docs with quality >= threshold)
      -> repetition filter  (drop boilerplate: dup-word fraction cap)
      -> decontamination    (optional: drop docs sharing any word k-gram
                             with a benchmark parquet — GPT-3-style)
      -> PII redaction      (emails/phones/IPv4s scrubbed from the text)
      -> curated parquet + one-line JSON funnel report

Every stage is a declarative DataFrame transform over the already-tested
ops (functions/dedup.py, functions/textstats.py), so the whole job is
shuffle-minimal: one md5-groupBy (dedup), one token aggregation shared by
lang-id and quality, an array-expression pass (repetition), a broadcast
join against the benchmark shingles (decontamination), a narrow regexp
map (redaction), and semi-joins for the keeps. At 100 TB this runs
exactly as written — no collects besides the funnel counts.

Usage:
  spark-submit --py-files mdse.zip jobs/curate_job.py \\
      --documents /data/sf/documents.parquet --out /data/curated \\
      [--langs en] [--min-quality 0.3] [--max-repetition 0.9] \\
      [--benchmark /data/eval_docs.parquet] [--no-redact]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mini_distributed_search_engine_spark.functions.dedup import (
    decontaminate, exact_dedup)
from mini_distributed_search_engine_spark.functions.textstats import (
    lang_id, quality_score, redact_pii, repetition_stats)
from mini_distributed_search_engine_spark.session import get_spark


def curate(spark: SparkSession, docs: DataFrame, langs: tuple[str, ...],
           min_quality: float, max_repetition: float = 0.9,
           benchmark: DataFrame | None = None, decontam_k: int = 13,
           redact: bool = True) -> tuple[DataFrame, dict]:
    """Returns (curated docs, funnel report). Pure transforms; counts are
    the only actions. The returned frame is still PERSISTED (the caller's
    write would otherwise re-run the whole funnel) — the caller owns the
    final ``curated.unpersist()`` once it has consumed the frame."""
    # persist each surviving stage: the funnel counts AND the final write
    # would otherwise re-run every upstream stage (dedup md5-groupBy,
    # token aggregations) up to 5x
    docs = docs.persist()
    n_in = docs.count()
    canon = (exact_dedup(docs)
             .where(F.col("doc_id") == F.col("canonical_id"))
             .select("doc_id"))
    deduped = docs.join(canon, "doc_id", "semi").persist()
    n_dedup = deduped.count()
    docs.unpersist()

    keep_lang = (lang_id(deduped)
                 .where(F.col("lang_pred").isin(list(langs)))
                 .select("doc_id"))
    langed = deduped.join(keep_lang, "doc_id", "semi").persist()
    n_lang = langed.count()
    deduped.unpersist()

    keep_q = (quality_score(langed)
              .where(F.col("quality") >= min_quality)
              .select("doc_id"))
    qualed = langed.join(keep_q, "doc_id", "semi").persist()
    n_q = qualed.count()
    langed.unpersist()

    # boilerplate / degenerate-text cap (Gopher-style repetition filter)
    keep_rep = (repetition_stats(qualed)
                .where(F.col("dup_word_frac") <= max_repetition)
                .select("doc_id"))
    curated = qualed.join(keep_rep, "doc_id", "semi").persist()
    n_rep = curated.count()
    qualed.unpersist()

    n_decon = n_rep
    if benchmark is not None:
        # drop every doc sharing any word k-gram with the benchmark set
        # (the bench side broadcasts — see dedup.decontaminate)
        hits = (decontaminate(curated, benchmark, k=decontam_k)
                .select("doc_id").distinct())
        clean = curated.join(hits, "doc_id", "anti").persist()
        n_decon = clean.count()
        curated.unpersist()
        curated = clean

    n_redactions = 0
    if redact:
        red = redact_pii(curated)
        n_redactions = int(red.agg(
            F.sum(F.col("n_email") + F.col("n_phone") + F.col("n_ipv4"))
        ).collect()[0][0] or 0)
        out = (curated.drop("text")
               .join(red.select("doc_id",
                                F.col("text_redacted").alias("text")),
                     "doc_id").select(*docs.columns).persist())
        out.count()
        curated.unpersist()
        curated = out

    report = {"docs_in": n_in, "after_dedup": n_dedup,
              "after_lang": n_lang, "after_quality": n_q,
              "after_repetition": n_rep, "after_decontam": n_decon,
              "pii_redactions": n_redactions,
              "kept_frac": round(n_decon / n_in, 4) if n_in else 0.0,
              "langs": list(langs), "min_quality": min_quality,
              "max_repetition": max_repetition}
    return curated, report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--langs", default="en",
                    help="comma-separated allowed languages")
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--max-repetition", type=float, default=0.9,
                    help="drop docs whose duplicate-word fraction exceeds "
                         "this (boilerplate/degenerate text)")
    ap.add_argument("--benchmark", default=None,
                    help="parquet of benchmark docs (doc_id, text); docs "
                         "sharing any word 13-gram with it are dropped")
    ap.add_argument("--no-redact", action="store_true",
                    help="skip the PII redaction pass")
    args = ap.parse_args()

    spark = get_spark("mdse-curate")
    docs = spark.read.parquet(args.documents)
    bench = (spark.read.parquet(args.benchmark)
             if args.benchmark else None)
    curated, report = curate(spark, docs,
                             tuple(args.langs.split(",")), args.min_quality,
                             max_repetition=args.max_repetition,
                             benchmark=bench, redact=not args.no_redact)
    curated.write.mode("overwrite").parquet(args.out)
    curated.unpersist()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
