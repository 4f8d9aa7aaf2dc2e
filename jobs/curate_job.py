"""spark-submit entrypoint: corpus CURATION — the training-data pipeline
the individual ops exist for, composed end to end.

    documents parquet
      -> exact dedup        (keep each text group's canonical doc)
      -> language filter    (keep docs whose predicted lang is allowed)
      -> quality filter     (keep docs with quality >= threshold)
      -> curated parquet + one-line JSON funnel report

Every stage is a declarative DataFrame transform over the already-tested
ops (functions/dedup.py, functions/textstats.py), so the whole job is
shuffle-minimal: one md5-groupBy (dedup), one token aggregation shared by
lang-id and quality, and semi-joins for the keeps. At 100 TB this runs
exactly as written — no collects besides the funnel counts.

Usage:
  spark-submit --py-files mdse.zip jobs/curate_job.py \\
      --documents /data/sf/documents.parquet --out /data/curated \\
      [--langs en] [--min-quality 0.3]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mini_distributed_search_engine_spark.functions.dedup import exact_dedup
from mini_distributed_search_engine_spark.functions.textstats import (
    lang_id, quality_score)
from mini_distributed_search_engine_spark.session import get_spark


def curate(spark: SparkSession, docs: DataFrame, langs: tuple[str, ...],
           min_quality: float) -> tuple[DataFrame, dict]:
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
    curated = langed.join(keep_q, "doc_id", "semi").persist()
    n_q = curated.count()
    langed.unpersist()

    report = {"docs_in": n_in, "after_dedup": n_dedup,
              "after_lang": n_lang, "after_quality": n_q,
              "kept_frac": round(n_q / n_in, 4) if n_in else 0.0,
              "langs": list(langs), "min_quality": min_quality}
    return curated, report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--langs", default="en",
                    help="comma-separated allowed languages")
    ap.add_argument("--min-quality", type=float, default=0.3)
    args = ap.parse_args()

    spark = get_spark("mdse-curate")
    docs = spark.read.parquet(args.documents)
    curated, report = curate(spark, docs,
                             tuple(args.langs.split(",")), args.min_quality)
    curated.write.mode("overwrite").parquet(args.out)
    curated.unpersist()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
