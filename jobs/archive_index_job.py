"""spark-submit entrypoint: move a packed index between the hot (varint,
serving) and cold (PForDelta, ~0.5x at rest) tiers.

The cold tier is `index/codec_pfd.py`'s archive format: the three posting
value streams re-encoded as NewPFD blocks, serving-only skip metadata
(block-max norms, byte offsets) dropped — it is a deterministic function
of the postings plus the stored enc_avgdl, so `--restore` rebuilds it
exactly (byte-identical for canonically-blocked segments, test-enforced).
Narrow per-segment transcode both ways: no shuffle, no driver data.

Usage:
  spark-submit --py-files mdse.zip jobs/archive_index_job.py \
      --packed /data/index/packed --out /cold/index.pfd           # archive
  spark-submit --py-files mdse.zip jobs/archive_index_job.py \
      --restore /cold/index.pfd --out /data/index/packed_restored
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mini_distributed_search_engine_spark.index.codec_pfd import (
    archive_packed, restore_packed)
from mini_distributed_search_engine_spark.session import get_spark


def _stream_bytes(df) -> int:
    return int(df.agg(
        (F.sum(F.length("doc_gaps")) + F.sum(F.length("tfs"))
         + F.sum(F.length("dls"))).alias("b")).collect()[0]["b"] or 0)


def main() -> None:
    ap = argparse.ArgumentParser()
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--packed", help="hot-tier packed index parquet to archive")
    g.add_argument("--restore", help="cold-tier PFD archive parquet to restore")
    ap.add_argument("--out", required=True, help="output parquet directory")
    args = ap.parse_args()

    spark = get_spark("mdse-archive")
    if args.packed:
        src = spark.read.parquet(args.packed)
        out = archive_packed(src)
        out.write.mode("overwrite").parquet(args.out)
        res = {"mode": "archive", "segments": spark.read.parquet(args.out).count(),
               "hot_stream_bytes": _stream_bytes(src),
               "cold_stream_bytes": _stream_bytes(spark.read.parquet(args.out))}
    else:
        out = restore_packed(spark.read.parquet(args.restore))
        out.write.mode("overwrite").parquet(args.out)
        res = {"mode": "restore",
               "segments": spark.read.parquet(args.out).count()}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
