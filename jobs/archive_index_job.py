"""spark-submit entrypoint: move a packed index between the hot (varint,
serving) and cold (PForDelta, ~0.5x at rest) tiers.

The cold tier is `index/codec_pfd.py`'s archive format: the three posting
value streams re-encoded as NewPFD blocks, serving-only skip metadata
(block-max norms, byte offsets) dropped — it is a deterministic function
of the postings plus the stored enc_avgdl, so `--restore` rebuilds it
exactly (byte-identical for canonically-blocked segments, test-enforced).
Narrow per-segment transcode both ways: no shuffle, no driver data.

Both index families archive: ``--kind tf`` (the default) moves packed TF
posting segments, ``--kind positions`` the packed positional segments
(the biggest structure at rest and the best PFD fit — per-doc position
deltas are 1-3-bit values that each cost varint a full byte).

Usage:
  spark-submit --py-files mdse.zip jobs/archive_index_job.py \
      --packed /data/index/packed --out /cold/index.pfd           # archive
  spark-submit --py-files mdse.zip jobs/archive_index_job.py \
      --restore /cold/index.pfd --out /data/index/packed_restored
  spark-submit --py-files mdse.zip jobs/archive_index_job.py \
      --kind positions --packed /data/index/positions_packed \
      --out /cold/pos.pfd
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mini_distributed_search_engine_spark.index.codec_pfd import (
    POS_STREAMS, TF_STREAMS, archive_packed, archive_positions,
    restore_packed, restore_positions)
from mini_distributed_search_engine_spark.session import get_spark


def _stats(df, streams) -> tuple[int, int]:
    """(segment count, total stream bytes) in ONE scan — the stream blobs
    are the bulk of the index, so every extra pass over them costs real
    wall time on a big root."""
    total = None
    for c in streams:
        e = F.sum(F.length(c))
        total = e if total is None else total + e
    row = df.agg(F.count(F.lit(1)).alias("n"), total.alias("b")).collect()[0]
    return int(row["n"]), int(row["b"] or 0)


_KINDS = {
    "tf": (archive_packed, restore_packed, TF_STREAMS),
    "positions": (archive_positions, restore_positions, POS_STREAMS),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--packed", help="hot-tier packed index parquet to archive")
    g.add_argument("--restore", help="cold-tier PFD archive parquet to restore")
    ap.add_argument("--out", required=True, help="output parquet directory")
    ap.add_argument("--kind", choices=sorted(_KINDS), default="tf",
                    help="which segment family: TF postings or positions")
    args = ap.parse_args()

    archive_fn, restore_fn, streams = _KINDS[args.kind]
    spark = get_spark("mdse-archive")
    if args.packed:
        src = spark.read.parquet(args.packed)
        archive_fn(src).write.mode("overwrite").parquet(args.out)
        n, cold_b = _stats(spark.read.parquet(args.out), streams)
        _, hot_b = _stats(src, streams)
        res = {"mode": "archive", "kind": args.kind, "segments": n,
               "hot_stream_bytes": hot_b, "cold_stream_bytes": cold_b}
    else:
        restore_fn(spark.read.parquet(args.restore)).write \
            .mode("overwrite").parquet(args.out)
        res = {"mode": "restore", "kind": args.kind,
               "segments": spark.read.parquet(args.out).count()}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
