"""spark-submit entrypoint: stream transcript parquet files into a packed
inverted index via incremental appends (streaming/indexing.py sink).

Usage:
  spark-submit --py-files mdse.zip jobs/stream_index_job.py \\
      --in /data/incoming_transcripts --out /data/stream_index \\
      [--shard-span 1048576] [--follow]

Without --follow the job drains whatever is in the source (availableNow)
and exits — suitable for cron-style incremental refresh; with --follow it
keeps watching the directory (micro-batch per arriving file).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mini_distributed_search_engine_spark.session import get_spark
from mini_distributed_search_engine_spark.streaming.indexing import (
    StreamingIndexer, read_transcript_stream)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--shard-span", type=int, default=1 << 20)
    ap.add_argument("--follow", action="store_true",
                    help="keep running instead of drain-and-exit")
    ap.add_argument("--compact-after", type=int, default=0, metavar="K",
                    help="after draining, consolidate the manifest if it "
                         "has more than K entries (0 = never); appends are "
                         "O(batch) but leave one dir per micro-batch, so "
                         "cron runs should compact periodically")
    ap.add_argument("--tombstones", default=None, metavar="FILE",
                    help="newline-separated doc ids to purge during the "
                         "post-drain compaction (the delete half of the "
                         "LSM lifecycle; forces a compact even under "
                         "--compact-after's threshold)")
    ap.add_argument("--with-positions", action="store_true",
                    help="maintain the packed positional index beside the "
                         "TF segments (phrase/proximity/span serving off "
                         "the stream state); fresh roots only")
    args = ap.parse_args()
    if args.follow and args.tombstones:
        ap.error("--tombstones needs the drain-and-exit mode (compaction "
                 "runs post-drain; a --follow stream never reaches it)")

    spark = get_spark("mdse-stream-index")
    indexer = StreamingIndexer(spark, args.out, shard_span=args.shard_span,
                               with_positions=args.with_positions)
    stream = read_transcript_stream(spark, args.input)
    if args.follow:
        q = (stream.writeStream
             .foreachBatch(indexer.process_batch)
             .option("checkpointLocation", f"{args.out}/_checkpoint")
             .start())
        q.awaitTermination()
    else:
        q = indexer.start(stream)
        q.awaitTermination()
        tomb = None
        if args.tombstones:
            with open(args.tombstones) as fh:
                tomb = [int(ln) for ln in fh if ln.strip()]
        if tomb or (args.compact_after
                    and len(indexer._manifest(indexer._meta()))
                    > args.compact_after):
            print(f"compact: {indexer.compact(tombstones=tomb)}")
        n, avgdl = indexer.corpus_stats()
        print(f"docs={n} avgdl={avgdl:.3f} "
              f"generation={indexer._meta()['generation']}")


if __name__ == "__main__":
    main()
