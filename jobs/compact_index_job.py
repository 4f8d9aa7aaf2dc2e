"""spark-submit entrypoint: fold recorded tombstones into a batch index root.

The compaction half of the batch delete lifecycle (the reference has no
delete path at all — its Indexer is build-once, `jobs/Indexer.java`):
serving engines record deletes as O(1) metadata (`POST /delete` then
`POST /checkpoint`, or `StagedIndexBuild.record_tombstones` directly);
this job runs `StagedIndexBuild.purge()`, which rewrites every committed
stage — row layouts anti-joined, packed segments range-gated re-encode
(untouched segments byte-identical), stats RECOMPUTED over survivors —
then clears the pending set. Idempotent and crash-safe (a re-run heals a
torn root), so it can run from cron against a live root; restart serving
engines afterwards to drop their query-time masks.

Usage:
  spark-submit --py-files mdse.zip jobs/compact_index_job.py \
      --root /data/index_root [--ids 17,42,99]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mini_distributed_search_engine_spark.plans.pipeline import StagedIndexBuild
from mini_distributed_search_engine_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="StagedIndexBuild index root to compact")
    ap.add_argument("--ids", default=None, metavar="CSV",
                    help="explicit doc ids to purge instead of (and "
                         "without clearing) the recorded pending set")
    args = ap.parse_args()

    spark = get_spark("mdse-compact")
    b = StagedIndexBuild(spark, args.root)
    if args.ids is not None:
        ids = [int(x) for x in args.ids.split(",") if x.strip()]
        if not ids:
            ap.error("--ids given but empty")
        res = b.purge(ids)
    else:
        pending = b.pending_tombstones()
        if not pending:
            print(json.dumps({"purged_docs": 0, "note": "no pending "
                              "tombstones recorded under this root"}))
            return
        res = b.purge()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
