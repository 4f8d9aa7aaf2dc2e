"""Same-window A/B: lazy block-decode WAND vs forced eager full() decode.

Settles VERDICT r3 "What's wrong" #4: WAND per-query p50 drifted from
0.325 s (r1) to 0.409 s (r3) while exhaustive p50 and batch throughput
improved. BENCH.md's hypothesis is that on the bench corpus — near-
constant dl, so block-max pruning is inert — the lazy offset/block path
is pure overhead vs a one-shot decode, and the drift is either that
overhead or scheduling-floor noise. This tool measures exactly that:
the SAME packed cache, the SAME queries, the two kernel modes
INTERLEAVED run-by-run (so noisy-neighbor windows hit both equally),
min-of-N per (query, mode) per the noisy-VM methodology.

Usage:  python tools/wand_ab.py [n_turns] [runs]
Prints one JSON line with per-query times for both modes and the p50s.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mini_distributed_search_engine_spark.index.build import build_index
from mini_distributed_search_engine_spark.index.packed import (
    build_packed_postings, merge_packed)
from mini_distributed_search_engine_spark.query.wand import wand_topk
from mini_distributed_search_engine_spark.session import get_spark
from mini_distributed_search_engine_spark.sources.transcripts import (
    TURNS_PER_CONV, synthesize_transcripts)

from bench import BENCH_QUERIES  # noqa: E402  (repo root on sys.path)


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = 32
    spark = get_spark("mdse-wand-ab", cores=cpus, shuffle_partitions=cpus)

    base = Path("/dev/shm/mdse_bench") if Path("/dev/shm").is_dir() \
        else Path(__file__).resolve().parent.parent / ".data"
    out_dir = base / "wand_ab"
    shutil.rmtree(out_dir, ignore_errors=True)

    idx = build_index(synthesize_transcripts(
        spark, max(1, n_turns // TURNS_PER_CONV)))
    avgdl = float(idx.doc_stats.collect()[0]["avgdl"])
    packed = build_packed_postings(
        idx.term_doc_tf, avgdl, shard_span=max(4096, n_turns // (4 * cpus)))
    merge_packed(packed, level_factor=4).write.mode("overwrite").parquet(
        str(out_dir / "packed"))
    doc_stats = idx.doc_stats
    stats_row = doc_stats.collect()[0]
    corpus_stats = (int(stats_row["n_docs"]), float(stats_row["avgdl"]))
    packed_r = (spark.read.parquet(str(out_dir / "packed"))
                .repartition(cpus, "shard_id").cache())
    packed_r.count()

    # untimed warmup: codegen + Arrow workers, both modes
    for eager in (False, True):
        wand_topk(spark, packed_r, doc_stats, queries=BENCH_QUERIES[:2],
                  corpus_stats=corpus_stats, eager_decode=eager).collect()

    lazy: dict[str, float] = {}
    eager: dict[str, float] = {}
    for q in BENCH_QUERIES:
        bl = be = float("inf")
        for _ in range(runs):          # interleaved: noise hits both modes
            t = time.perf_counter()
            wand_topk(spark, packed_r, doc_stats, queries=(q,),
                      corpus_stats=corpus_stats).collect()
            bl = min(bl, time.perf_counter() - t)
            t = time.perf_counter()
            wand_topk(spark, packed_r, doc_stats, queries=(q,),
                      corpus_stats=corpus_stats, eager_decode=True).collect()
            be = min(be, time.perf_counter() - t)
        lazy[q.query_id] = round(bl, 4)
        eager[q.query_id] = round(be, 4)

    p50 = lambda d: sorted(d.values())[len(d) // 2]
    print(json.dumps({
        "turns": n_turns, "runs": runs, "cpus": cpus,
        "lazy": lazy, "eager": eager,
        "lazy_p50_sec": p50(lazy), "eager_p50_sec": p50(eager),
        "lazy_sum_sec": round(sum(lazy.values()), 4),
        "eager_sum_sec": round(sum(eager.values()), 4),
    }))
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
