"""Same-window A/B: window global rank vs driver-side heap merge.

VERDICT r4 next-round #3: `wand_topk`'s final Window.partitionBy(query_id)
adds one exchange + stage per warm query over <= shards x k candidate
rows; the serving alternative collects the per-shard top-k and merges
driver-side with the identical ordering (the reference Searcher's own
PriorityQueue shape, `jobs/Searcher.java:234-244`, at metadata scale).
This measures the warm single-query latency delta between the two modes:
the SAME packed cache, the SAME queries, both modes INTERLEAVED
run-by-run (noisy-neighbor windows hit both equally), min-of-N per
(query, mode) per the noisy-VM methodology. Rank identity between the
modes is pytest-enforced (tests/test_wand.py::test_driver_rank_identity);
this tool is latency-only.

Usage:  python tools/rank_ab.py [n_turns] [runs]
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
    spark = get_spark("mdse-rank-ab", cores=cpus, shuffle_partitions=cpus)

    base = Path("/dev/shm/mdse_bench") if Path("/dev/shm").is_dir() \
        else Path(__file__).resolve().parent.parent / ".data"
    out_dir = base / "rank_ab"
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
    for fr in ("window", "driver"):
        wand_topk(spark, packed_r, doc_stats, queries=BENCH_QUERIES[:2],
                  corpus_stats=corpus_stats, final_rank=fr).collect()

    window: dict[str, float] = {}
    driver: dict[str, float] = {}
    for q in BENCH_QUERIES:
        bw = bd = float("inf")
        for _ in range(runs):          # interleaved: noise hits both modes
            t = time.perf_counter()
            wand_topk(spark, packed_r, doc_stats, queries=(q,),
                      corpus_stats=corpus_stats).collect()
            bw = min(bw, time.perf_counter() - t)
            t = time.perf_counter()
            wand_topk(spark, packed_r, doc_stats, queries=(q,),
                      corpus_stats=corpus_stats,
                      final_rank="driver").collect()
            bd = min(bd, time.perf_counter() - t)
        window[q.query_id] = round(bw, 4)
        driver[q.query_id] = round(bd, 4)

    p50 = lambda d: sorted(d.values())[len(d) // 2]
    print(json.dumps({
        "turns": n_turns, "runs": runs, "cpus": cpus,
        "window": window, "driver": driver,
        "window_p50_sec": p50(window), "driver_p50_sec": p50(driver),
        "window_sum_sec": round(sum(window.values()), 4),
        "driver_sum_sec": round(sum(driver.values()), 4),
    }))
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
