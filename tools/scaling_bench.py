"""Scaling evidence for the north rule's two-cluster-size criterion.

No real cluster exists in this sandbox, so the same job (identical input,
identical code) runs at local[N] and local[4N] in separate JVMs; we report
both throughputs and efficiency = (T8_wall / T32_wall) / 4 for the BUILD
phase (throughput-scaling) in BENCH.md.

Run: python tools/scaling_bench.py [turns]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run_once(cpus: int, turns: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               MDSE_BENCH_TURNS=str(turns), MDSE_BENCH_BUILD_ONLY="1")
    out = subprocess.run([sys.executable, str(ROOT / "bench.py")], env=env,
                         capture_output=True, text=True, timeout=1800)
    r = json.loads(out.stdout.strip().splitlines()[-1])
    print(f"  local[{cpus}]: {r['build_sec']}s "
          f"({r['turns_per_sec']} turns/s)", flush=True)
    return r


def run_pair(n: int, turns: int, repeats: int = 3) -> tuple[dict, dict]:
    """Best-of-N per level, INTERLEAVED (N, 4N, N, 4N, ...): the sandbox
    shares cores with other tenants whose load drifts on minute scales, so
    interleaving samples both levels under the same conditions and min wall
    is the least-noise estimate of each level's true throughput."""
    best_lo = best_hi = None
    for _ in range(repeats):
        r_lo = run_once(n, turns)
        r_hi = run_once(4 * n, turns)
        if best_lo is None or r_lo["build_sec"] < best_lo["build_sec"]:
            best_lo = r_lo
        if best_hi is None or r_hi["build_sec"] < best_hi["build_sec"]:
            best_hi = r_hi
    return best_lo, best_hi


def main() -> None:
    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n = int(os.environ.get("MDSE_SCALE_N", "4"))
    repeats = int(os.environ.get("MDSE_SCALE_REPEATS", "3"))
    r8, r32 = run_pair(n, turns, repeats=repeats)
    tp8, tp32 = r8["turns_per_sec"], r32["turns_per_sec"]
    eff = (tp32 / tp8) / 4.0
    report = {
        "turns": turns,
        "low": {"build_sec": r8["build_sec"], "turns_per_sec": tp8,
                   "query_p50_sec": r8["query_p50_sec"]},
        "high": {"build_sec": r32["build_sec"], "turns_per_sec": tp32,
                    "query_p50_sec": r32["query_p50_sec"]},
        "speedup_N_to_4N": round(tp32 / tp8, 3),
        "scaling_efficiency_N_to_4N": round(eff, 3),
    }
    print(json.dumps(report, indent=2))
    md = f"""# BENCH — scaling evidence (N vs 4N parallelism)

Same job, same deterministic input ({turns:,} synthesized transcript turns,
seed=42), identical code, two parallelism levels in separate JVMs
(the sandbox stand-in for N vs 4N executors per BASELINE.json north_rule).

| level | build wall (s) | build throughput (turns/s) | query p50 (s) |
|---|---|---|---|
| local[{n}]  (N)  | {r8['build_sec']} | {tp8:,.1f} | {r8['query_p50_sec']} |
| local[{4 * n}] (4N) | {r32['build_sec']} | {tp32:,.1f} | {r32['query_p50_sec']} |

**Speedup N→4N ({n}→{4 * n} cores): {tp32 / tp8:.2f}x -> scaling efficiency {eff:.2f}**
(target ≥ 0.8 per north rule).

Notes:
* Build = full staged pipeline to parquet (stable docIDs, analyze+stem, TF,
  stats, term-clustered layout), untimed JIT warmup excluded.
* Both levels share one JVM/driver and one machine's memory bandwidth;
  a real 4N-executor cluster scales those with N, so this efficiency is a
  conservative lower bound.
* Scaling runs are build-only (MDSE_BENCH_BUILD_ONLY=1); query latency is
  scheduling-floor-bound in local mode (~0.3 s/job) and reported by the
  regular `python bench.py` run instead.

<!-- scaling-section-end -->
"""
    # Rewrite only the scaling section; preserve everything after the
    # end marker (latency tables, full-bench JSON) across re-runs.
    path = ROOT / "BENCH.md"
    marker = "<!-- scaling-section-end -->"
    tail = ""
    if path.exists() and marker in path.read_text():
        tail = path.read_text().split(marker, 1)[1]
    path.write_text(md + tail)
    print("wrote BENCH.md")


if __name__ == "__main__":
    main()
