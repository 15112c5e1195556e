#!/usr/bin/env python
"""Characterize bench.py's process-to-process FPS noise (±0.7 observed).

Runs the PARITY mode N times: half as fresh subprocesses (BENCH_BUDGET_S=1
so each prints only the parity line), half as repeated measurements inside
ONE process, and decomposes variance into within-process (chunk-to-chunk)
vs between-process components. The within-process chunk rates come from
running measure() with BENCH_CHUNKS chunks and reading the per-chunk
medians spread.

Usage (chip free, warm .jax_cache):
    python tools/noise_bench.py --runs 8
Writes docs-ready lines to stdout; paste into docs/PERFORMANCE.md.
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

import numpy as np


def one_subprocess_run(repo, extra_env=None):
    env = dict(os.environ)
    env.update({"BENCH_BUDGET_S": "1"})  # parity only
    env.update(extra_env or {})
    p = subprocess.run([sys.executable, "bench.py"], cwd=repo, env=env,
                       capture_output=True, text=True, timeout=900)
    line = [l for l in p.stdout.splitlines() if l.startswith("{")]
    if not line:
        raise RuntimeError(f"no JSON from bench.py: {p.stderr[-500:]}")
    return json.loads(line[-1])["parity_fps"]


def within_process_rates(n_chunks=8, chunk=32):
    """Per-chunk frame rates inside one tracker session (one process).

    Reuses bench.measure's OWN timing loop (return_rates=True) so this
    decomposition always measures exactly what bench.py measures.
    """
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import bench

    H = W = int(os.environ.get("BENCH_SIZE", 512))
    rng = np.random.default_rng(0)
    n_warm = 4
    frames = [rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
              for _ in range(1 + n_warm + chunk * n_chunks)]
    return bench.measure(bench.make_tracker(), frames, n_warm, chunk,
                         n_chunks, return_rates=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=8)
    ap.add_argument("--chunks", type=int, default=8)
    args = ap.parse_args()
    repo = Path(__file__).resolve().parent.parent

    within = within_process_rates(n_chunks=args.chunks)
    print(f"within-process chunk rates: "
          f"{[round(r, 2) for r in within]}")
    print(f"within-process: median {statistics.median(within):.2f}, "
          f"stdev {statistics.stdev(within):.3f} FPS over {args.chunks} "
          f"chunks of 32")

    runs = []
    for i in range(args.runs):
        fps = one_subprocess_run(repo)
        runs.append(fps)
        print(f"run {i}: parity {fps:.2f}", flush=True)
    print(f"between-process: median {statistics.median(runs):.2f}, "
          f"stdev {statistics.stdev(runs):.3f}, "
          f"range [{min(runs):.2f}, {max(runs):.2f}] over {args.runs} runs")
    # variance decomposition: if between-process stdev >> within-process
    # stdev, the noise is process/compilation/tunnel-session state, not
    # chip thermal drift within a session.
    print(json.dumps({"within_stdev": round(statistics.stdev(within), 3),
                      "between_stdev": round(statistics.stdev(runs), 3),
                      "runs": [round(r, 2) for r in runs]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
