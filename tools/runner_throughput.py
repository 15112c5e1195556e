"""Measured TAP-Vid-runner throughput: the fused frame step under FlowCache.

The benchmark runner (mft_tpu/eval/runner.py) always constructs a per-sequence
FlowCache — in round 1 that forced the slow per-candidate path; the fused
one-jitted-call step now runs under a cache (tracker/mft.py), and this tool
measures what the RUNNER path actually achieves at 512x512, full delta chain:

- pass 1 ("cold"): every pairwise flow computed, written back to the cache;
- pass 2 ("cached"): re-track the same sequence from the same start frame
  (what strided mode / multi-config runs do) — flows come from the cache.

Prints one JSON line. Usage:
    python tools/runner_throughput.py [T] [SIZE]
"""

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 37
    H = W = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from mft_tpu.config import load_config
    from mft_tpu.eval.runner import track_sequence
    from mft_tpu.io.cache import FlowCache

    config = load_config("configs/MFT_cfg.py")
    tracker = config.tracker_class(config)

    rng = np.random.default_rng(0)
    video = rng.integers(0, 255, (T, H, W, 3), dtype=np.uint8)

    cache_dir = Path(tempfile.mkdtemp(prefix="runner_tp_"))
    try:
        flow_cache = FlowCache(cache_dir, max_ram_mb=10e3, max_device_mb=5e3)

        # warm-up: compile + warm BOTH dispatch variants (full-batch compute
        # and warm-cache injection — the second pass over the warm frames
        # hits the cache), then clear so the timed cold pass recomputes.
        # Warm over the FULL length: the chunked cold pass compiles one
        # variant per distinct chunk length (8 and the tail), and the warm
        # pass compiles the injection variants — all must be built before
        # the timed passes.
        track_sequence(tracker, video, 0, "forward", flow_cache)
        track_sequence(tracker, video, 0, "forward", flow_cache)
        flow_cache.clear()

        t0 = time.perf_counter()
        metas = track_sequence(tracker, video, 0, "forward", flow_cache)
        np.asarray(metas[T - 1].result.occlusion[:1, :1])  # device sync
        cold_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        metas = track_sequence(tracker, video, 0, "forward", flow_cache)
        np.asarray(metas[T - 1].result.occlusion[:1, :1])
        cached_s = time.perf_counter() - t0

        print(json.dumps({
            "metric": "tapvid_runner_fps_512px_full_deltas",
            "frames": T - 1,
            "size": [H, W],
            "cold_fps": round((T - 1) / cold_s, 2),
            "cached_fps": round((T - 1) / cached_s, 2),
        }))
    finally:
        shutil.rmtree(cache_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    # NOT via PYTHONPATH from an interactive shell: with /root/repo on
    # PYTHONPATH the remote-TPU backend can fail to register (observed
    # repeatedly from shell launches; python-subprocess launches with the
    # same value initialize fine — mechanism unresolved). A late
    # in-process sys.path insert avoids the question entirely.
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
    sys.exit(main())
