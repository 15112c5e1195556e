"""Aggregate dense-tracking throughput of the batched multi-clip streaming
mode (mft_tpu/parallel/streaming.py) on the local device(s).

Tracks C random clips in lockstep and reports aggregate tracked frames/s
(clips x timesteps / wall). Compares against the single-clip tracker's FPS
from bench.py to show the batching win: one (C*n_delta)-pair RAFT dispatch
per timestep keeps the MXU dense where the single-clip step underfills it.

Usage: python tools/streaming_bench.py [C] [SIZE] [T]
Prints one JSON line per clip count.
"""

import json
import sys
import time

import numpy as np


def measure(n_clips, H, W, T, warm=3):
    import jax
    import jax.numpy as jnp
    from mft_tpu.config import Config
    from mft_tpu.models.raft import RAFTFlow
    from mft_tpu.parallel.streaming import StreamingTracker

    flow_cfg = Config()
    flow_cfg.of_class = RAFTFlow
    flow_cfg.raft_params = {"occlusion_module": "separate_with_uncertainty",
                            "compute_dtype": "bfloat16"}
    flow_cfg.model = None
    flow_cfg.flow_iters = 12
    cfg = Config()
    cfg.flow_config = flow_cfg
    cfg.deltas = [np.inf, 1, 2, 4, 8, 16, 32]
    cfg.occlusion_threshold = 0.02

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (T + warm + 1, n_clips, H, W, 3),
                          dtype=np.uint8)

    st = StreamingTracker(cfg, n_clips)
    st.init(frames[0])
    for t in range(1, 1 + warm):
        out = st.track(frames[t])
    np.asarray(out.occlusion[:1, :1, :1])  # sync

    t0 = time.perf_counter()
    for t in range(1 + warm, 1 + warm + T):
        out = st.track(frames[t])
    np.asarray(out.occlusion[:1, :1, :1])
    wall = time.perf_counter() - t0
    return n_clips * T / wall


def main():
    clips = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    H = W = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    for c in ([clips] if clips else [1, 2, 4]):
        fps = measure(c, H, W, T)
        print(json.dumps({
            "metric": "streaming_aggregate_fps",
            "n_clips": c,
            "size": [H, W],
            "value": round(fps, 2),
            "unit": "tracked frames/s (all clips)",
        }), flush=True)
    return 0


if __name__ == "__main__":
    # NOT via PYTHONPATH from an interactive shell: with /root/repo on
    # PYTHONPATH the remote-TPU backend can fail to register (observed
    # repeatedly from shell launches; python-subprocess launches with the
    # same value initialize fine — mechanism unresolved). A late
    # in-process sys.path insert avoids the question entirely.
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
    sys.exit(main())
