#!/usr/bin/env python
"""Interleaved A/B bench: two tracker configs measured in the SAME process.

The remote-TPU tunnel drifts 15.5-16.8 FPS across processes for identical
code (thermal / tunnel state), which makes separate bench.py runs unreadable
for <1 ms effects. This tool builds two trackers that differ only in the
given raft_params overrides and interleaves chunk measurements A,B,A,B,...
on the same chip minutes apart — per-variant medians cancel the drift.

usage: python tools/ab_bench.py '{"corr_tile": 128}' '{"corr_tile": 512}'
       (each argv is a JSON dict merged into the baseline raft_params)
"""

import json
import sys
import time

import numpy as np


def make_tracker(raft_overrides):
    from mft_tpu.config import Config
    from mft_tpu.models.raft import RAFTFlow
    from mft_tpu.tracker import MFT

    flow_cfg = Config()
    flow_cfg.of_class = RAFTFlow
    params = {"occlusion_module": "separate_with_uncertainty",
              "compute_dtype": "bfloat16"}
    params.update(raft_overrides)
    flow_cfg.raft_params = params
    flow_cfg.model = None
    flow_cfg.flow_iters = int(params.pop("_iters", 12))
    schedule = params.pop("_schedule", None)  # list aligned w/ sorted deltas
    warm = bool(params.pop("_warm_start", False))  # template-pair warm start
    cfg = Config()
    cfg.flow_config = flow_cfg
    cfg.deltas = [np.inf, 1, 2, 4, 8, 16, 32]
    cfg.occlusion_threshold = 0.02
    if schedule is not None:
        cfg.flow_iters_schedule = [int(i) for i in schedule]
    if warm:
        cfg.warm_start_inf = True
    return MFT(cfg)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    ov_a = json.loads(sys.argv[1])
    ov_b = json.loads(sys.argv[2])
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    H = W = 512
    rng = np.random.default_rng(0)
    chunk = 16
    n_frames = 1 + 4 + chunk * rounds
    frames = [rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
              for _ in range(n_frames)]
    to_dev = lambda f: jnp.asarray(np.ascontiguousarray(f[:, :, ::-1]))

    trackers = {"A": make_tracker(ov_a), "B": make_tracker(ov_b)}
    rates = {"A": [], "B": []}
    for name, tr in trackers.items():
        tr.init(frames[0])
        for f in frames[1:5]:
            meta = tr.track(f)
        np.asarray(meta.result.occlusion[:1, :1])

    for r in range(rounds):
        for name in ("A", "B"):
            tr = trackers[name]
            pos = 5 + r * chunk
            nxt = to_dev(frames[pos])
            t0 = time.perf_counter()
            for k in range(chunk):
                cur = nxt
                if k + 1 < chunk:
                    nxt = to_dev(frames[pos + k + 1])
                meta = tr.track(cur)
            np.asarray(meta.result.occlusion[:1, :1])
            fps = chunk / (time.perf_counter() - t0)
            rates[name].append(fps)
            print(f"round {r} {name}: {fps:.2f}", flush=True)

    med = {k: float(np.median(v)) for k, v in rates.items()}
    print(json.dumps({"A": {"overrides": ov_a, "fps": round(med['A'], 2)},
                      "B": {"overrides": ov_b, "fps": round(med['B'], 2)},
                      "delta_fps": round(med['B'] - med['A'], 2)}))


if __name__ == "__main__":
    # NOT via PYTHONPATH from an interactive shell: with /root/repo on
    # PYTHONPATH the remote-TPU backend can fail to register (observed
    # repeatedly from shell launches; python-subprocess launches with the
    # same value initialize fine — mechanism unresolved). A late
    # in-process sys.path insert avoids the question entirely.
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
    sys.exit(main())
