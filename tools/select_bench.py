#!/usr/bin/env python
"""Micro-A/B: _select_n (where-chain) vs one-hot contraction vs gather.

tracker/fused.py selects the per-pixel winning candidate map 3x per frame
with an O(N) jnp.where chain. Alternatives: a one-hot (N,) x (N,H,W,C)
contraction (one fused reduce instead of N selects) and XLA's
take_along_axis gather. This tool times all three at the production shape
(N=7 candidates, 512x512, the 3 per-frame payloads fused in one jit like
the tracker step does) on the v5e, interleaved in one process.

Usage: python tools/select_bench.py
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from mft_tpu.tracker.fused import _select_n

    N, H, W = 7, 512, 512
    rng = np.random.default_rng(0)
    flow = jnp.asarray(rng.standard_normal((N, H, W, 2)).astype(np.float32))
    occl = jnp.asarray(rng.standard_normal((N, H, W)).astype(np.float32))
    sigma = jnp.asarray(rng.standard_normal((N, H, W)).astype(np.float32))
    best = jnp.asarray(rng.integers(0, N, (H, W)).astype(np.int32))

    def select_onehot(arr, best):
        oh = (best[None] == jnp.arange(N, dtype=jnp.int32)[:, None, None])
        oh = oh.astype(arr.dtype)
        if arr.ndim == 4:
            return jnp.einsum("nhw,nhwc->hwc", oh, arr)
        return jnp.einsum("nhw,nhw->hw", oh, arr)

    def select_gather(arr, best):
        a = arr.reshape(N, H * W, -1)
        out = jnp.take_along_axis(a, best.reshape(1, H * W, 1), axis=0)
        return out[0].reshape((H, W) + arr.shape[3:])

    variants = {"where": _select_n, "onehot": select_onehot,
                "gather": select_gather}
    fns = {}
    for name, sel in variants.items():
        @jax.jit
        def step(flow, occl, sigma, best, _sel=sel):
            # the tracker applies the selection to flow+occl+sigma per frame
            return (_sel(flow, best), _sel(occl, best), _sel(sigma, best))
        out = step(flow, occl, sigma, best)  # compile
        ref = fns.get("_ref")
        if ref is None:
            fns["_ref"] = jax.tree.map(np.asarray, out)
        else:  # all variants must agree exactly
            for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(ref)):
                np.testing.assert_array_equal(np.asarray(a), b)
        fns[name] = step

    reps, rounds = 50, 4
    times = {k: [] for k in variants}
    for _ in range(rounds):
        for name in variants:
            step = fns[name]
            t0 = time.perf_counter()
            for _ in range(reps):
                out = step(flow, occl, sigma, best)
            np.asarray(out[0][:1, :1])
            times[name].append((time.perf_counter() - t0) / reps * 1e3)

    med = {k: round(float(np.median(v)), 3) for k, v in times.items()}
    print(json.dumps({"shape": [N, H, W], "per_call_ms_x3_selects": med}))
    return 0


if __name__ == "__main__":
    # NOT via PYTHONPATH from an interactive shell: with /root/repo on
    # PYTHONPATH the remote-TPU backend can fail to register (observed
    # repeatedly from shell launches; python-subprocess launches with the
    # same value initialize fine — mechanism unresolved). A late
    # in-process sys.path insert avoids the question entirely.
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
    sys.exit(main())
