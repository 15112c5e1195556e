#!/usr/bin/env python
"""Per-GRU-iteration cost vs batch size: the schedule-paradox probe.

The speed modes cut pair-iterations 84 -> 57 (fast) / 50 (warm) yet buy only
+3% / +7% FPS (BENCH_r03.json). Hypothesis: the per-iteration device cost is
nearly BATCH-INDEPENDENT (the lookup kernel is per-issue-bound, the update
convs are under-utilized at small batch), so shrinking the active prefix
from 7 pairs toward 1 saves almost no time per iteration — only DROPPED
iterations pay out, and those are bounded by the longest pair (always 12).

This tool times K=12 chained (lookup + update block) iterations at the
production shape (512^2 image -> 64x64 features, bf16) for B in {1, 2, 4, 7},
interleaved in one process, and prints ms per iteration per batch size.

Usage: python tools/iter_scaling.py
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

    from mft_tpu.models.raft.corr import build_corr_pyramid, corr_lookup
    from mft_tpu.models.raft.raft import RAFTParams, initialize_coords
    from mft_tpu.models.raft.update import BasicUpdateBlock

    H8 = W8 = 64
    K = 12
    cfg = RAFTParams(compute_dtype="bfloat16")
    dt = cfg.dtype
    blk = BasicUpdateBlock(hidden_dim=128, dtype=dt,
                           matmul=cfg.use_matmul_convs)

    rng = np.random.default_rng(0)
    fm = lambda B: jnp.asarray(
        rng.standard_normal((B, H8, W8, 256)).astype(np.float32)).astype(dt)

    Bs = (1, 2, 4, 7)
    fns, args = {}, {}
    for B in Bs:
        f1, f2 = fm(B), fm(B)
        net = jnp.tanh(fm(B)[..., :128])
        inp = jax.nn.relu(fm(B)[..., :128])
        variables = blk.init(jax.random.PRNGKey(0), net, inp,
                             jnp.zeros((B, H8, W8, 324), dt),
                             jnp.zeros((B, H8, W8, 2), jnp.float32))

        @jax.jit
        def chain(variables, f1, f2, net, inp):
            pyramid = build_corr_pyramid(f1, f2, 4, dtype=dt)
            coords0 = initialize_coords(f1.shape[0], H8, W8)
            coords1 = coords0
            for _ in range(K):
                corr = corr_lookup(pyramid, coords1, 4)
                net, _, dflow, _ = blk.apply(variables, net, inp, corr,
                                             coords1 - coords0,
                                             need_mask=False)
                coords1 = coords1 + dflow.astype(jnp.float32)
            return coords1

        chain(variables, f1, f2, net, inp).block_until_ready()  # compile
        fns[B] = chain
        args[B] = (variables, f1, f2, net, inp)

    reps, rounds = 8, 4
    times = {B: [] for B in Bs}
    for _ in range(rounds):
        for B in Bs:
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fns[B](*args[B])
            np.asarray(out[:1, :1, :1])
            times[B].append((time.perf_counter() - t0) / (reps * K) * 1e3)

    med = {str(B): round(float(np.median(v)), 2) for B, v in times.items()}
    print(json.dumps({"shape": [H8, W8], "iters_chained": K,
                      "ms_per_iter_by_batch": med,
                      "note": "lookup+update only; no encoder/chain/upsample"}))
    return 0


if __name__ == "__main__":
    # NOT via PYTHONPATH from an interactive shell: with /root/repo on
    # PYTHONPATH the remote-TPU backend can fail to register (observed
    # repeatedly from shell launches; python-subprocess launches with the
    # same value initialize fine — mechanism unresolved). A late
    # in-process sys.path insert avoids the question entirely.
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
    sys.exit(main())
