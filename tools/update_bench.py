#!/usr/bin/env python
"""Isolated update-block bench: 12 chained iterations at the production shape.

Times ONLY the BasicUpdateBlock chain (motion encoder + GRU + flow head,
the ~23 ms/frame bucket of docs/PERFORMANCE.md) at the bench workload's
shape — B=7 pairs, 64x64 at 1/8 resolution, bf16 — for each conv lowering,
and reports ms/frame + achieved TFLOP/s (1.84 TFLOP/frame counted budget,
mft_tpu/utils/flops.py).

Isolated numbers historically over-promise vs the full graph (fusion
changes), but for this pure-dense-compute bucket they rank lowerings and
bound the attainable win before a full-graph A/B.

Usage: python tools/update_bench.py [--iters 12] [--rounds 5]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--backends", nargs="*",
                    default=["conv", "matmul", "im2col", "hybrid"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    from mft_tpu.models.raft.update import BasicUpdateBlock

    B, H8, W8 = 7, 64, 64
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    net = jnp.asarray(rng.standard_normal((B, H8, W8, 128)), dt)
    inp = jnp.asarray(rng.standard_normal((B, H8, W8, 128)), dt)
    corr = jnp.asarray(rng.standard_normal((B, H8, W8, 324)), dt)
    flow = jnp.asarray(rng.standard_normal((B, H8, W8, 2)), jnp.float32)

    results = {}
    for backend in args.backends:
        mm = {"conv": False, "matmul": True}.get(backend, backend)
        blk = BasicUpdateBlock(dtype=dt, matmul=mm)
        variables = blk.init(jax.random.PRNGKey(0), net, inp, corr, flow)

        @jax.jit
        def chain(v, net, inp, corr, flow):
            # the corr lookup is NOT re-run per iteration here (that is the
            # other bucket); same corr window each step keeps this a pure
            # update-block measurement with the real sequential dependency
            def body(c, _):
                n, f = c
                n, _, dflow = blk.apply(v, n, inp, corr, f)[:3]
                return (n, f + dflow.astype(jnp.float32)), None
            (n, f), _ = jax.lax.scan(body, (net, flow), None,
                                     length=args.iters)
            return n, f

        out = chain(variables, net, inp, corr, flow)
        np.asarray(out[1][:1, :1, :1])  # the tunnel's block_until_ready
        times = []                      # does NOT sync; fetch to sync
        n_disp = 8
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            f_prev = flow
            for _ in range(n_disp):
                # chain dispatches through the output so none can be
                # reordered/elided; one host fetch at the end syncs all
                _, f_prev = chain(variables, net, inp, corr, f_prev)
            np.asarray(f_prev[:1, :1, :1])
            times.append((time.perf_counter() - t0) / n_disp * 1000)
        ms = float(np.median(times))
        tflops = 1.84 / (ms / 1000) if ms else 0.0
        results[backend] = {"ms_per_12it": round(ms * 12 / args.iters, 2),
                            "achieved_tflops": round(tflops, 1)}
        print(f"{backend}: {ms:.2f} ms ({tflops:.0f} TF/s achieved)",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
    main()
