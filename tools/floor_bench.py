#!/usr/bin/env python
"""Attribute the ~12 ms/frame 'nothing' dispatch floor (VERDICT r3 item 2).

The traced-ablation grid (tools/attrib_bench.py) leaves an ~11.9 ms/frame
residual when every compute phase of the tracker step is stubbed and the
frames are pre-staged on device. This tool decides what that residual is
made of, with direct measurements instead of inference:

  a) trivial  — a donated jitted (8,) f32 add, dispatched in the same
     chunk-of-K + one-fetch loop as the bench: the pure per-dispatch cost
     of THIS jax stack + device transport, independent of our graph.
  b) ringlike — the same loop over a jitted donated function whose
     argument pytree matches the tracker step's (imgs/flow/occl/sigma/
     fmap/cnet rings + frame + indices, ~1.4 GB of donated buffers at
     512 px) but whose body is one elementwise add per array: adds the
     host-side pytree/donation handling and the executable's buffer
     bookkeeping on top of (a).
  c) issue-only — the 'nothing'-equivalent loop WITHOUT the end-of-chunk
     fetch (timed to dispatch, not to completion; a final fetch outside
     the timer keeps the queue honest): if issue time ~= total time the
     floor is host/transport-side serialization, not device time.
  d) chunk-length sweep on (a): separates per-dispatch cost from the
     per-FETCH completion-poll artifact (~28 ms/fetch on this tunnel).

Interpretation key (written into docs/PERFORMANCE.md):
  trivial >> 1 ms  -> the floor is the transport's per-dispatch latency —
                      a bench-environment artifact a directly-attached
                      chip would not have; report alongside raw FPS.
  ringlike - trivial -> cost of OUR argument pytree (donation, aliasing).
  nothing - ringlike -> real device work left in the stubbed step
                      (ring gathers/updates, index plumbing).

usage: python tools/floor_bench.py
"""

import json
import time

import numpy as np


def timed_loop(fn, args_init, chunk, rounds, fetch, refresh=None):
    """Median ms/call over `rounds` chunks of `chunk` dispatches + 1 fetch.

    fn: callable taking/returning the (donated) args tuple.
    fetch: callable(args) -> forces a tiny device->host read.
    refresh: callable() -> fresh args (for donated buffers across rounds).
    """
    args = args_init
    # warm: compile + steady state
    for _ in range(3):
        args = fn(args)
    fetch(args)
    out = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(chunk):
            args = fn(args)
        fetch(args)
        out.append((time.perf_counter() - t0) / chunk * 1000)
    return float(np.median(out)), args


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    results = {}
    chunk, rounds = 16, 4

    # (a) trivial donated dispatch -------------------------------------- #
    @jax.jit
    def triv(x):
        return (x[0] + 1.0,)

    x0 = (jnp.zeros((8,), jnp.float32),)
    ms, _ = timed_loop(lambda a: triv(a), x0, chunk, rounds,
                       lambda a: np.asarray(a[0][:1]))
    results["trivial_ms_per_dispatch"] = round(ms, 2)

    # (d) chunk sweep on the trivial dispatch --------------------------- #
    for ck in (4, 64):
        ms, _ = timed_loop(lambda a: triv(a), x0, ck, rounds,
                           lambda a: np.asarray(a[0][:1]))
        results[f"trivial_ms_chunk{ck}"] = round(ms, 2)

    # (b) tracker-shaped donated pytree, elementwise body --------------- #
    H = W = 512
    S = 33
    H8, W8 = H // 8, W // 8

    def ring_args():
        return (
            jnp.zeros((S, H, W, 3), jnp.uint8),       # mem_imgs
            jnp.zeros((S, H, W, 2), jnp.float32),     # mem_flow
            jnp.zeros((S, H, W), jnp.float32),        # mem_occl
            jnp.zeros((S, H, W), jnp.float32),        # mem_sigma
            jnp.zeros((S, H8, W8, 256), jnp.bfloat16),  # mem_fmap
            jnp.zeros((S, H8, W8, 256), jnp.bfloat16),  # mem_cnet
            jnp.zeros((H, W, 3), jnp.uint8),          # frame
            jnp.zeros((7,), jnp.int32),               # slots
            jnp.zeros((7,), bool),                    # valid
            jnp.int32(0),                             # wslot
        )

    @partial_donate
    def ring_step(a):
        imgs, flow, occl, sigma, fmap, cnet, frame, slots, valid, wslot = a
        return (imgs, flow + 1.0, occl + 1.0, sigma, fmap, cnet,
                frame, slots, valid, wslot)

    ms, _ = timed_loop(ring_step, ring_args(), chunk, rounds,
                       lambda a: np.asarray(a[1][:1, :1, 0]))
    results["ringlike_ms_per_dispatch"] = round(ms, 2)

    # (c) issue-only: time dispatches without the in-loop fetch ---------- #
    args = ring_args()
    for _ in range(3):
        args = ring_step(args)
    np.asarray(args[1][:1, :1, 0])
    t0 = time.perf_counter()
    for _ in range(chunk):
        args = ring_step(args)
    issue_ms = (time.perf_counter() - t0) / chunk * 1000
    np.asarray(args[1][:1, :1, 0])
    total_ms = (time.perf_counter() - t0) / chunk * 1000
    results["ringlike_issue_only_ms"] = round(issue_ms, 2)
    results["ringlike_issue_plus_drain_ms"] = round(total_ms, 2)

    print(json.dumps(results, indent=1))


def partial_donate(f):
    import jax
    return jax.jit(f, donate_argnums=(0,))


if __name__ == "__main__":
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
    main()
