#!/usr/bin/env python
"""Training throughput of the official OU-finetune recipe on one TPU chip.

Times the jitted train step (forward + backward + optimizer) of the exact
train_params.txt configuration — batch 6, 368x768, 12 unrolled iterations,
OU-heads-only training with frozen features/flow, --mixed_precision — on
synthetic batches (the Sintel/FT3D/Kubric blobs are not in this container,
same as the reference repo). The number therefore measures the TPU compute
path with the host data pipeline excluded; BatchLoader prefetch overlaps the
host side in real runs.

Prints one JSON line: steps/s, ms/step, and the projected wall-clock for the
official 50k-step budget. Recorded in docs/TRAINING.md.

Usage: python tools/train_bench.py [--steps 30]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch_size", type=int, default=6)
    ap.add_argument("--image_size", type=int, nargs=2, default=[368, 768])
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--no_mixed_precision", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from mft_tpu.models.raft.raft import RAFT, RAFTParams
    from mft_tpu.train.loop import build_state, make_train_step
    from mft_tpu.train.optim import make_optimizer

    H, W = args.image_size
    B = args.batch_size
    cfg = RAFTParams(occlusion_module="separate_with_uncertainty",
                     compute_dtype="float32" if args.no_mixed_precision
                     else "bfloat16")
    # official recipe: features + flow frozen, OU heads trained
    model = RAFT(cfg=cfg, train_mode=False)
    tx, _ = make_optimizer(lr=1.25e-4, num_steps=50000, weight_decay=1e-5,
                           epsilon=1e-8, clip=1.0, params=None,
                           trainable_prefixes=None)
    state = build_state(model, tx, (H, W))
    tx, _ = make_optimizer(lr=1.25e-4, num_steps=50000, weight_decay=1e-5,
                           epsilon=1e-8, clip=1.0,
                           params=state["variables"]["params"],
                           trainable_prefixes=("occlusion_block",))
    state["opt_state"] = tx.init(state["variables"]["params"])
    loss_kwargs = dict(gamma=0.85, freeze_optical_flow=True,
                       occlusion_module="separate_with_uncertainty",
                       uncertainty_loss_type="huber_non_occluded")
    step_fn = make_train_step(model, tx, loss_kwargs, iters=args.iters,
                              train_bn=False)

    rng = np.random.default_rng(0)
    def batch(seed):
        r = np.random.default_rng(seed)
        img1 = jnp.asarray(r.uniform(0, 255, (B, H, W, 3)), jnp.float32)
        img2 = jnp.asarray(r.uniform(0, 255, (B, H, W, 3)), jnp.float32)
        flow = jnp.asarray(r.normal(0, 3, (B, H, W, 2)), jnp.float32)
        valid = jnp.ones((B, H, W), jnp.float32)
        occl = jnp.asarray(r.uniform(0, 1, (B, H, W)) < 0.2, jnp.float32)
        return img1, img2, flow, valid, occl

    batches = [batch(s) for s in range(4)]
    for k in range(2):  # compile + warm
        state, metrics = step_fn(state, batches[k % 4])
    jax.block_until_ready(metrics["train/loss"])

    t0 = time.perf_counter()
    for k in range(args.steps):
        state, metrics = step_fn(state, batches[k % 4])
    jax.block_until_ready(metrics["train/loss"])
    dt = time.perf_counter() - t0

    steps_s = args.steps / dt
    print(json.dumps({
        "metric": "ou_finetune_steps_per_s",
        "value": round(steps_s, 3),
        "ms_per_step": round(1000 * dt / args.steps, 1),
        "batch": B, "image_size": [H, W], "iters": args.iters,
        "mixed_precision": not args.no_mixed_precision,
        "projected_50k_steps_hours": round(50000 / steps_s / 3600, 2),
        "final_loss": float(np.asarray(metrics["train/loss"])),
    }))


if __name__ == "__main__":
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
    main()
