#!/usr/bin/env python
"""Validation margin of the committed trained-like weights vs random init.

Runs the RAFT-OU forward (12 iters, test protocol) on a deterministic
held-out set of synthetic pairs (mft_tpu.train.synth — scenes the trainer
never saw: different generator seeds than data_synth shards) and prints
flow / occlusion / uncertainty quality for BOTH the msgpack weights and
the deterministic random init the configs fall back to.

Gate (exit code): trained val EPE must be < 0.5x random EPE and occlusion
accuracy > random + 10 points — the "beats random init by a wide,
recorded margin" bar for the committed artifact. Results are recorded in
docs/TRAINING.md.

Usage: python tools/val_weights.py \
           [--weights weights/raftou_synth.msgpack] [--n 24]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def build_val_set(n, H=256, W=320, seed=10_000_000):
    """Held-out pairs: seeds far outside the shard generator's range."""
    from mft_tpu.train.synth import sample_pair
    items = []
    for i in range(n):
        rng = np.random.default_rng(seed + i)
        items.append(sample_pair(rng, H, W))
    return tuple(np.stack([it[k] for it in items]).astype(np.float32)
                 for k in range(5))


def evaluate(variables, model, img1, img2, flow_gt, valid, occl_gt,
             iters=12, chunk=8):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fwd(v, a, b):
        out = model.apply(v, a, b, iters=iters, test_mode=True)
        return out["flow"], out["occlusion"], out["uncertainty"]

    flows, occls, uncs = [], [], []
    for i in range(0, img1.shape[0], chunk):
        f, o, u = fwd(variables, jnp.asarray(img1[i:i + chunk]),
                      jnp.asarray(img2[i:i + chunk]))
        flows.append(np.asarray(f))
        occls.append(np.asarray(o))
        uncs.append(np.asarray(u))
    flow_p = np.concatenate(flows)
    occl_p = np.concatenate(occls)
    unc_p = np.concatenate(uncs)

    epe = np.sqrt(((flow_p - flow_gt) ** 2).sum(-1))
    m = valid > 0.5
    nonocc = m & (occl_gt < 0.5)
    occ_pred = occl_p[..., 1] > occl_p[..., 0]  # raw logits, ch1 = occluded
    sigma = np.exp(0.5 * unc_p[..., 0])
    corr = float(np.corrcoef(sigma[nonocc], epe[nonocc])[0, 1])
    return {
        "epe": float(epe[m].mean()),
        "epe_nonocc": float(epe[nonocc].mean()),
        "px1": float((epe[nonocc] < 1).mean()),
        "px3": float((epe[nonocc] < 3).mean()),
        "occ_acc": float((occ_pred == (occl_gt > 0.5))[m].mean()),
        "sigma_epe_corr": corr,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="weights/raftou_synth.msgpack")
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from mft_tpu.models.raft.raft import RAFT, RAFTParams
    from mft_tpu.models.raft.wrapper import load_variables

    cfg = RAFTParams(occlusion_module="separate_with_uncertainty",
                     compute_dtype="bfloat16")
    model = RAFT(cfg=cfg, train_mode=False)

    img1, img2, flow_gt, valid, occl_gt = build_val_set(args.n)

    results = {}
    for name, path in (("random", None), ("trained", args.weights)):
        variables = load_variables(path, model, example_hw=(64, 64))
        results[name] = evaluate(variables, model, img1, img2, flow_gt,
                                 valid, occl_gt, iters=args.iters)
        print(f"{name:8s} " + "  ".join(
            f"{k}={v:.4f}" for k, v in results[name].items()))

    r, t = results["random"], results["trained"]
    margin = {
        "epe_ratio": t["epe"] / max(r["epe"], 1e-9),
        "occ_acc_gain": t["occ_acc"] - r["occ_acc"],
    }
    print("margin  " + json.dumps({k: round(v, 4) for k, v in margin.items()}))
    if args.json:
        Path(args.json).write_text(json.dumps(
            {"random": r, "trained": t, "margin": margin, "n": args.n},
            indent=1))
    ok = margin["epe_ratio"] < 0.5 and margin["occ_acc_gain"] > 0.10
    print("GATE:", "PASS" if ok else "FAIL",
          "(trained EPE < 0.5x random and occ_acc > random + 10pts)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    sys.exit(main())
