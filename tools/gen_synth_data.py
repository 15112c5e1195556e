#!/usr/bin/env python
"""Pre-generate synthetic training scenes to disk shards.

This container has ONE host CPU, so on-the-fly scene generation
(~0.2 s/pair) cannot feed the TPU train step (~10+ pairs/s). Instead this
tool renders scenes offline into ``data_synth/shard_*.npz`` and
tools/train_synth.py cycles over the cached shards with cheap
crop/flip/photometric augmentation — the FlyingChairs regime (a fixed
~20k-pair dataset + heavy augmentation), reference datasets.py:119-150.

Each shard is one scene: the shared template frame, the T-1 target frames,
and exact flow (float16, ≤0.1 px quantization at the ~150 px magnitudes the
generator produces) + occlusion GT. Writes are atomic (tmp+rename) so the
trainer can rescan the directory while this keeps producing.

Usage: nice -n 19 python tools/gen_synth_data.py \
           --out data_synth --count 4000 &
"""

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data_synth")
    ap.add_argument("--size", type=int, nargs=2, default=[288, 352])
    ap.add_argument("--T", type=int, default=8)
    ap.add_argument("--count", type=int, default=4000,
                    help="stop after this many PAIRS exist")
    ap.add_argument("--seed_start", type=int, default=0)
    args = ap.parse_args()

    from mft_tpu.train.synth import Scene

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    H, W = args.size
    rng_master = np.random.default_rng(123456)

    existing = sorted(out.glob("shard_*.npz"))
    n_pairs = len(existing) * (args.T - 1)
    seed = args.seed_start + len(existing)
    t0 = time.time()
    made = 0
    while n_pairs < args.count:
        path = out / f"shard_{seed:06d}.npz"
        if path.exists():
            seed += 1
            continue
        rng = np.random.default_rng(seed)
        n_sprites = int(rng.integers(2, 5))
        scene = Scene(rng, H, W, T=args.T, n_sprites=n_sprites)
        img0, ids0 = scene.composite(0)
        imgs, flows, occls = [], [], []
        for t in range(1, args.T):
            img_t, ids_t = scene.composite(t)
            flow, occl = scene.flow_occl(t, ids0=ids0, ids_t=ids_t)
            imgs.append(img_t)
            flows.append(flow.astype(np.float16))
            occls.append((occl > 0.5).astype(np.uint8))
        tmp = out / f".tmp_{seed:06d}.npz"
        np.savez(tmp, img0=img0,
                 imgs=np.stack(imgs), flows=np.stack(flows),
                 occls=np.stack(occls))
        os.replace(tmp, path)
        n_pairs += args.T - 1
        made += 1
        seed += 1
        if made % 50 == 0:
            rate = made * (args.T - 1) / (time.time() - t0)
            print(f"[gen] {n_pairs} pairs ({rate:.1f} pairs/s)", flush=True)
    print(f"[gen] done: {n_pairs} pairs in {out}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    main()
