#!/usr/bin/env python
"""End-to-end TPU-production-path drift vs the exact path.

The production tracker step runs bf16 compute, the Pallas tent-matmul corr
lookup and the Pallas chain+select (1/256-px snapped sample positions, bf16
occl/sigma maps). All parity tests pin the exact jnp path on CPU; this tool
measures what the PRODUCTION path accumulates over a long chained sequence
against the exact path (f32 compute, XLA mxu lookup, chain_select_ref) with
IDENTICAL weights on the same device — closing the "bf16 quantization only
matters at exact selection ties" caveat (tracker/fused.py) with a measured
bound instead of an assumption.

Reports per-frame flow end-point-error between the two paths, occlusion
binarization flips (eval threshold 0.5, reference eval_MFT_tapvid.py:107)
and selection-threshold flips (0.02, configs/MFT_cfg.py:16), tracked over
time (drift = does the gap GROW with chain length?).

Usage: python tools/tpu_drift.py [T] [SIZE] [WEIGHTS]
(WEIGHTS: optional .msgpack/.pth checkpoint, e.g. the trained-like export of
tools/train_synth.py; default random init)
Exit code 1 if the drift bound is exceeded. Results recorded in
docs/PERFORMANCE.md ("TPU-path drift").
"""

import json
import sys

import numpy as np


def make_tracker(exact: bool, model=None):
    from mft_tpu.config import Config
    from mft_tpu.models.raft import RAFTFlow
    from mft_tpu.tracker import MFT

    flow_cfg = Config()
    flow_cfg.of_class = RAFTFlow
    if exact:
        flow_cfg.raft_params = {
            "occlusion_module": "separate_with_uncertainty",
            "compute_dtype": "float32", "corr_method": "mxu",
            "conv_backend": "conv"}
    else:
        flow_cfg.raft_params = {
            "occlusion_module": "separate_with_uncertainty",
            "compute_dtype": "bfloat16"}
    flow_cfg.model = model
    flow_cfg.flow_iters = 12
    cfg = Config()
    cfg.flow_config = flow_cfg
    cfg.deltas = [np.inf, 1, 2, 4, 8, 16, 32]
    cfg.occlusion_threshold = 0.02
    if exact:
        cfg.exact_chain = True
    return MFT(cfg)


def make_frames(T, H, W, seed=0):
    """Smooth global translation over a blurred random texture (the same
    clip family as the e2e parity tests, long enough for 100+ chain steps)."""
    import cv2
    rng = np.random.default_rng(seed)
    mx = 2 * (T + 1)
    big = rng.integers(0, 255, (H + mx, W + mx, 3)).astype(np.uint8)
    big = cv2.GaussianBlur(big, (7, 7), 2)
    frames = []
    for t in range(T):
        x, y = 2 * t, t
        frames.append(np.ascontiguousarray(big[y:y + H, x:x + W]))
    return frames


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 110
    H = W = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    model = sys.argv[3] if len(sys.argv) > 3 else None

    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    prod = make_tracker(exact=False, model=model)
    ref = make_tracker(exact=True, model=model)
    # identical weights: copy the production model's variables
    ref.flower.variables = jax.tree.map(
        lambda x: x.astype(np.float32) if hasattr(x, "astype") else x,
        prod.flower.variables)

    frames = make_frames(T, H, W)

    # ---- phase 1: single-step numeric drift (no chaining) ---------------- #
    # The same frame pair through both paths isolates the per-forward numeric
    # difference (bf16 compute + Pallas tent lookup vs f32 + XLA mxu lookup).
    # The chained phase below additionally includes per-pixel candidate
    # SELECTION flips — under random weights the sigma candidates are dense
    # near-ties, so a selection flip swaps whole chained candidates and the
    # chain EPE measures candidate disagreement, not numeric error.
    step_rows = []
    for s in range(min(10, T - 1)):
        pfl, pex = prod.flower.compute_flow(frames[s], frames[s + 1])
        rfl, rex = ref.flower.compute_flow(frames[s], frames[s + 1])
        pfl, rfl = np.asarray(pfl, np.float32), np.asarray(rfl, np.float32)
        po_ = np.asarray(pex["occlusion"], np.float32)
        ro_ = np.asarray(rex["occlusion"], np.float32)
        epe_s = np.hypot(pfl[..., 0] - rfl[..., 0], pfl[..., 1] - rfl[..., 1])
        step_rows.append({
            "epe_mean": float(epe_s.mean()),
            "epe_p99": float(np.quantile(epe_s, 0.99)),
            "occl_eval_flip": float(((po_ < 0.5) != (ro_ < 0.5)).mean()),
        })
    step = {k: round(float(np.mean([r[k] for r in step_rows])), 5)
            for k in step_rows[0]}
    step["epe_p99_worst"] = round(
        max(r["epe_p99"] for r in step_rows), 5)
    print("single-step:", json.dumps(step), flush=True)

    # ---- phase 2: chained drift over the full sequence ------------------- #
    prod.init(frames[0])
    ref.init(frames[0])

    rows = []
    for t, frame in enumerate(frames[1:], start=1):
        mp = prod.track(frame)
        mr = ref.track(frame)
        pf = np.asarray(mp.result.flow, np.float32)
        rf = np.asarray(mr.result.flow, np.float32)
        po = np.asarray(mp.result.occlusion, np.float32)
        ro = np.asarray(mr.result.occlusion, np.float32)
        ps = np.asarray(mp.result.sigma, np.float32)
        rs = np.asarray(mr.result.sigma, np.float32)
        # compare only pixels BOTH paths consider visible-track-worthy at
        # the eval binarization; occluded pixels carry stale/invalid flow by
        # construction (reference keeps last-valid flow there too)
        vis = (po < 0.5) & (ro < 0.5)
        epe = np.hypot(pf[..., 0] - rf[..., 0], pf[..., 1] - rf[..., 1])
        epe_v = epe[vis] if vis.any() else epe.ravel()
        rows.append({
            "t": t,
            "epe_vis_mean": float(epe_v.mean()),
            "epe_vis_p99": float(np.quantile(epe_v, 0.99)),
            "vis_frac_prod": float((po < 0.5).mean()),
            "occl_eval_flip": float(((po < 0.5) != (ro < 0.5)).mean()),
            "occl_sel_flip": float(((po > 0.02) != (ro > 0.02)).mean()),
            "sigma_relerr_p99": float(np.quantile(
                np.abs(ps - rs) / (np.abs(rs) + 1e-3), 0.99)),
        })
        if t % 10 == 0:
            print(f"frame {t}: epe_vis_mean={rows[-1]['epe_vis_mean']:.4f} "
                  f"p99={rows[-1]['epe_vis_p99']:.3f} "
                  f"occl_eval_flip={rows[-1]['occl_eval_flip']:.4f}",
                  flush=True)

    def seg(a, b):
        sel = rows[a:b]
        return {k: round(float(np.mean([r[k] for r in sel])), 5)
                for k in sel[0] if k != "t"}

    n = len(rows)
    summary = {
        "frames": n, "size": H,
        "early(1-10)": seg(0, 10),
        "mid": seg(n // 2 - 5, n // 2 + 5),
        "late(last 10)": seg(n - 10, n),
        "worst_epe_vis_p99": round(max(r["epe_vis_p99"] for r in rows), 4),
        "worst_occl_eval_flip": round(
            max(r["occl_eval_flip"] for r in rows), 5),
        "single_step": step,
    }
    print(json.dumps(summary, indent=1))

    # Drift bound (what IS assertable under random weights): the per-forward
    # numeric difference of the production path stays under a quarter pixel
    # MEAN (measured 0.105 on the v5e — bf16 convs through 12 sequential GRU
    # iterations; random weights lack the trained fixed-point contraction
    # that damps iteration-to-iteration rounding) and <2% of pixels flip the
    # eval occlusion binarization at any chain length (measured max 1.4%).
    # The chained EPE is reported unbounded: under random weights the
    # per-pixel sigma candidates are near-ties, a ULP-level numeric
    # difference legitimately flips the argmax (occl_sel_flip above counts
    # those, ~1%/frame), and the two paths then track DIFFERENT candidates —
    # candidate disagreement, not numeric error. Re-bound the chained phase
    # once trained weights exist (sigma fields then separate).
    ok = (step["epe_mean"] < 0.25
          and step["occl_eval_flip"] < 0.01
          and summary["worst_occl_eval_flip"] < 0.02)
    print("DRIFT BOUND:", "OK" if ok else "EXCEEDED")
    return 0 if ok else 1


if __name__ == "__main__":
    # NOT via PYTHONPATH from an interactive shell: with /root/repo on
    # PYTHONPATH the remote-TPU backend can fail to register (observed
    # repeatedly from shell launches; python-subprocess launches with the
    # same value initialize fine — mechanism unresolved). A late
    # in-process sys.path insert avoids the question entirely.
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
    sys.exit(main())
