"""Validation: EPE / px-threshold / occlusion-accuracy / uncertainty metrics.

Role parity with reference MFT/RAFT/evaluate.py:75-344 (validate_chairs /
sintel / kubric / kitti): full-resolution forward passes with /8 padding,
EPE + 1/3/5px rates, occlusion accuracy on hard GT, uncertainty
overshoot/sub1/sub5 statistics; Kubric validation sweeps the long-term
deltas [1, 2, 4, 8, 16] (evaluate.py:221).
"""

import logging

import numpy as np
import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

KUBRIC_VAL_DELTAS = (1, 2, 4, 8, 16)


def flow_metrics(pred_flow, gt_flow, valid):
    epe = np.sqrt(np.sum((pred_flow - gt_flow) ** 2, axis=-1))
    v = valid > 0.5
    epe_v = epe[v]
    if epe_v.size == 0:
        return {}
    return {
        "epe": float(epe_v.mean()),
        "1px": float((epe_v < 1).mean()),
        "3px": float((epe_v < 3).mean()),
        "5px": float((epe_v < 5).mean()),
    }


def ou_metrics(pred_occl, pred_sigma, gt_occl, gt_flow, pred_flow, valid):
    """Occlusion accuracy on hard GT + uncertainty calibration stats
    (reference evaluate.py: uncertainty overshoot/sub1/sub5)."""
    v = valid > 0.5
    hard = (gt_occl < 0.01) | (gt_occl > 0.99)
    m = v & hard
    out = {}
    if m.any():
        out["occl_acc"] = float(((pred_occl > 0.5) == (gt_occl > 0.5))[m].mean())
    epe = np.sqrt(np.sum((pred_flow - gt_flow) ** 2, axis=-1))
    nonoccl = v & (gt_occl < 0.01)
    if nonoccl.any():
        s = pred_sigma[nonoccl]
        e = epe[nonoccl]
        out["unc_overshoot"] = float(np.maximum(e - s, 0).mean())
        out["unc_sub1"] = float((s < 1).mean())
        out["unc_sub5"] = float((s < 5).mean())
    return out


def _forward(model, variables, img1, img2, iters):
    """Padded full-res forward -> (flow, occl_prob, sigma) numpy."""
    from mft_tpu.models.raft.wrapper import pad_to_8
    H, W = img1.shape[:2]
    (pt, pb), (pl, pr) = pad_to_8(H, W)
    pad = ((pt, pb), (pl, pr), (0, 0))
    i1 = jnp.asarray(np.pad(img1, pad, mode="edge"), jnp.float32)[None]
    i2 = jnp.asarray(np.pad(img2, pad, mode="edge"), jnp.float32)[None]
    out = model.apply(variables, i1, i2, iters=iters, test_mode=True)
    sl = (0, slice(pt, pt + H), slice(pl, pl + W))
    flow = np.asarray(out["flow"][sl])
    occl = np.asarray(jax.nn.softmax(out["occlusion"], axis=-1)[..., 1][sl])
    sigma = np.asarray(jnp.sqrt(jnp.exp(out["uncertainty"][..., 0]))[sl])
    return flow, occl, sigma


def validate_dataset(dataset, model, variables, iters=12, max_samples=None):
    """Generic dense-GT validation over a FlowDataset-style dataset."""
    rows = []
    n = len(dataset) if max_samples is None else min(len(dataset), max_samples)
    for i in range(n):
        img1, img2, gt_flow, valid, gt_occl = dataset[i]
        flow, occl, sigma = _forward(model, variables, img1, img2, iters)
        row = flow_metrics(flow, gt_flow, valid)
        row.update(ou_metrics(occl, sigma, gt_occl, gt_flow, flow, valid))
        rows.append(row)
    keys = set().union(*(r.keys() for r in rows)) if rows else set()
    return {k: float(np.mean([r[k] for r in rows if k in r])) for k in keys}


def validate_kubric(model, variables, iters=12, max_scenes=None, env=None):
    """Long-term flow validation over deltas (reference evaluate.py:215-300)."""
    from mft_tpu.environment import env_settings
    from mft_tpu.train.datasets import KubricLongTerm
    env = env or env_settings()
    ds = KubricLongTerm(None, split="validation", root=env.kubric_dir,
                        correct_flow=True)
    out = {}
    for delta in KUBRIC_VAL_DELTAS:
        rows = []
        # samples are (frame0 -> frame i+1); pick those with i+1 == delta
        for idx, (_, i) in enumerate(ds.extra_info):
            if i + 1 != delta:
                continue
            if max_scenes is not None and len(rows) >= max_scenes:
                break
            img1, img2, gt_flow, valid, gt_occl = ds[idx]
            flow, occl, sigma = _forward(model, variables, img1, img2, iters)
            row = flow_metrics(flow, gt_flow, valid)
            row.update(ou_metrics(occl, sigma, gt_occl, gt_flow, flow, valid))
            rows.append(row)
        if rows:
            keys = set().union(*(r.keys() for r in rows))
            out[f"delta{delta}"] = {k: float(np.mean([r[k] for r in rows if k in r]))
                                    for k in keys}
    return out


def run_validation(name, model, variables, iters=12, max_samples=32):
    """Dispatch by validation set name (reference evaluate.py validate_*)."""
    from mft_tpu.environment import env_settings
    from mft_tpu.train import datasets as D
    env = env_settings()
    if name == "sintel_val_subsplit":
        ds = D.MpiSintel(None, dstype="final", root=env.sintel_dir,
                         load_occlusion=True, subsplit="val")
        return validate_dataset(ds, model, variables, iters, max_samples)
    if name == "sintel":
        ds = D.MpiSintel(None, dstype="final", root=env.sintel_dir)
        return validate_dataset(ds, model, variables, iters, max_samples)
    if name == "chairs":
        ds = D.FlyingChairs(None, split="validation", root=env.flyingchairs_dir)
        return validate_dataset(ds, model, variables, iters, max_samples)
    if name == "kubric":
        return validate_kubric(model, variables, iters, max_scenes=8)
    if name == "kitti":
        ds = D.KITTI(None, root=env.kitti_dir)
        return validate_dataset(ds, model, variables, iters, max_samples)
    if name == "viper":
        ds = D.VIPER(None, root=getattr(env, "viper_dir", "datasets/VIPER"))
        return validate_dataset(ds, model, variables, iters, max_samples)
    raise ValueError(f"unknown validation set {name!r}")
