#!/usr/bin/env python
"""Accuracy cost of the documented speed modes (fast / warm) vs parity.

Runs OUR full TAP-Vid pipeline (runner -> evaluator) three times on the same
synthetic textured pickle with the same weights — once per mode:

- parity: uniform 12 GRU iterations (reference-exact configuration,
  configs/flow/RAFTou_kubric_huber_split_nonoccl.py:27 in serycjon/MFT);
- fast:   per-delta iteration schedule (configs/MFT_fast_cfg.py);
- warm:   fast + template-pair warm start (configs/MFT_warm_cfg.py);

and tabulates AJ / <delta_avg / OA deltas vs parity. The weights are
random-init with the occlusion-head gain+calibration of tools/tapvid_parity
(the trained checkpoint is not distributed) — random-weight deltas are a
LOWER BOUND on mode fidelity: trained flow converges faster per iteration,
so re-run this once trained weights exist. Results are recorded in
docs/PERFORMANCE.md next to the speed numbers.

Usage: python tools/mode_cost.py [--frames 12]
"""

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

OUR_MODE_CFG = '''
import numpy as np
from mft_tpu.config import Config
from mft_tpu.tracker import MFT
from mft_tpu.models.raft import RAFTFlow


def get_config():
    c = Config()
    c.tracker_class = MFT
    flow = Config()
    flow.of_class = RAFTFlow
    flow.raft_params = {{"occlusion_module": "separate_with_uncertainty"}}
    flow.model = r"{ckpt}"
    flow.flow_iters = {iters}
    flow.name = 'raftou_mode'
    c.flow_config = flow
    c.deltas = {deltas}
    c.occlusion_threshold = 0.02
    c.name = '{name}'
    sched = {schedule}
    if sched is not None:
        c.flow_iters_schedule = sched
    if {warm}:
        c.warm_start_inf = True
        c.cache_delta_infinity = False
    return c
'''

OUR_DS_CFG = '''
from mft_tpu.config import Config


def get_config():
    c = Config()
    c.pickles = [r"{pkl}"]
    c.scaling = '{scaling}'
    c.name = 'synth'
    return c
'''


def run_mode(workdir, name, pkl, ckpt, deltas, iters, schedule, warm,
             scaling):
    from mft_tpu.eval import runner, evaluate

    workdir = Path(workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    tcfg = workdir / f"{name}_cfg.py"
    tcfg.write_text(OUR_MODE_CFG.format(
        ckpt=ckpt, iters=iters, name=name,
        deltas="[float('inf')] + " + repr([d for d in deltas
                                           if np.isfinite(d)]),
        schedule=repr(schedule), warm=repr(bool(warm))))
    dcfg = workdir / "ds_cfg.py"
    dcfg.write_text(OUR_DS_CFG.format(pkl=pkl, scaling=scaling))

    args = runner.get_parser().parse_args(
        ["--trackers", str(tcfg), "--dataset", str(dcfg),
         "--export", str(workdir / "export"),
         "--cache", str(workdir / f"cache_{name}"), "--mode", "both"])
    assert runner.run(args) == 0
    eargs = evaluate.get_parser().parse_args(
        ["--trackers", str(tcfg), "--dataset", str(dcfg),
         "--export", str(workdir / "export"), "--mode", "both"])
    evaluate.run(eargs)

    import pandas as pd
    out = {}
    for qm, suffix in (("first", ""), ("strided", "-strided")):
        p = workdir / "export" / name / "eval" / f"tapvid-eval{suffix}.pklz"
        if p.exists():
            out[qm] = pd.read_pickle(p)
    return out


KEY = ("average_jaccard", "average_pts_within_thresh", "occlusion_accuracy")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/mode_cost")
    ap.add_argument("--out", default=None)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--model", default=None,
                    help="trained checkpoint (.msgpack/.pth) to use instead "
                         "of the random-init shared weights")
    args = ap.parse_args()

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.tapvid_parity import make_textured_pickle, make_shared_weights

    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    wd = Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    T, H = args.frames, args.size
    pkl = make_textured_pickle(wd / "synth.pkl", rng, T=T, H=H, W=H,
                               n_tracks=8, occluded_gt=True)
    with open(pkl, "rb") as f:
        video = pickle.load(f)["seq0"]["video"]
    if args.model:
        ckpt = args.model
    else:
        ckpt = make_shared_weights(wd / "weights.pth", seed=0, occl_gain=8.0,
                                   calib_frames=(video[0], video[2]))

    deltas = [np.inf, 1, 2, 4, 8, 16, 32]
    # schedules aligned with the sorted delta order [inf,1,2,4,8,16,32]
    # (configs/MFT_fast_cfg.py, configs/MFT_warm_cfg.py)
    modes = {
        "parity": (None, False),
        "fast": ([12, 4, 5, 6, 8, 10, 12], False),
        "warm": ([5, 4, 5, 6, 8, 10, 12], True),
    }
    scaling = f"{H}x{H}"
    results = {}
    for name, (schedule, warm) in modes.items():
        print(f"=== running mode {name}", flush=True)
        results[name] = run_mode(wd, name, pkl, ckpt, deltas, args.iters,
                                 schedule, warm, scaling)

    lines = ["| query mode | metric | parity (x100) | fast | warm | "
             "fast-parity | warm-parity |",
             "|---|---|---|---|---|---|---|"]
    for qm in sorted(results["parity"]):
        vals = {}
        for name in modes:
            df = results[name][qm]
            vals[name] = 100 * df.drop(columns=["seq"],
                                       errors="ignore").mean()
        for metric in KEY:
            p, f_, w = (float(vals[n][metric]) for n in
                        ("parity", "fast", "warm"))
            lines.append(f"| {qm} | {metric} | {p:.2f} | {f_:.2f} | "
                         f"{w:.2f} | {f_ - p:+.2f} | {w - p:+.2f} |")
    table = "\n".join(lines)
    print(table)
    if args.out:
        Path(args.out).write_text(table + "\n")


if __name__ == "__main__":
    sys.exit(main())
