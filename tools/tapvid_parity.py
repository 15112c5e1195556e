"""TAP-Vid metric-parity harness: reference torch pipeline vs mft-tpu.

Runs BOTH complete benchmark pipelines — the reference's
``run_MFT_tapvid.run -> eval_MFT_tapvid.run`` (/root/reference, executed on
CPU torch as an oracle) and ours (``mft_tpu.eval.runner -> evaluate``) — on
the same synthetic TAP-Vid-DAVIS-format pickle with the SAME random-init
RAFT-OU weights (shared via a DataParallel-style .pth and our checkpoint
converter), then compares AJ / <delta_avg / OA per query mode.

This closes BASELINE.md's "δ_avg/AJ parity with the PyTorch reference" gate
at the METRIC level: not just per-frame flow parity (tests/
test_tracker_parity_e2e.py) but the full runner/protocol/eval stack
(reference run_MFT_tapvid.py:86-316, eval_MFT_tapvid.py:69-141,
tapvid_eval_stuff.py:82-237).

Usage: python tools/tapvid_parity.py [--out report.md]
The pytest wrapper lives in tests/test_tapvid_metric_parity.py.
"""

import argparse
import pickle
import sys
import types
from pathlib import Path

import numpy as np

REF = "/root/reference"


# --------------------------------------------------------------------------- #
def install_reference_stubs():
    """Stub optional deps the reference imports but this container lacks."""
    if "ipdb" not in sys.modules:
        m = types.ModuleType("ipdb")
        m.set_trace = lambda *a, **k: None
        m.post_mortem = lambda *a, **k: None
        m.iex = lambda f: f
        sys.modules["ipdb"] = m
    if "mediapy" not in sys.modules:
        import cv2

        def resize_video(video, shape):
            Ho, Wo = shape
            interp = (cv2.INTER_AREA
                      if (Ho <= video.shape[1] and Wo <= video.shape[2])
                      else cv2.INTER_LINEAR)
            return np.stack([cv2.resize(f, (Wo, Ho), interpolation=interp)
                             for f in video])

        m = types.ModuleType("mediapy")
        m.resize_video = resize_video
        sys.modules["mediapy"] = m


def patch_torch_cpu():
    """Route the reference's hardcoded .cuda()/.to('cuda') calls to CPU."""
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    def _cpu_args(args, kwargs):
        def fix(a):
            if isinstance(a, (str, torch.device)) and str(a).startswith("cuda"):
                return "cpu"
            return a
        args = tuple(fix(a) for a in args)
        if "device" in kwargs:
            kwargs["device"] = fix(kwargs["device"])
        return args, kwargs

    orig_tensor_to = torch.Tensor.to

    def tensor_to(self, *args, **kwargs):
        args, kwargs = _cpu_args(args, kwargs)
        return orig_tensor_to(self, *args, **kwargs)

    torch.Tensor.to = tensor_to
    orig_module_to = torch.nn.Module.to

    def module_to(self, *args, **kwargs):
        args, kwargs = _cpu_args(args, kwargs)
        return orig_module_to(self, *args, **kwargs)

    torch.nn.Module.to = module_to


# --------------------------------------------------------------------------- #
def make_textured_pickle(path, rng, T=6, H=128, W=128, n_tracks=8,
                         shift=(3.0, 2.0), occluded_gt=False):
    """DAVIS-format pickle: textured global translation + matching GT tracks.

    The texture gives the real RAFT something to latch onto; GT points ride
    the same global shift. GT exactness is secondary — the parity being
    tested is reference-pipeline vs our-pipeline on identical predictions.

    ``occluded_gt=True`` marks every odd track occluded for a staggered
    middle window — so the evaluator's jaccard TP/FP/FN accounting and the
    occlusion-accuracy path see genuinely mixed GT visibility (reference
    tapvid_eval_stuff.py:160-237) instead of the all-visible degenerate
    case. All tracks stay visible at t=0 and at the stride-5 query frames'
    first-visible fallback, so query extraction is unaffected.
    """
    import cv2

    big = rng.integers(0, 255, (H + 64, W + 64, 3)).astype(np.uint8)
    big = cv2.GaussianBlur(big, (7, 7), 2)
    video = np.zeros((T, H, W, 3), np.uint8)
    for t in range(T):
        x, y = 4 + int(shift[0]) * t, 6 + int(shift[1]) * t
        video[t] = big[y:y + H, x:x + W]

    base = np.stack([rng.integers(8, int(0.85 * W), (n_tracks,)) / W,
                     rng.integers(8, int(0.85 * H), (n_tracks,)) / H],
                    axis=-1)[:, None, :]
    steps = np.arange(T).reshape(1, T, 1)
    motion = steps * np.array([-shift[0] / W, -shift[1] / H]).reshape(1, 1, 2)
    points = np.clip(base + motion, 0.0, 0.95)
    occluded = np.zeros((n_tracks, T), bool)
    if occluded_gt and T >= 4:
        for j in range(1, n_tracks, 2):
            start = 1 + (j // 2) % max(1, T - 3)
            occluded[j, start:start + 2] = True
    data = {"seq0": {"video": video,
                     "points": points.astype(np.float64),
                     "occluded": occluded}}
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return path


def perturb_to_trained_like(model, rng):
    """Give a fresh torch RAFT-OU model trained-checkpoint-like statistics.

    Fresh torch init leaves every norm at weight=1 / bias=0 and BatchNorm
    running stats at mean=0 / var=1 — exactly the values where a converter
    that ignored or mis-mapped those fields would still pass random-init
    parity tests. Real trained checkpoints (the reference ships a 50k-step
    .pth, configs/flow/RAFTou_kubric_huber_split_nonoccl.py:25) have none of
    that, so this simulates them: non-trivial norm affine params, shifted
    running means, log-normal running variances, rescaled conv weights.
    """
    import torch

    with torch.no_grad():
        for _, p in model.named_parameters():
            if p.ndim <= 1:  # norm scales/biases + conv biases
                p.add_(torch.from_numpy(
                    rng.normal(0.0, 0.3, p.shape).astype(np.float32)))
            else:  # conv kernels: vary per-tensor magnitude like training
                p.mul_(float(np.exp(rng.normal(0.0, 0.2))))
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.from_numpy(
                    rng.normal(0.0, 1.5, b.shape).astype(np.float32)))
            elif name.endswith("running_var"):
                b.copy_(torch.from_numpy(
                    np.exp(rng.normal(0.0, 1.0, b.shape)).astype(np.float32)))


def make_shared_weights(path, seed=0, iters=4, occl_gain=1.0,
                        calib_frames=None, visible_frac=0.85,
                        trained_like=False):
    """Random-init torch RAFT-OU weights, saved DataParallel-style.

    ``occl_gain`` scales the occlusion head's final conv (weight and bias).
    Plain random init yields occlusion logits clustered so tightly that
    softmax(occlusion)[1] sits on one side of the evaluator's 0.5
    binarization for every pixel — pinning AJ and OA at degenerate values
    where the comparison cannot detect divergence. Scaling the last conv
    widens the logit spread; ``calib_frames`` (two HxWx3 uint8 RGB frames,
    e.g. from the synthetic pickle) then centers the logits with a single
    torch forward so ~``visible_frac`` of pixels predict VISIBLE per pair —
    without centering all probabilities land on one side of 0.5 and the
    jaccard true-positive path stays untested. The tracker's max-chaining
    pushes chained occlusion up, so a visible-leaning per-pair fraction
    yields mixed chained visibility. Both pipelines share the SAME adjusted
    weights, so this changes what is predicted, never what is compared
    (reference protocol: eval_MFT_tapvid.py:107, tapvid_eval_stuff.py:
    160-237).
    """
    import torch
    sys.path.insert(0, REF) if REF not in sys.path else None
    from MFT.RAFT.core.raft import RAFT as TorchRAFT

    torch.manual_seed(seed)
    args = _Args(occlusion_module="separate_with_uncertainty", small=False,
                 mixed_precision=False)
    model = TorchRAFT(args)
    model.eval()
    if trained_like:
        perturb_to_trained_like(model, np.random.default_rng(seed + 17))
    state = model.state_dict()
    if occl_gain != 1.0:
        for key in ("occlusion_block.occl_head.conv2.weight",
                    "occlusion_block.occl_head.conv2.bias"):
            state[key] = state[key] * occl_gain
        if calib_frames is not None:
            model.load_state_dict(state)
            f1, f2 = calib_frames
            to_t = lambda f: torch.from_numpy(
                np.transpose(f.astype(np.float32), (2, 0, 1)))[None]
            with torch.no_grad():
                out = model(to_t(f1), to_t(f2), iters=max(2, iters // 2),
                            test_mode=True)
            # occl prob = softmax(logits)[1]; visible iff l1 - l0 < 0
            d = (out["occlusion"][0, 1] - out["occlusion"][0, 0]).numpy()
            shift = float(np.quantile(d, visible_frac))
            state["occlusion_block.occl_head.conv2.bias"] = (
                state["occlusion_block.occl_head.conv2.bias"]
                - torch.tensor([0.0, shift]))
    torch.save({f"module.{k}": v for k, v in state.items()}, str(path))
    return path


# --------------------------------------------------------------------------- #
REF_TRACKER_CFG = '''
import numpy as np
import torch
from MFT.config import Config
from MFT.MFT import MFT
from MFT.RAFT.core.raft import RAFT as TorchRAFT


class CPUMFT(MFT):
    def __init__(self, config):
        super().__init__(config)
        self.device = 'cpu'


class _Args(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def make_flow(C):
    import MFT.raft as R
    wrapper = object.__new__(R.RAFTWrapper)  # skip __init__'s .to('cuda')
    wrapper.C = C
    model = torch.nn.DataParallel(TorchRAFT(C.raft_params))
    model.load_state_dict(torch.load(C.model, map_location='cpu'))
    wrapper.model = model.module.requires_grad_(False).eval()
    return wrapper


def get_config():
    conf = Config()
    conf.tracker_class = CPUMFT
    flow = Config()
    flow.of_class = make_flow
    flow.name = 'raftou_parity'
    flow.model = r"{ckpt}"
    flow.raft_params = _Args(occlusion_module='separate_with_uncertainty',
                             small=False, mixed_precision=False)
    flow.flow_iters = {iters}
    conf.flow_config = flow
    conf.deltas = [np.inf] + {finite_deltas}
    conf.occlusion_threshold = 0.02
    conf.name = 'ref_parity'
    return conf
'''

REF_DATASET_CFG = '''
from pathlib import Path
from MFT.config import Config


def get_config():
    conf = Config()
    conf.pickles = [Path(r"{pkl}")]
    conf.scaling = '{scaling}'
    conf.name = 'synth'
    return conf
'''

OUR_TRACKER_CFG = '''
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
    flow.name = 'raftou_parity'
    c.flow_config = flow
    c.deltas = [np.inf] + {finite_deltas}
    c.occlusion_threshold = 0.02
    c.name = 'our_parity'
    return c
'''

OUR_DATASET_CFG = '''
from mft_tpu.config import Config


def get_config():
    c = Config()
    c.pickles = [r"{pkl}"]
    c.scaling = '{scaling}'
    c.name = 'synth'
    return c
'''


def run_reference_pipeline(workdir, pkl, ckpt, finite_deltas, iters, scaling,
                           mode="both"):
    """Reference run->eval on CPU; returns {query_mode: DataFrame}."""
    install_reference_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    patch_torch_cpu()

    import MFT.utils.repro as repro
    repro.code_export = lambda *a, **k: None  # rsync is not in this container

    from MFT.runners import run_MFT_tapvid, eval_MFT_tapvid

    workdir = Path(workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    tcfg = workdir / "ref_tracker_cfg.py"
    tcfg.write_text(REF_TRACKER_CFG.format(ckpt=ckpt, iters=iters,
                                           finite_deltas=list(finite_deltas)))
    dcfg = workdir / "ref_dataset_cfg.py"
    dcfg.write_text(REF_DATASET_CFG.format(pkl=pkl, scaling=scaling))

    args = run_MFT_tapvid.get_parser().parse_args(
        [str(dcfg), str(tcfg), "--export", str(workdir / "export"),
         "--cache", str(workdir / "cache"), "--mode", mode])
    assert run_MFT_tapvid.run(args) == 0

    eargs = eval_MFT_tapvid.get_parser().parse_args(
        [str(dcfg), str(tcfg), "--export", str(workdir / "export"),
         "--cache", str(workdir / "cache"), "--mode", mode])
    assert eval_MFT_tapvid.run(eargs) == 0

    import pandas as pd
    out = {}
    for qm, suffix in (("first", ""), ("strided", "-strided")):
        p = workdir / "export" / "ref_parity" / "eval" / f"tapvid-eval{suffix}.pklz"
        if p.exists():
            out[qm] = pd.read_pickle(p)
    return out


def run_our_pipeline(workdir, pkl, ckpt, finite_deltas, iters, scaling,
                     mode="both"):
    """mft-tpu run->eval; returns {query_mode: DataFrame}."""
    from mft_tpu.eval import runner, evaluate

    workdir = Path(workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    tcfg = workdir / "our_tracker_cfg.py"
    tcfg.write_text(OUR_TRACKER_CFG.format(ckpt=ckpt, iters=iters,
                                           finite_deltas=list(finite_deltas)))
    dcfg = workdir / "our_dataset_cfg.py"
    dcfg.write_text(OUR_DATASET_CFG.format(pkl=pkl, scaling=scaling))

    args = runner.get_parser().parse_args(
        ["--trackers", str(tcfg), "--dataset", str(dcfg),
         "--export", str(workdir / "export"),
         "--cache", str(workdir / "cache"), "--mode", mode])
    assert runner.run(args) == 0

    eargs = evaluate.get_parser().parse_args(
        ["--trackers", str(tcfg), "--dataset", str(dcfg),
         "--export", str(workdir / "export"), "--mode", mode])
    evaluate.run(eargs)

    import pandas as pd
    out = {}
    for qm, suffix in (("first", ""), ("strided", "-strided")):
        p = workdir / "export" / "our_parity" / "eval" / f"tapvid-eval{suffix}.pklz"
        if p.exists():
            out[qm] = pd.read_pickle(p)
    return out


KEY_METRICS = ("average_jaccard", "average_pts_within_thresh",
               "occlusion_accuracy")


def compare(ref, ours):
    """-> (markdown report, max |x100 diff| over the headline metrics)."""
    lines = ["| query mode | metric | reference (x100) | mft-tpu (x100) | diff |",
             "|---|---|---|---|---|"]
    worst = 0.0
    for qm in sorted(ref):
        r = ref[qm].drop(columns=["seq"], errors="ignore").mean()
        o = ours[qm].drop(columns=["seq"], errors="ignore").mean()
        for metric in KEY_METRICS:
            rv, ov = 100 * float(r[metric]), 100 * float(o[metric])
            d = abs(rv - ov)
            worst = max(worst, d)
            lines.append(f"| {qm} | {metric} | {rv:.2f} | {ov:.2f} | {d:.2f} |")
    return "\n".join(lines), worst


def export_flax_weights(path, msgpack_path):
    """Write flax msgpack weights as a reference-style .pth (both pipelines
    then load the identical checkpoint; tools/train_synth.py provenance)."""
    import torch
    from flax import serialization
    from mft_tpu.models.raft.convert import variables_to_torch_statedict
    sys.path.insert(0, REF) if REF not in sys.path else None
    from MFT.RAFT.core.raft import RAFT as TorchRAFT

    template = TorchRAFT(_Args(occlusion_module="separate_with_uncertainty",
                               small=False,
                               mixed_precision=False)).state_dict()
    raw = Path(msgpack_path).read_bytes()
    variables = serialization.msgpack_restore(raw)
    sd = variables_to_torch_statedict(variables, template)
    # the reference loads through a DataParallel wrapper (MFT/raft.py:20-23)
    torch.save({"module." + k: torch.from_numpy(np.ascontiguousarray(
        np.asarray(v, np.float32) if np.asarray(v).dtype.kind == "f"
        else np.asarray(v))) for k, v in sd.items()}, path)
    return path


def run_parity(workdir, T=6, H=128, W=128, n_tracks=8, finite_deltas=(1, 2),
               iters=4, scaling=None, seed=0, occl_gain=1.0,
               occluded_gt=False, trained_like=False, model=None):
    workdir = Path(workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    scaling = scaling or f"{W}x{H}"
    pkl = make_textured_pickle(workdir / "synth.pkl", rng, T=T, H=H, W=W,
                               n_tracks=n_tracks, occluded_gt=occluded_gt)
    if model is not None:
        # REAL (trained) flax weights: export them as a reference-style .pth
        # so BOTH pipelines load the identical checkpoint — no gain/calib
        # tricks needed, a trained occlusion head separates on its own
        ckpt = export_flax_weights(workdir / "weights.pth", model)
    else:
        calib = None
        if occl_gain != 1.0:
            with open(pkl, "rb") as f:
                video = pickle.load(f)["seq0"]["video"]
            calib = (video[0], video[min(2, T - 1)])
        ckpt = make_shared_weights(workdir / "weights.pth", seed=seed,
                                   occl_gain=occl_gain, calib_frames=calib,
                                   trained_like=trained_like)
    ref = run_reference_pipeline(workdir / "ref", pkl, ckpt, finite_deltas,
                                 iters, scaling)
    ours = run_our_pipeline(workdir / "ours", pkl, ckpt, finite_deltas,
                            iters, scaling)
    report, worst = compare(ref, ours)
    return report, worst, ref, ours


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/tapvid_parity")
    ap.add_argument("--out", default=None, help="write markdown report here")
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--size", type=int, nargs=2, default=[128, 128])
    ap.add_argument("--deltas", type=int, nargs="*",
                    default=[1, 2, 4, 8, 16, 32],
                    help="finite deltas (inf is always included)")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--occl-gain", type=float, default=8.0,
                    help="occlusion-head logit gain (see make_shared_weights)")
    ap.add_argument("--model", default=None,
                    help="trained flax .msgpack: both pipelines run on these "
                         "weights (exported to .pth for the reference side); "
                         "disables the random-init gain/calibration tricks")
    args = ap.parse_args()
    report, worst, _, _ = run_parity(args.workdir, T=args.frames,
                                     H=args.size[0], W=args.size[1],
                                     finite_deltas=tuple(args.deltas),
                                     iters=args.iters,
                                     occl_gain=args.occl_gain,
                                     occluded_gt=True, model=args.model)
    print(report)
    print(f"\nmax |diff| over headline metrics: {worst:.2f} (x100 scale)")
    if args.out:
        if args.model:
            wline = (f"TAP-Vid-DAVIS pickle with TRAINED weights "
                     f"({args.model},\nexported to a reference-style .pth "
                     "so both sides load the identical\ncheckpoint — "
                     "docs/TRAINING.md provenance). Metrics sit at a real\n"
                     "operating point; no gain/calibration tricks.\n")
        else:
            wline = ("TAP-Vid-DAVIS pickle with shared random-init RAFT-OU "
                     "weights\n(see tools/tapvid_parity.py). GT occlusion "
                     "spans and an\nocclusion-head logit gain keep predicted "
                     "visibility VARIED, so\nAJ / OA / jaccard TP-FP-FN and "
                     "the 0.5 binarization are compared\nat non-degenerate "
                     "values.\n")
        header = (
            "# TAP-Vid metric parity: reference (torch, CPU) vs mft-tpu\n\n"
            "Both full pipelines (runner -> evaluator) on the same synthetic\n"
            + wline +
            "Regression-tested by tests/test_tapvid_metric_parity.py.\n"
            f"Full delta set [inf]+{args.deltas}, "
            f"{args.frames} frames, {args.iters} RAFT iterations.\n\n")
        Path(args.out).write_text(header + report +
                                  f"\n\nmax |diff|: {worst:.2f} (x100)\n")


if __name__ == "__main__":
    main()
