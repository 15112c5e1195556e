"""End-to-end tracker parity: our MFT vs the reference torch MFT.

The reference tracker stack (MFT/MFT.py + MFT/raft.py + MFT/results.py) is
run as a TEST ORACLE on CPU with the SAME random-init RAFT-OU weights our
tracker loads through the checkpoint converter. Both trackers consume the
same synthetic BGR clip; per-frame template->t flow, occlusion and sigma
must agree. This covers the full production path end to end: encoder
feature ring, batched delta forward, chaining, per-pixel selection, ring
memory — against the reference's per-pair dict-memory implementation.

Per-pixel selection is an argmax over chained-sigma scores, so pixels where
two candidates tie within float error can legitimately pick different
winners; the comparison therefore requires a high QUANTILE of agreement
rather than allclose.
"""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

try:
    from MFT.MFT import MFT as RefMFT
    from MFT.raft import RAFTWrapper as RefRAFTWrapper
    from MFT.RAFT.core.raft import RAFT as TorchRAFT
    HAVE_REF = True
except Exception:
    HAVE_REF = False

pytestmark = [
    pytest.mark.skipif(not HAVE_REF, reason="reference repo not importable"),
    pytest.mark.slow,  # torch-oracle e2e (~1-3 min)
]

from mft_tpu.config import Config  # noqa: E402
from mft_tpu.models.raft import RAFTFlow  # noqa: E402
from mft_tpu.tracker import MFT  # noqa: E402


class _Args(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v


class _RefConfig:
    """Duck-typed reference Config: missing attrs are falsy (config.py:11-19)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __getattr__(self, name):
        return None


def _make_clip(rng, n_frames=5, H=128, W=192):
    # NB: H, W chosen so the coarsest corr-pyramid level is > 1x1 — the
    # reference's bilinear_sampler divides by (dim - 1) and NaNs otherwise
    """Smooth global translation over a blurred random texture."""
    import cv2
    big = rng.integers(0, 255, (H + 64, W + 64, 3)).astype(np.uint8)
    big = cv2.GaussianBlur(big, (7, 7), 2)
    frames = []
    for t in range(n_frames):
        x, y = 4 + 3 * t, 6 + 2 * t
        frames.append(np.ascontiguousarray(big[y:y + H, x:x + W]))
    return frames


@pytest.fixture
def cpu_cuda_patch(monkeypatch):
    """Route the reference's hardcoded .cuda() calls to CPU."""
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=True)
    yield


@pytest.mark.parametrize(
    "direction,use_cache,weights",
    [(+1, False, "random"), (-1, False, "random"), (+1, True, "random"),
     (+1, False, "trained-like")],
    ids=["forward", "backward", "forward-cached", "forward-trained-like"])
def test_tracker_e2e_matches_reference(tmp_path, rng, cpu_cuda_patch,
                                       direction, use_cache, weights):
    iters = 4
    deltas = [np.inf, 1, 2]

    # one set of random torch weights, shared via a DataParallel-style .pth;
    # 'trained-like' perturbs them to non-trivial norm affine + running
    # stats so the converter path is exercised e2e under realistic
    # statistics (VERDICT r2 item 7)
    torch.manual_seed(0)
    args = _Args(occlusion_module="separate_with_uncertainty", small=False,
                 mixed_precision=False)
    tmodel = TorchRAFT(args)
    if weights == "trained-like":
        from pathlib import Path
        repo = str(Path(__file__).resolve().parents[1])
        if repo not in sys.path:
            sys.path.insert(0, repo)
        from tools.tapvid_parity import perturb_to_trained_like
        perturb_to_trained_like(tmodel, np.random.default_rng(17))
    tmodel.eval()
    ckpt = tmp_path / "weights.pth"
    torch.save({f"module.{k}": v for k, v in tmodel.state_dict().items()}, ckpt)

    # ---- reference tracker (oracle), CPU ----
    ref_flow_cfg = _RefConfig(raft_params=args, flow_iters=iters, model=str(ckpt))
    ref_wrap = object.__new__(RefRAFTWrapper)  # skip __init__'s .to('cuda')
    ref_wrap.C = ref_flow_cfg
    model = torch.nn.DataParallel(TorchRAFT(args))
    model.load_state_dict(torch.load(ckpt, map_location="cpu"))
    ref_wrap.model = model.module.requires_grad_(False).eval()
    ref_cfg = _RefConfig(
        flow_config=_RefConfig(of_class=lambda C: ref_wrap),
        deltas=deltas, occlusion_threshold=0.02)
    ref_tracker = RefMFT(ref_cfg)
    ref_tracker.device = "cpu"

    # ---- our tracker, same weights through the converter ----
    flow_cfg = Config()
    flow_cfg.of_class = RAFTFlow
    flow_cfg.raft_params = {"occlusion_module": "separate_with_uncertainty"}
    flow_cfg.model = str(ckpt)
    flow_cfg.flow_iters = iters
    cfg = Config()
    cfg.flow_config = flow_cfg
    cfg.deltas = deltas
    cfg.occlusion_threshold = 0.02
    our_tracker = MFT(cfg)

    # our-side FlowCache keeps the fused path (cache hits injected as device
    # arrays, computed pairs written back — tracker/mft.py
    # _track_fused_cached); outputs must be identical to the reference
    cache = None
    if use_cache:
        from mft_tpu.io.cache import FlowCache
        cache = FlowCache(tmp_path / "flow_cache")

    frames = _make_clip(rng)
    if direction < 0:
        start = len(frames) - 1
        ref_tracker.init(frames[-1], start_frame_i=start, time_direction=-1)
        our_tracker.init(frames[-1], start_frame_i=start, time_direction=-1,
                         flow_cache=cache)
        frames = frames[-2::-1]
    else:
        template_frame = frames[0]
        ref_tracker.init(frames[0])
        our_tracker.init(frames[0], flow_cache=cache)
        frames = frames[1:]

    for t, frame in enumerate(frames, start=1):
        with torch.no_grad():
            ref_meta = ref_tracker.track(frame)
        our_meta = our_tracker.track(frame)

        ref_flow = ref_meta.result.flow.cpu().numpy()          # (2, H, W)
        ref_occl = ref_meta.result.occlusion.cpu().numpy()[0]  # (H, W)
        ref_sigma = ref_meta.result.sigma.cpu().numpy()[0]
        got_flow = np.transpose(np.asarray(our_meta.result.flow), (2, 0, 1))
        got_occl = np.asarray(our_meta.result.occlusion)
        got_sigma = np.asarray(our_meta.result.sigma)

        flow_err = np.abs(got_flow - ref_flow).max(axis=0)
        occl_err = np.abs(got_occl - ref_occl)
        sigma_err = np.abs(got_sigma - ref_sigma) / (np.abs(ref_sigma) + 1e-3)

        # selection ties may flip isolated pixels; the field must agree
        assert np.quantile(flow_err, 0.99) < 0.05, \
            f"frame {t}: q99 flow err {np.quantile(flow_err, 0.99):.4f}"
        assert np.median(flow_err) < 5e-3, \
            f"frame {t}: median flow err {np.median(flow_err):.5f}"
        assert np.quantile(occl_err, 0.99) < 0.05, \
            f"frame {t}: q99 occl err {np.quantile(occl_err, 0.99):.4f}"
        assert np.quantile(sigma_err, 0.99) < 0.05, \
            f"frame {t}: q99 sigma rel err {np.quantile(sigma_err, 0.99):.4f}"

    if use_cache:
        # WARM-cache pass: every finite pair hits, so frames run through the
        # injection variant (_get_fused_frame_inject, only the non-cacheable
        # delta=inf pair re-runs RAFT) — results must match the cold pass
        first_pass = np.asarray(our_meta.result.flow)
        warm_tracker = MFT(cfg)
        warm_tracker.init(template_frame, flow_cache=cache)
        for frame in frames:
            warm_meta = warm_tracker.track(frame)
        np.testing.assert_allclose(np.asarray(warm_meta.result.flow),
                                   first_pass, atol=1e-4)
