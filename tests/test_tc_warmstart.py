"""TC correspondence mode + flow_init warm start of the flow service.

Reference parity targets: RAFTWrapper.compute_flow mode='TC'
(MFT/raft.py:75-94), flow_init handling (MFT/raft.py:49-52 + raft.py:151-154
coords init), forward_interpolate warm-start advection (utils.py:67-95).
"""

import numpy as np
import pytest
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # full-RAFT warm-start paths (~1.5 min)

from mft_tpu.config import Config
from mft_tpu.models.raft import RAFTFlow


def _flower(iters=3):
    cfg = Config()
    cfg.raft_params = {"occlusion_module": "separate_with_uncertainty",
                       "small": True}
    cfg.model = None
    cfg.flow_iters = iters
    return RAFTFlow(cfg)


def test_tc_mode_matches_flow_mode(rng):
    H, W = 64, 96
    img1 = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
    img2 = np.roll(img1, 3, axis=1)
    fl = _flower()

    flow, extra = fl.compute_flow(img1, img2, mode="flow")
    src, dst, tc_extra = fl.compute_flow(img1, img2, mode="TC")

    assert src.shape == (H * W, 2) and dst.shape == (H * W, 2)
    # dst - src IS the dense flow, flattened in raster order
    np.testing.assert_allclose(np.asarray(dst - src),
                               np.asarray(flow).reshape(-1, 2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc_extra["occlusion"]),
                               np.asarray(extra["occlusion"]).reshape(-1),
                               atol=1e-6)
    # src coords are the pixel grid
    assert np.allclose(src[0], [0, 0]) and np.allclose(src[-1], [W - 1, H - 1])


def test_flow_init_changes_low_res_coords(rng):
    """A large warm-start flow must shift the result (coords1 += init/8)."""
    H, W = 64, 96
    img1 = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
    img2 = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
    fl = _flower(iters=1)

    flow0, _ = fl.compute_flow(img1, img2, mode="flow")
    init = np.full((H, W, 2), 16.0, np.float32)
    flow1, _ = fl.compute_flow(img1, img2, mode="flow",
                               init_flow=jnp.asarray(init))
    d0 = float(np.abs(np.asarray(flow0)).mean())
    d1 = float(np.abs(np.asarray(flow1 - flow0)).mean())
    assert d1 > 1.0, f"warm start had no effect (base {d0}, delta {d1})"


def test_forward_interpolate_advects(rng):
    from mft_tpu.models.raft.upsample import forward_interpolate

    H, W = 32, 48
    flow = np.zeros((H, W, 2), np.float32)
    flow[..., 0] = 5.0  # uniform rightward motion
    out = forward_interpolate(flow)
    assert out.shape == (H, W, 2)
    # advected field keeps the motion in the interior
    assert np.allclose(out[H // 2, W // 2], [5.0, 0.0], atol=1e-5)
