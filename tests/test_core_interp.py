"""Core bilinear gather/splat vs torch oracles.

torch (CPU) is used ONLY as a test oracle: grid_sample(align_corners=True,
padding_mode='zeros') is the exact semantic the reference relies on
(MFT/results.py:87-188), so matching it transitively matches the reference.
"""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from mft_tpu.core import (  # noqa: E402
    bilinear_sample, bilinear_splat, grid_coords, chain_flow, warp_backward,
    warp_forward_points, sample_flowou, invalid_mask, chain_results, FlowOU,
    identity_flowou,
)
from mft_tpu.core.interp import warp_forward_image  # noqa: E402


def torch_grid_sample_px(img_hwc, coords_xy):
    """Oracle: sample (H,W,C) at pixel coords (N,2) via torch grid_sample."""
    H, W, C = img_hwc.shape
    img_t = torch.from_numpy(img_hwc).permute(2, 0, 1)[None]  # 1,C,H,W
    cx = 2 * coords_xy[:, 0] / (W - 1) - 1
    cy = 2 * coords_xy[:, 1] / (H - 1) - 1
    grid = torch.from_numpy(np.stack([cx, cy], -1).astype(np.float32))[None, None]
    out = F.grid_sample(img_t, grid, align_corners=True, padding_mode="zeros")
    return out[0, :, 0, :].permute(1, 0).numpy()  # N,C


def test_bilinear_sample_matches_grid_sample(rng):
    H, W, C = 13, 17, 3
    img = rng.standard_normal((H, W, C)).astype(np.float32)
    # coords including out-of-bounds and exactly-on-border positions
    coords = np.concatenate([
        rng.uniform(-3, W + 3, (200, 1)).astype(np.float32),
        rng.uniform(-3, H + 3, (200, 1)).astype(np.float32),
    ], axis=1)
    coords[:5] = [[0, 0], [W - 1, H - 1], [W - 1.0, 0.0], [-1.0, 2.5], [W + 0.5, H + 0.5]]

    got = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))
    want = torch_grid_sample_px(img, coords)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bilinear_sample_dense_grid(rng):
    H, W = 9, 11
    img = rng.standard_normal((H, W, 2)).astype(np.float32)
    coords = np.asarray(grid_coords(H, W))
    got = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))
    np.testing.assert_allclose(got, img, atol=1e-6)


def test_chain_flow_matches_reference_formula(rng):
    """chain(A->B, B->C) == flowAB + sample(flowBC at endpoints)."""
    H, W = 12, 10
    flow_ab = rng.standard_normal((H, W, 2)).astype(np.float32) * 2
    flow_bc = rng.standard_normal((H, W, 2)).astype(np.float32) * 2
    got = np.asarray(chain_flow(jnp.asarray(flow_ab), jnp.asarray(flow_bc)))

    coords_b = np.asarray(grid_coords(H, W)) + flow_ab
    sampled = torch_grid_sample_px(flow_bc, coords_b.reshape(-1, 2)).reshape(H, W, 2)
    want = flow_ab + sampled
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_warp_backward_and_sample(rng):
    H, W = 8, 9
    flow = rng.standard_normal((H, W, 2)).astype(np.float32)
    img = rng.standard_normal((H, W, 1)).astype(np.float32)
    got = np.asarray(warp_backward(jnp.asarray(flow), jnp.asarray(img)))
    coords = (np.asarray(grid_coords(H, W)) + flow).reshape(-1, 2)
    want = torch_grid_sample_px(img, coords).reshape(H, W, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)

    pts = rng.uniform(0, 7, (5, 2)).astype(np.float32)
    fou = FlowOU(jnp.asarray(flow), jnp.asarray(img[..., 0]), jnp.asarray(np.abs(img[..., 0])))
    f_s, o_s, s_s = sample_flowou(fou, jnp.asarray(pts))
    want_f = torch_grid_sample_px(flow, pts)
    np.testing.assert_allclose(np.asarray(f_s), want_f, atol=1e-5)
    want_o = torch_grid_sample_px(img, pts)[:, 0]
    np.testing.assert_allclose(np.asarray(o_s), want_o, atol=1e-5)

    warped = warp_forward_points(jnp.asarray(flow), jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(warped), pts + want_f, atol=1e-5)


def test_invalid_mask():
    H, W = 4, 5
    flow = np.zeros((H, W, 2), np.float32)
    flow[0, 0] = [-0.5, 0]      # x -> -0.5 invalid
    flow[1, 1] = [W, 0]         # x -> W+1 invalid
    flow[2, 2] = [W - 1 - 2, 0]  # x -> W-1 valid (inclusive left, exclusive right edge at >= W)
    m = np.asarray(invalid_mask(jnp.asarray(flow)))
    assert m[0, 0] and m[1, 1] and not m[2, 2]
    assert m.sum() == 2


def test_chain_results_occl_sigma(rng):
    H, W = 6, 7
    left = FlowOU(
        jnp.asarray(rng.standard_normal((H, W, 2)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 2, (H, W)).astype(np.float32)),
    )
    right = FlowOU(
        jnp.asarray(rng.standard_normal((H, W, 2)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 2, (H, W)).astype(np.float32)),
    )
    out = chain_results(left, right)
    wb_occl = warp_backward(left.flow, right.occlusion)
    wb_sigma = warp_backward(left.flow, right.sigma)
    np.testing.assert_allclose(np.asarray(out.occlusion),
                               np.maximum(np.asarray(left.occlusion), np.asarray(wb_occl)),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.sigma),
                               np.sqrt(np.asarray(left.sigma) ** 2 + np.asarray(wb_sigma) ** 2),
                               atol=1e-5)


def test_identity_flowou_roundtrip():
    fou = identity_flowou((5, 6))
    assert fou.flow.shape == (5, 6, 2)
    assert fou.H == 5 and fou.W == 6
    np.testing.assert_array_equal(np.asarray(fou.occlusion), 0)
    # chaining identity with identity stays identity
    out = chain_results(fou, fou)
    np.testing.assert_allclose(np.asarray(out.flow), 0, atol=1e-6)


def test_bilinear_splat_conserves_mass(rng):
    """Interior points splat their full weight; grid recovers constant fields."""
    H, W = 10, 12
    N = 50
    coords = np.concatenate([
        rng.uniform(0.5, W - 1.5, (N, 1)),
        rng.uniform(0.5, H - 1.5, (N, 1)),
    ], axis=1).astype(np.float32)
    data = np.ones((N, 1), np.float32) * 3.0
    grid, counts = bilinear_splat(jnp.asarray(data), jnp.asarray(coords), (H, W))
    np.testing.assert_allclose(float(jnp.sum(counts)), N, rtol=1e-5)
    np.testing.assert_allclose(float(jnp.sum(grid)), 3.0 * N, rtol=1e-5)
    # value recovered where counts > 0
    g, c = np.asarray(grid), np.asarray(counts)
    nz = c[..., 0] > 1e-6
    np.testing.assert_allclose(g[nz, 0] / c[nz, 0], 3.0, rtol=1e-4)


def test_warp_forward_image_identity(rng):
    H, W = 7, 8
    img = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    flow = np.zeros((H, W, 2), np.float32)
    out = np.asarray(warp_forward_image(jnp.asarray(img), jnp.asarray(flow)))
    # zero flow with border-clamping quirk: last row/col get zero weight
    np.testing.assert_allclose(out[: H - 1, : W - 1], img[: H - 1, : W - 1], atol=1e-5)


def test_warp_forward_image_mask(rng):
    H, W = 6, 6
    img = np.ones((H, W, 1), np.float32)
    flow = np.zeros((H, W, 2), np.float32)
    mask = np.zeros((H, W), bool)
    mask[2, 2] = True
    out = np.asarray(warp_forward_image(jnp.asarray(img), jnp.asarray(flow),
                                        mask=jnp.asarray(mask), border=-1.0))
    assert out[2, 2, 0] == pytest.approx(1.0)
    assert out[0, 0, 0] == pytest.approx(-1.0)
