"""Tests for the self-generated synthetic flow scenes (mft_tpu/train/synth.py).

The generator exists to produce trained-LIKE weights without external data
(the reference distributes neither its datasets nor its trained .pth,
/root/reference/.MISSING_LARGE_BLOBS:1). Its GT must be *exact* by
construction — these tests check the analytic flow/occlusion against the
rendered images themselves.
"""

import numpy as np
import pytest

from mft_tpu.train.synth import Scene, make_batch, multiscale_texture, sample_pair


def test_texture_shape_and_range():
    rng = np.random.default_rng(0)
    tex = multiscale_texture(rng, 64, 96)
    assert tex.shape == (64, 96, 3) and tex.dtype == np.uint8
    # feature-rich: no near-constant texture (correlation needs structure)
    assert tex.std() > 10


def test_sample_pair_shapes_and_ranges():
    rng = np.random.default_rng(1)
    img1, img2, flow, valid, occl = sample_pair(rng, 96, 128, T=6)
    assert img1.shape == (96, 128, 3) and img1.dtype == np.uint8
    assert flow.shape == (96, 128, 2) and flow.dtype == np.float32
    assert occl.shape == (96, 128)
    assert set(np.unique(occl)) <= {0.0, 1.0}
    assert valid.min() >= 0 and valid.max() <= 1
    assert np.isfinite(flow).all()


def test_flow_is_photometrically_consistent():
    """Warping frame t by the GT flow reconstructs frame 0 on visible pixels.

    Bilinear forward-render vs nearest reconstruction bounds the residual at
    a few gray levels; occluded pixels are excluded by the GT occlusion mask.
    """
    rng = np.random.default_rng(2)
    H = W = 128
    scene = Scene(rng, H, W, T=5)
    f0 = scene.render(0).astype(np.float32)
    ft = scene.render(3).astype(np.float32)
    flow, occl = scene.flow_occl(3)
    ys, xs = np.mgrid[0:H, 0:W]
    tx = np.rint(xs + flow[..., 0]).astype(int)
    ty = np.rint(ys + flow[..., 1]).astype(int)
    inb = (tx >= 0) & (tx < W) & (ty >= 0) & (ty < H)
    vis = (occl < 0.5) & inb
    rec = ft[np.clip(ty, 0, H - 1), np.clip(tx, 0, W - 1)]
    err = np.abs(rec - f0)[vis].mean()
    assert err < 12.0, err  # gray levels; nearest-vs-bilinear + texture slope


def test_occlusion_fraction_grows_with_t():
    """Larger temporal deltas must mean more occlusion (the training signal
    the MFT chain needs: large-delta pairs are occlusion-heavy)."""
    rng = np.random.default_rng(3)
    scene = Scene(rng, 128, 128, T=8, n_sprites=4)
    _, occl1 = scene.flow_occl(1)
    _, occl7 = scene.flow_occl(7)
    assert occl7.mean() >= occl1.mean()


def test_frame0_identity():
    rng = np.random.default_rng(4)
    scene = Scene(rng, 64, 64, T=4)
    flow, occl = scene.flow_occl(0)
    assert np.abs(flow).max() < 1e-6
    assert occl.mean() < 0.01  # nothing occluded at the template frame


def test_make_batch_stacks():
    rng = np.random.default_rng(5)
    img1, img2, flow, valid, occl = make_batch(rng, 2, 64, 96, T=4)
    assert img1.shape == (2, 64, 96, 3) and img1.dtype == np.float32
    assert flow.shape == (2, 64, 96, 2)
    assert valid.shape == occl.shape == (2, 64, 96)
