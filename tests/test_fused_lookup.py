"""Fused corr-lookup -> motion-encoder convc1 epilogue.

The inference path can compute relu(convc1(corr_lookup(...))) inside the
lookup's Pallas kernel (ops/corr_lookup_pallas.py corr_lookup_pallas_fused,
wired via corr.py corr_lookup_fused_conv and a callable ``corr`` handed to
BasicMotionEncoder). Contract: identical math to the unfused composition
(lookup output quantized through the volume dtype, f32 conv accumulation),
identical parameter tree, and exact no-op when the flag is off.

On CPU the kernel runs in Pallas interpret mode — same program.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mft_tpu.models.raft.corr import (build_corr_pyramid, corr_lookup,
                                      corr_lookup_fused_conv)
from mft_tpu.models.raft.raft import RAFT, RAFTParams
from mft_tpu.ops.corr_lookup_pallas import corr_lookup_pallas_fused

H, W = 48, 64


def _setup(rng, B=1, H8=16, W8=32, C=64, dtype=jnp.float32, F=256):
    f1 = jnp.asarray(rng.standard_normal((B, H8, W8, C)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((B, H8, W8, C)).astype(np.float32))
    pyr = [l.astype(dtype) for l in build_corr_pyramid(f1, f2, 4)]
    P = H8 * W8
    coords = jnp.asarray(rng.uniform(-3, 40, (B, P, 2)).astype(np.float32))
    Cch = 4 * 9 * 9
    wc = jnp.asarray(rng.standard_normal((Cch, F)).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.standard_normal((F,)).astype(np.float32) * 0.1)
    return pyr, coords, wc, bias


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_kernel_matches_composition(rng, dtype):
    B, H8, W8 = 1, 16, 32
    pyr, coords, wc, bias = _setup(rng, B, H8, W8, dtype=dtype)
    # unfused contract: lookup written in the volume dtype, then f32-acc conv
    samples = corr_lookup(pyr, coords.reshape(B, H8, W8, 2), 4,
                          method="mxu").reshape(B, H8 * W8, -1)
    want = jnp.maximum(
        jnp.einsum("bpc,cf->bpf", samples.astype(dtype).astype(jnp.float32),
                   wc.astype(dtype).astype(jnp.float32)) + bias, 0.0)
    got = corr_lookup_pallas_fused(pyr, coords, wc.astype(dtype), bias,
                                   radius=4, tile_p=128)
    assert got.dtype == dtype
    tol = 2e-4 if dtype == jnp.float32 else 0.15
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want.astype(dtype), np.float32),
                               atol=tol, rtol=tol)


def test_fused_conv_dispatch_fallback_matches(rng):
    """corr_lookup_fused_conv off-TPU composes unfused — same math."""
    B, H8, W8 = 2, 16, 32
    pyr, coords, wc, bias = _setup(rng, B, H8, W8)
    kernel = wc.reshape(1, 1, -1, wc.shape[-1])
    got = corr_lookup_fused_conv(pyr, coords.reshape(B, H8, W8, 2),
                                 kernel, bias, radius=4)
    samples = corr_lookup(pyr, coords.reshape(B, H8, W8, 2), 4)
    want = jnp.maximum(
        jnp.einsum("bhwc,cf->bhwf", samples, wc) + bias, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


@pytest.fixture(scope="module")
def fuse_models():
    """Same params applied by a fuse-off and a fuse-on model."""
    off = RAFT(cfg=RAFTParams(fuse_lookup="off"))
    on = RAFT(cfg=RAFTParams(fuse_lookup="on"))
    dummy = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = off.init(jax.random.PRNGKey(0), dummy, dummy, iters=1)
    # identical parameter trees: the fused path's _ConvParams declares the
    # same {convc1: kernel, bias} leaves as the MXConv it replaces
    v_on = on.init(jax.random.PRNGKey(0), dummy, dummy, iters=1)
    assert (jax.tree.structure(variables) == jax.tree.structure(v_on))
    return off, on, variables


def _fwd(model, variables, imgs, iters):
    B = imgs.shape[0] // 2
    fmap, cnet = model.apply(variables, imgs,
                             method=lambda m, im: m.encode(im))
    return model.apply(
        variables, fmap[:B], fmap[B:], cnet[:B],
        method=lambda m, a, b, c: m.flow_from_features(
            a, b, c, iters=iters, test_mode=True))


def test_raft_forward_fused_matches_unfused(rng, fuse_models):
    off, on, variables = fuse_models
    imgs = jnp.asarray(rng.integers(0, 255, (4, H, W, 3)).astype(np.float32))
    ref = _fwd(off, variables, imgs, iters=3)
    out = _fwd(on, variables, imgs, iters=3)
    for k in ("flow", "occlusion", "uncertainty", "coords"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=2e-4, atol=2e-4, err_msg=k)


def test_raft_scheduled_fused_matches_unfused(rng, fuse_models):
    off, on, variables = fuse_models
    imgs = jnp.asarray(rng.integers(0, 255, (6, H, W, 3)).astype(np.float32))
    sched = (3, 1, 2)
    ref = _fwd(off, variables, imgs, iters=sched)
    out = _fwd(on, variables, imgs, iters=sched)
    for k in ("flow", "occlusion", "uncertainty", "coords"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=2e-4, atol=2e-4, err_msg=k)
