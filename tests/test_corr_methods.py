"""The MXU (tent-matmul) corr lookup must match the gather formulation."""

import numpy as np
import jax.numpy as jnp

from mft_tpu.models.raft.corr import build_corr_pyramid, corr_lookup


def test_mxu_lookup_matches_gather(rng):
    B, C, H, W = 2, 16, 16, 24
    f1 = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    pyr = build_corr_pyramid(f1, f2)
    # coords including out-of-range positions (zeros-padding must agree)
    coords = jnp.asarray(rng.uniform(-4, 28, (B, H, W, 2)).astype(np.float32))
    got = corr_lookup(pyr, coords, radius=4, method="mxu")
    want = corr_lookup(pyr, coords, radius=4, method="gather")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
