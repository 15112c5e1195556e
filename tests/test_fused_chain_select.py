"""Fused (select-late) chain+select must equal chain-all-then-select."""

import numpy as np
import jax
import jax.numpy as jnp

from mft_tpu.core.flowou import FlowOU, chain_results
from mft_tpu.tracker.select import select_best
from mft_tpu.tracker.fused import chain_select


def make_candidates(rng, N=5, H=14, W=17, flow_scale=3.0):
    left = FlowOU(
        jnp.asarray(rng.standard_normal((N, H, W, 2)).astype(np.float32) * flow_scale),
        jnp.asarray(rng.uniform(0, 0.2, (N, H, W)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.1, 2, (N, H, W)).astype(np.float32)),
    )
    right = FlowOU(
        jnp.asarray(rng.standard_normal((N, H, W, 2)).astype(np.float32) * flow_scale),
        jnp.asarray(rng.uniform(0, 0.2, (N, H, W)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.1, 2, (N, H, W)).astype(np.float32)),
    )
    return left, right


def reference_path(left, right, valid, thresh):
    chained = jax.vmap(chain_results)(left, right)
    return select_best(chained.flow, chained.occlusion, chained.sigma,
                       valid, thresh)


def test_fused_equals_reference_path(rng):
    left, right = make_candidates(rng)
    valid = jnp.asarray([True, True, False, True, True])
    want = reference_path(left, right, valid, 0.15)
    got = chain_select(left, right, valid, 0.15)
    np.testing.assert_allclose(np.asarray(got.sigma), np.asarray(want.sigma),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.occlusion),
                               np.asarray(want.occlusion), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.flow), np.asarray(want.flow),
                               atol=1e-5)


def test_fused_with_large_flows_out_of_image(rng):
    """Endpoints far outside the image: zeros padding + invalid marking."""
    left, right = make_candidates(rng, flow_scale=30.0)
    valid = jnp.ones((5,), bool)
    want = reference_path(left, right, valid, 0.15)
    got = chain_select(left, right, valid, 0.15)
    np.testing.assert_allclose(np.asarray(got.flow), np.asarray(want.flow),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.occlusion),
                               np.asarray(want.occlusion), atol=1e-5)
