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


def test_int8_quantized_lookup_close_to_exact(rng):
    """corr_method='int8' samples must match the exact lookup to within the
    quantization bound (max|corr| / 254 per value, times the 4-level tent
    mixing) — and the dequantized-mxu fallback must be what non-TPU
    backends produce (same int8 values, exact contraction)."""
    from mft_tpu.models.raft.corr import quantize_pyramid, _mxu_all_levels

    B, C, H, W = 2, 16, 16, 24
    f1 = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    pyr = build_corr_pyramid(f1, f2)
    levels, scales = quantize_pyramid(pyr)
    assert levels[0].dtype == jnp.int8 and scales.shape == (B, len(pyr))

    coords = jnp.asarray(rng.uniform(-4, 28, (B, H, W, 2)).astype(np.float32))
    got = corr_lookup(("i8", levels, scales), coords, radius=4)
    want = corr_lookup(pyr, coords, radius=4, method="mxu")
    bound = float(np.max(np.abs(np.asarray(pyr[0], np.float32)))) / 200.0
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=4 * bound)


def test_packed_lookup_matches_mxu(rng):
    """The lane-packed all-levels kernel (interpret mode on CPU) and its
    mxu unpack fallback must both match the exact tent-matmul lookup."""
    from mft_tpu.ops.corr_lookup_pallas import (pack_corr_pyramid,
                                                corr_lookup_pallas_packed)

    B, C, H, W = 2, 16, 16, 24
    f1 = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    pyr = build_corr_pyramid(f1, f2)
    packed, dims = pack_corr_pyramid(pyr)
    assert packed.shape == (B, H * W, H, sum(w for _, w in dims))

    coords = jnp.asarray(rng.uniform(-4, 28, (B, H, W, 2)).astype(np.float32))
    want = corr_lookup(pyr, coords, radius=4, method="mxu")

    got_kernel = corr_lookup_pallas_packed(
        packed, dims, coords.reshape(B, H * W, 2), radius=4, tile_p=128
    ).reshape(B, H, W, -1)
    np.testing.assert_allclose(np.asarray(got_kernel), np.asarray(want),
                               atol=2e-4)

    got_dispatch = corr_lookup(("packed", packed, dims), coords, radius=4)
    np.testing.assert_allclose(np.asarray(got_dispatch), np.asarray(want),
                               atol=2e-4)


def test_packed_i8_lookup_close_to_exact(rng):
    """The int8 lane-packed kernel (interpret mode on CPU) and its
    dequantize-unpack mxu fallback must match the exact lookup to within
    the quantization bound."""
    from mft_tpu.ops.corr_lookup_pallas import (pack_corr_pyramid_i8,
                                                corr_lookup_pallas_packed_i8)

    B, C, H, W = 2, 16, 16, 24
    f1 = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    pyr = build_corr_pyramid(f1, f2)
    packed, scales, dims = pack_corr_pyramid_i8(pyr)
    assert packed.dtype == jnp.int8 and scales.shape == (B, len(pyr))
    assert packed.shape == (B, H * W, H, sum(w for _, w in dims))

    coords = jnp.asarray(rng.uniform(-4, 28, (B, H, W, 2)).astype(np.float32))
    want = corr_lookup(pyr, coords, radius=4, method="mxu")
    bound = float(np.max(np.abs(np.asarray(pyr[0], np.float32)))) / 200.0

    got_kernel = corr_lookup_pallas_packed_i8(
        packed, scales, dims, coords.reshape(B, H * W, 2), radius=4,
        tile_p=128).reshape(B, H, W, -1)
    np.testing.assert_allclose(np.asarray(got_kernel, np.float32),
                               np.asarray(want, np.float32), atol=4 * bound)

    got_dispatch = corr_lookup(("packed_i8", packed, scales, dims), coords,
                               radius=4)
    np.testing.assert_allclose(np.asarray(got_dispatch, np.float32),
                               np.asarray(want, np.float32), atol=4 * bound)


def test_packed_layout_width_guard(rng):
    from mft_tpu.ops.corr_lookup_pallas import (pack_corr_pyramid,
                                                pack_corr_pyramid_i8)
    B, C, H, W = 1, 4, 80, 80  # widths 80+40+20+10 = 150 > 128
    f = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    pyr = build_corr_pyramid(f, f)
    import pytest
    with pytest.raises(ValueError):
        pack_corr_pyramid(pyr)
    with pytest.raises(ValueError):
        pack_corr_pyramid_i8(pyr)
