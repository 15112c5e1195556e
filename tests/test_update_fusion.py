"""Tests for the fused-conv apply paths in the update/OU blocks.

The z/r GRU convs and the OU heads' first convs run as single fused convs
at apply time (output-axis kernel concat, update.py _fused_conv_pair). These
tests pin down that the fusion is bit-compatible with applying the convs
separately from the same parameters, and that need_mask=False skips the
mask head.
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from mft_tpu.models.raft.update import (
    BasicUpdateBlock,
    OcclusionAndUncertaintyBlock,
    SepConvGRU,
    _pad,
)


@pytest.fixture
def sep_gru_setup(rng):
    gru = SepConvGRU(hidden_dim=32)
    h = jnp.asarray(rng.normal(size=(2, 8, 8, 32)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 48)), jnp.float32)
    variables = gru.init(jax.random.PRNGKey(0), h, x)
    return gru, variables, h, x


def _manual_sep_gru(params, h, x, hidden):
    """Reference SepConvGRU with separate z/r convs from the same params."""
    def conv(p, inp, pad):
        y = jax.lax.conv_general_dilated(
            inp, p["kernel"], (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + p["bias"]

    for suffix, pad in (("1", [(0, 0), (2, 2)]), ("2", [(2, 2), (0, 0)])):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(conv(params[f"convz{suffix}"], hx, pad))
        r = nn.sigmoid(conv(params[f"convr{suffix}"], hx, pad))
        q = jnp.tanh(conv(params[f"convq{suffix}"],
                          jnp.concatenate([r * h, x], axis=-1), pad))
        h = (1.0 - z) * h + z * q
    return h


def test_sep_gru_fused_zr_matches_separate(sep_gru_setup):
    gru, variables, h, x = sep_gru_setup
    got = gru.apply(variables, h, x)
    want = _manual_sep_gru(variables["params"], h, x, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_update_block_need_mask_false_returns_none(rng):
    blk = BasicUpdateBlock(hidden_dim=32)
    net = jnp.asarray(rng.normal(size=(1, 8, 8, 32)), jnp.float32)
    inp = jnp.asarray(rng.normal(size=(1, 8, 8, 32)), jnp.float32)
    corr = jnp.asarray(rng.normal(size=(1, 8, 8, 324)), jnp.float32)
    flow = jnp.zeros((1, 8, 8, 2))
    variables = blk.init(jax.random.PRNGKey(0), net, inp, corr, flow)

    _, mask_on, df_on, _ = blk.apply(variables, net, inp, corr, flow,
                                     need_mask=True)
    _, mask_off, df_off, _ = blk.apply(variables, net, inp, corr, flow,
                                       need_mask=False)
    assert mask_on is not None and mask_on.shape == (1, 8, 8, 576)
    assert mask_off is None
    # skipping the mask head must not change any other output
    np.testing.assert_array_equal(np.asarray(df_on), np.asarray(df_off))


def test_ou_block_fused_head_matches_separate(rng):
    ou = OcclusionAndUncertaintyBlock(architecture="simple")
    net = jnp.asarray(rng.normal(size=(1, 8, 8, 128)), jnp.float32)
    inp = jnp.asarray(rng.normal(size=(1, 8, 8, 128)), jnp.float32)
    corr = jnp.asarray(rng.normal(size=(1, 8, 8, 324)), jnp.float32)
    flow = jnp.asarray(rng.normal(size=(1, 8, 8, 2)), jnp.float32)
    dflow = jnp.asarray(rng.normal(size=(1, 8, 8, 2)), jnp.float32)
    mf = jnp.asarray(rng.normal(size=(1, 8, 8, 128)), jnp.float32)
    variables = ou.init(jax.random.PRNGKey(0), net, inp, corr, flow, dflow, mf)

    occl, unc = ou.apply(variables, net, inp, corr, flow, dflow, mf)

    # manual separate-head application from the same params
    x = jnp.concatenate([net, inp, corr, flow, dflow, mf], axis=-1)

    def head(p):
        def conv(pp, inp_):
            y = jax.lax.conv_general_dilated(
                inp_, pp["kernel"], (1, 1), _pad(3),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + pp["bias"]
        return conv(p["conv2"], nn.relu(conv(p["conv1"], x)))

    want_occl = head(variables["params"]["occl_head"])
    want_unc = head(variables["params"]["uncertainty_head"])
    np.testing.assert_allclose(np.asarray(occl), np.asarray(want_occl),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(unc), np.asarray(want_unc),
                               atol=1e-5, rtol=1e-5)


def test_corr_lookup_pallas_bf16_volume_bf16_output(rng):
    from mft_tpu.models.raft.corr import build_corr_pyramid
    from mft_tpu.ops.corr_lookup_pallas import corr_lookup_pallas

    B, H8, W8, C = 1, 16, 16, 32
    f1 = jnp.asarray(rng.normal(size=(B, H8, W8, C)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(B, H8, W8, C)), jnp.float32)
    coords = jnp.asarray(
        rng.uniform(1, 14, size=(B, H8 * W8, 2)), jnp.float32)

    pyr32 = build_corr_pyramid(f1, f2, 3, False, dtype=jnp.float32)
    pyr16 = build_corr_pyramid(f1, f2, 3, False, dtype=jnp.bfloat16)
    out32 = corr_lookup_pallas(pyr32, coords, radius=3, tile_p=128)
    out16 = corr_lookup_pallas(pyr16, coords, radius=3, tile_p=128)

    assert out32.dtype == jnp.float32
    assert out16.dtype == jnp.bfloat16
    # bf16 volume+output stays within bf16 quantization of the f32 result
    np.testing.assert_allclose(np.asarray(out16, np.float32),
                               np.asarray(out32), atol=0.15, rtol=0.02)


def test_corr_lookup_pallas_is_differentiable(rng):
    """The Pallas lookup's custom VJP must match the mxu path's gradients."""
    from mft_tpu.models.raft.corr import build_corr_pyramid, corr_lookup

    B, H8, W8, C = 1, 16, 16, 32
    f1 = jnp.asarray(rng.normal(size=(B, H8, W8, C)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(B, H8, W8, C)), jnp.float32)
    coords = jnp.asarray(rng.uniform(2, 13, size=(B, H8, W8, 2)), jnp.float32)

    def loss(method):
        def fn(a, b):
            pyr = build_corr_pyramid(a, b, 3, False)
            out = corr_lookup(pyr, coords, radius=3, method=method)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return fn

    g1_p, g2_p = jax.grad(loss("pallas"), argnums=(0, 1))(f1, f2)
    g1_m, g2_m = jax.grad(loss("mxu"), argnums=(0, 1))(f1, f2)
    np.testing.assert_allclose(np.asarray(g1_p), np.asarray(g1_m),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g2_p), np.asarray(g2_m),
                               atol=1e-3, rtol=1e-4)


def test_conv_matmul_backend_matches_conv(rng):
    """conv_apply matmul path == conv path (accumulation-order tolerance);
    full BasicUpdateBlock with matmul convs matches the conv build."""
    import jax
    import jax.numpy as jnp
    from mft_tpu.models.raft.update import BasicUpdateBlock, conv_apply

    x = jnp.asarray(rng.standard_normal((2, 8, 12, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 16, 24)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((24,)), jnp.float32)
    pad = [(1, 1), (1, 1)]
    y_conv = conv_apply(x, k, b, pad, jnp.float32, matmul=False)
    y_mm = conv_apply(x, k, b, pad, jnp.float32, matmul=True)
    np.testing.assert_allclose(np.asarray(y_mm), np.asarray(y_conv),
                               rtol=1e-5, atol=1e-5)
    # im2col: same conv as ONE GEMM over channel-concatenated shifted views
    y_i2c = conv_apply(x, k, b, pad, jnp.float32, matmul="im2col")
    np.testing.assert_allclose(np.asarray(y_i2c), np.asarray(y_conv),
                               rtol=1e-5, atol=1e-5)
    # hybrid: tiny-Cin convs route to im2col, wide ones to shifted matmuls
    x2 = jnp.asarray(rng.standard_normal((2, 8, 12, 2)), jnp.float32)
    k7 = jnp.asarray(rng.standard_normal((7, 7, 2, 24)), jnp.float32)
    y7_conv = conv_apply(x2, k7, b, [(3, 3), (3, 3)], jnp.float32, False)
    y7_hyb = conv_apply(x2, k7, b, [(3, 3), (3, 3)], jnp.float32, "hybrid")
    np.testing.assert_allclose(np.asarray(y7_hyb), np.asarray(y7_conv),
                               rtol=1e-5, atol=1e-5)
    y_hyb = conv_apply(x, k, b, pad, jnp.float32, matmul="hybrid")
    np.testing.assert_allclose(np.asarray(y_hyb), np.asarray(y_mm),
                               rtol=0, atol=0)  # wide Cin -> exactly shifted
    # asymmetric kernels as used by the GRU
    k15 = jnp.asarray(rng.standard_normal((1, 5, 16, 8)), jnp.float32)
    b15 = jnp.asarray(rng.standard_normal((8,)), jnp.float32)
    y1 = conv_apply(x, k15, b15, [(0, 0), (2, 2)], jnp.float32, False)
    y2 = conv_apply(x, k15, b15, [(0, 0), (2, 2)], jnp.float32, True)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)

    B, H8, W8 = 2, 8, 8
    net = jnp.asarray(rng.standard_normal((B, H8, W8, 128)), jnp.float32)
    inp = jnp.asarray(rng.standard_normal((B, H8, W8, 128)), jnp.float32)
    corr = jnp.asarray(rng.standard_normal((B, H8, W8, 324)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((B, H8, W8, 2)), jnp.float32)
    blk_c = BasicUpdateBlock(matmul=False)
    blk_m = BasicUpdateBlock(matmul=True)
    variables = blk_c.init(jax.random.PRNGKey(0), net, inp, corr, flow)
    # identical param trees are valid for both builds (names unchanged)
    out_c = blk_c.apply(variables, net, inp, corr, flow)
    out_m = blk_m.apply(variables, net, inp, corr, flow)
    for a, b_ in zip(out_c, out_m):
        if a is None:
            assert b_ is None
            continue
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_conv_pallas_backend_matches_conv(rng):
    """conv_apply 'pallas' (ops/conv_pallas.py fused VMEM-accumulator
    kernel, interpret mode on CPU) == conv path for the update block's
    kernel shapes: 3x3 SAME, GRU (1,5)/(5,1), 1x1 VALID, and the tiny-Cin
    7x7 (which routes to im2col)."""
    import jax.numpy as jnp
    from mft_tpu.models.raft.update import conv_apply

    x = jnp.asarray(rng.standard_normal((2, 16, 64, 24)), jnp.float32)
    cases = [
        ((3, 3, 24, 32), [(1, 1), (1, 1)]),
        ((1, 5, 24, 16), [(0, 0), (2, 2)]),
        ((5, 1, 24, 16), [(2, 2), (0, 0)]),
        ((1, 1, 24, 16), "VALID"),
    ]
    for kshape, pad in cases:
        k = jnp.asarray(rng.standard_normal(kshape), jnp.float32)
        b = jnp.asarray(rng.standard_normal(kshape[-1:]), jnp.float32)
        y0 = conv_apply(x, k, b, pad, jnp.float32, matmul=False)
        y1 = conv_apply(x, k, b, pad, jnp.float32, matmul="pallas")
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=1e-4, atol=1e-4)
    # tiny-Cin 7x7 routes to im2col inside the pallas backend
    x2 = jnp.asarray(rng.standard_normal((2, 16, 64, 2)), jnp.float32)
    k7 = jnp.asarray(rng.standard_normal((7, 7, 2, 24)), jnp.float32)
    b7 = jnp.asarray(rng.standard_normal((24,)), jnp.float32)
    y0 = conv_apply(x2, k7, b7, [(3, 3), (3, 3)], jnp.float32, matmul=False)
    y1 = conv_apply(x2, k7, b7, [(3, 3), (3, 3)], jnp.float32,
                    matmul="pallas")
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)
