"""Pallas TPU kernels vs their exact jnp reference implementations.

On CPU the kernels run in Pallas interpret mode — same program, executed by
the interpreter — so these tests verify the kernel math (tiling, tent
weights, channel layout, zeros padding) end to end.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from mft_tpu.core.flowou import FlowOU
from mft_tpu.core.interp import bilinear_sample
from mft_tpu.models.raft.corr import build_corr_pyramid, corr_lookup
from mft_tpu.ops.corr_lookup_pallas import (
    build_corr_pyramid_t,
    corr_lookup_pallas,
    corr_lookup_pallas_t,
)
from mft_tpu.ops.warp_pallas import bilinear_warp_pallas, split_hi_lo
from mft_tpu.tracker.fused import chain_select_pallas, chain_select_ref


def _pyramid(rng, B=1, H=16, W=32, C=64):
    f1 = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    return f1, f2


def test_corr_lookup_pallas_matches_mxu(rng):
    B, H8, W8 = 1, 16, 32
    P = H8 * W8
    f1, f2 = _pyramid(rng, B, H8, W8)
    pyr = build_corr_pyramid(f1, f2, 4)
    coords = jnp.asarray(
        rng.uniform(-3, 40, (B, P, 2)).astype(np.float32))
    want = corr_lookup(pyr, coords.reshape(B, H8, W8, 2), 4,
                       method="mxu").reshape(B, P, -1)
    got = corr_lookup_pallas(pyr, coords, 4, tile_p=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_corr_lookup_pallas_t_matches_gather(rng):
    B, H8, W8 = 1, 16, 32
    P = H8 * W8
    f1, f2 = _pyramid(rng, B, H8, W8)
    pyr = build_corr_pyramid(f1, f2, 4)
    pyr_t = build_corr_pyramid_t(f1, f2, 4)
    # transposed pyramid holds the same values
    for lvl, (p, pt) in enumerate(zip(pyr, pyr_t)):
        np.testing.assert_allclose(
            np.asarray(p.reshape(B, P, -1)),
            np.asarray(pt.reshape(B, -1, P).swapaxes(1, 2)),
            atol=1e-5, err_msg=f"level {lvl}")
    coords = jnp.asarray(
        rng.uniform(-3, 40, (B, P, 2)).astype(np.float32))
    want = corr_lookup(pyr, coords.reshape(B, H8, W8, 2), 4,
                       method="gather").reshape(B, P, -1)
    got = corr_lookup_pallas_t(pyr_t, coords, 4, tile_p=512)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_bilinear_warp_pallas_f32_exact(rng):
    N, H, W, C = 2, 32, 16, 4
    P = 64
    maps = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    coords = jnp.asarray(
        (rng.random((N, P, 2)) * [[W * 1.3, H * 1.3]] - 2).astype(np.float32))
    want = jnp.stack([bilinear_sample(maps[n], coords[n]) for n in range(N)])
    got = bilinear_warp_pallas(maps, coords, dot_dtype=jnp.float32,
                               tile_p=64, snap=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_bilinear_warp_pallas_hi_lo_large_values(rng):
    """bf16 hi/lo split + snapped tents must sample large flow accurately."""
    N, H, W = 1, 32, 32
    P = 128
    # large values but realistic gradients (a few px/px, like real flow):
    # affine base + small noise
    ygrid, xgrid = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    base = np.stack([150 + 2.0 * xgrid - 1.0 * ygrid,
                     -120 + 1.5 * ygrid + 0.5 * xgrid], axis=-1)
    noise = rng.standard_normal((N, H, W, 2)) * 0.5
    flow = jnp.asarray((base[None] + noise).astype(np.float32))
    coords = jnp.asarray(
        (rng.random((N, P, 2)) * [[W - 1, H - 1]]).astype(np.float32))
    want = jnp.stack([bilinear_sample(flow[n], coords[n]) for n in range(N)])
    hi, lo = split_hi_lo(flow)
    maps = jnp.concatenate([hi.astype(jnp.bfloat16),
                            lo.astype(jnp.bfloat16)], axis=-1)
    got4 = bilinear_warp_pallas(maps, coords, tile_p=128)
    got = got4[..., 0:2] + got4[..., 2:4]
    # gradient ~2 px/px, 1/256 snap -> ~0.01 px + 2^-16 value error
    err = np.abs(np.asarray(got) - np.asarray(want)).max()
    assert err < 0.05, err
    # plain bf16 (no split) is much worse on 200-px values
    got_plain = bilinear_warp_pallas(hi.astype(jnp.bfloat16), coords,
                                     tile_p=128)
    err_plain = np.abs(np.asarray(got_plain) - np.asarray(want)).max()
    assert err < err_plain


def test_chain_select_pallas_matches_ref(rng):
    N, H, W = 4, 16, 16
    def mk(*s):
        return jnp.asarray(rng.random(s).astype(np.float32))
    left = FlowOU(flow=mk(N, H, W, 2) * 6 - 3,
                  occlusion=mk(N, H, W) * 0.015,
                  sigma=mk(N, H, W) + 0.1)
    right = FlowOU(flow=mk(N, H, W, 2) * 6 - 3,
                   occlusion=mk(N, H, W) * 0.015,
                   sigma=mk(N, H, W) + 0.1)
    valid = jnp.asarray([True, True, False, True])
    a = chain_select_ref(left, right, valid, 0.02)
    b = chain_select_pallas(left, right, valid, 0.02)
    # winners must agree except at near-ties; compare field values
    occl_close = np.isclose(np.asarray(a.occlusion), np.asarray(b.occlusion),
                            atol=2e-2)
    assert occl_close.mean() > 0.99
    sig_close = np.isclose(np.asarray(a.sigma), np.asarray(b.sigma),
                           atol=2e-2)
    assert sig_close.mean() > 0.99
    flow_close = np.isclose(np.asarray(a.flow), np.asarray(b.flow), atol=0.15)
    assert flow_close.mean() > 0.98


@pytest.mark.slow
def test_alt_corr_matches_volume_lookup(rng):
    """On-the-fly alt corr (no materialized volume) == volume lookup."""
    from mft_tpu.ops.alt_corr_pallas import (build_feature_pyramid,
                                             corr_lookup_alt)
    B, H8, W8, C = 1, 16, 32, 64
    P = H8 * W8
    f1, f2 = _pyramid(rng, B, H8, W8, C)
    pyr = build_corr_pyramid(f1, f2, 4)
    coords = jnp.asarray(rng.uniform(-3, 40, (B, P, 2)).astype(np.float32))
    want = corr_lookup(pyr, coords.reshape(B, H8, W8, 2), 4,
                       method="gather").reshape(B, P, -1)
    f2pyr = build_feature_pyramid(f2, 4, dtype=jnp.float32)
    got = corr_lookup_alt(f1.reshape(B, P, C), f2pyr, coords, 4, tile_p=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_alt_corr_full_model(rng):
    """RAFT with corr_method='alt' matches the default path."""
    import jax
    from mft_tpu.models.raft.raft import RAFT, RAFTParams

    img1 = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32))
    out = {}
    for method in ("mxu", "alt"):
        cfg = RAFTParams(corr_method=method)
        model = RAFT(cfg=cfg, train_mode=False)
        v = model.init(jax.random.PRNGKey(0), img1, img2, iters=1)
        out[method] = model.apply(v, img1, img2, iters=3, test_mode=True)
    np.testing.assert_allclose(np.asarray(out["alt"]["flow"]),
                               np.asarray(out["mxu"]["flow"]),
                               atol=0.05, rtol=0.01)


def test_bilinear_warp_blocked_matches_banded(rng):
    """2D-block-tiled warp == 1D-banded warp (wild + local coords)."""
    from mft_tpu.ops.warp_pallas import (bilinear_warp_banded,
                                         bilinear_warp_blocked)
    N, H, W, C = 1, 64, 64, 3
    P = H * W
    maps = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    for kind in ("wild", "local"):
        if kind == "wild":
            coords = jnp.asarray(
                (rng.random((N, P, 2)) * [[W * 1.3, H * 1.3]] - 4)
                .astype(np.float32))
        else:
            g = np.mgrid[0:H, 0:W].transpose(1, 2, 0)[..., ::-1]
            coords = jnp.asarray(
                (g.reshape(1, P, 2) + rng.random((N, P, 2)) * 4 - 2)
                .astype(np.float32))
        want = bilinear_warp_banded(maps, coords, band=16, tile_p=64)
        got = bilinear_warp_blocked(maps, coords, ywin=16, xband=16,
                                    block_hw=(8, 8))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, err_msg=kind)


@pytest.mark.slow
def test_corr_lookup_win_matches_gather(rng):
    """Windowed on-the-fly lookup (fast path + fallback) == volume lookup."""
    from mft_tpu.ops.alt_corr_pallas import (build_feature_pyramid_slab,
                                             corr_lookup_win)
    B, H8, W8, C = 1, 64, 32, 64
    P = H8 * W8
    f1, f2 = _pyramid(rng, B, H8, W8, C)
    pyr = build_corr_pyramid(f1, f2, 4)
    slabs = build_feature_pyramid_slab(f2, 4, dtype=jnp.float32)
    g = np.mgrid[0:H8, 0:W8].transpose(1, 2, 0)[..., ::-1]
    for name, coords in [
        ("wild", jnp.asarray(
            (rng.random((B, P, 2)) * [[W8 * 1.4, H8 * 1.4]] - 3)
            .astype(np.float32))),
        ("local", jnp.asarray(
            (g.reshape(1, P, 2) + rng.random((B, P, 2)) * 2 - 1)
            .astype(np.float32))),
    ]:
        want = corr_lookup(pyr, coords.reshape(B, H8, W8, 2), 4,
                           method="gather").reshape(B, P, -1)
        got = corr_lookup_win(f1.reshape(B, P, C), slabs, coords, 4,
                              tile_p=64)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-2, rtol=1e-2, err_msg=name)


def test_corr_lookup_win_misaligned_window(rng):
    """Regression: with fold > 8 (very narrow levels), the dynamic row
    window start must stay FOLD-aligned — flooring an 8-aligned start to a
    packed-slab index used to drop the top sampled rows (sy ~ 17 with
    fold=16 contracted rows [0,16) only while the tent reaches row 22)."""
    from mft_tpu.ops.alt_corr_pallas import (build_feature_pyramid_slab,
                                             corr_lookup_win)
    B, H8, W8, C = 1, 32, 8, 16  # level 0: h=32, w=8 -> fold=16, ywin=16
    P = H8 * W8
    f1, f2 = _pyramid(rng, B, H8, W8, C)
    pyr = build_corr_pyramid(f1, f2, 2)
    slabs = build_feature_pyramid_slab(f2, 2, dtype=jnp.float32)
    # all sample centers near y=17: y_lo = 12 -> old code picked slab row 0
    coords = jnp.asarray(np.stack([
        rng.uniform(1, 7, (B, P)),            # x
        rng.uniform(16.5, 17.5, (B, P)),      # y
    ], axis=-1).astype(np.float32))
    want = corr_lookup(pyr[:2], coords.reshape(B, H8, W8, 2), 4,
                       method="gather").reshape(B, P, -1)
    got = corr_lookup_win(f1.reshape(B, P, C), slabs, coords, 4, tile_p=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=1e-2)


@pytest.mark.slow
def test_bilinear_warp_tiled_matches_blocked(rng):
    """The native-tile warp (no host-side reordering) must agree with the
    block-transposing kernel at a production-like 256^2 shape."""
    from mft_tpu.ops.warp_pallas import bilinear_warp_blocked, bilinear_warp_tiled

    N, H, W, C = 2, 256, 256, 6
    maps = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.bfloat16)
    gy, gx = np.mgrid[0:H, 0:W].astype(np.float32)
    flow = np.stack([11.0 * np.sin(gy / 23.0), 7.0 * np.cos(gx / 17.0)], -1)
    sx = jnp.asarray(np.broadcast_to(gx + flow[..., 0], (N, H, W)).copy())
    sy = jnp.asarray(np.broadcast_to(gy + flow[..., 1], (N, H, W)).copy())
    # include some wild rows to hit the fallback branch
    sx = sx.at[:, :8].set(jnp.asarray(rng.uniform(0, W - 1, (N, 8, W)), jnp.float32))
    sy = sy.at[:, :8].set(jnp.asarray(rng.uniform(0, H - 1, (N, 8, W)), jnp.float32))

    coords = jnp.stack([sx.reshape(N, -1), sy.reshape(N, -1)], axis=-1)
    ref = bilinear_warp_blocked(maps, coords)          # (N, P, C)
    got = bilinear_warp_tiled(maps, sx, sy)            # C x (N, H, W)
    for c in range(C):
        np.testing.assert_allclose(
            np.asarray(got[c]), np.asarray(ref[..., c].reshape(N, H, W)),
            rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_folded_corr_build_and_lookup_matches_pallas(rng):
    """The folded fully-lane-packed volume (build_corr_pyramid_pallas +
    corr_lookup_pallas_folded, corr_method='fold') must agree with the
    default pixel-major path on both fold-dot and whole-map-row levels."""
    from mft_tpu.models.raft.corr import build_corr_pyramid, corr_lookup
    from mft_tpu.ops.corr_lookup_pallas import build_corr_pyramid_pallas

    B, H, W, C = 1, 32, 32, 64
    f1 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    coords = jnp.asarray(rng.uniform(-2, 34, (B, H, W, 2)), jnp.float32)

    for dtype in (jnp.float32, jnp.bfloat16):
        pyr = build_corr_pyramid(f1, f2, 4, False, dtype=dtype)
        want = corr_lookup(pyr, coords, 4, method="pallas")
        levels, dims = build_corr_pyramid_pallas(f1, f2, 4, False, dtype=dtype)
        # levels: (B, P, h/fold, 128); small maps one zero-padded row
        assert [l.shape[2:] for l in levels] == [(8, 128), (2, 128),
                                                 (1, 128), (1, 128)]
        got = corr_lookup(("fold", levels, dims), coords, 4)
        assert got.dtype == want.dtype
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=2e-2, rtol=1e-2)


def test_mixed_corr_build_and_lookup_matches_pallas(rng):
    """The mixed folded-dense layout (build_corr_pyramid_mixed +
    corr_lookup_pallas_mixed, corr_method='mixed'): big levels whose rows
    pack evenly into 128 lanes are stored DENSE (lane = u*w + x), the rest
    stay padded pixel-major. Kernel math must agree with the pixel-major
    path on folded and padded levels alike, and the CPU fallback
    (_unfold_levels + mxu) must be exact."""
    from mft_tpu.models.raft.corr import (build_corr_pyramid,
                                          build_corr_pyramid_mixed,
                                          corr_lookup)
    from mft_tpu.ops.corr_lookup_pallas import corr_lookup_pallas_mixed

    B, H, W, C = 1, 64, 32, 64
    f1 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    coords = jnp.asarray(rng.uniform(-2, 66, (B, H, W, 2)), jnp.float32)
    P = H * W

    for dtype in (jnp.float32, jnp.bfloat16):
        pyr = build_corr_pyramid(f1, f2, 4, False, dtype=dtype)
        want = corr_lookup(pyr, coords, 4, method="pallas")
        tag, folded, fdims, padded = build_corr_pyramid_mixed(
            f1, f2, 4, False, dtype=dtype)
        assert tag == "mixed"
        # level 0 (64x32) folds 4 rows into 128 lanes; levels 1+ (32x16,
        # 16x8, 8x4) have fold > max_fold and stay padded pixel-major
        assert [a.shape for a in folded] == [(B, P, 16, 128)]
        assert fdims == ((64, 32),)
        assert [a.shape[2:] for a in padded] == [(32, 16), (16, 8), (8, 4)]
        # folded level holds the same values as the padded one, re-laid out
        np.testing.assert_array_equal(
            np.asarray(folded[0].reshape(B, P, 64, 32)), np.asarray(pyr[0]))

        # kernel (interpret mode on CPU)
        got = corr_lookup_pallas_mixed(folded, fdims, padded,
                                       coords.reshape(B, P, 2), 4, tile_p=256)
        tol = dict(atol=1e-4, rtol=1e-4) if dtype == jnp.float32 else \
            dict(atol=2e-2, rtol=1e-2)
        np.testing.assert_allclose(
            np.asarray(got.reshape(B, H, W, -1), np.float32),
            np.asarray(want, np.float32), **tol)

        # dispatch-level CPU fallback (unfold + mxu) through corr_lookup
        got2 = corr_lookup(("mixed", folded, fdims, padded), coords, 4)
        assert got2.dtype == want.dtype
        np.testing.assert_allclose(
            np.asarray(got2, np.float32), np.asarray(want, np.float32),
            atol=5e-3, rtol=5e-3)
