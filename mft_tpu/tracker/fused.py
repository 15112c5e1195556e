"""Fused chain+select: chain occlusion/sigma for all candidates, select,
then chain flow ONLY for the per-pixel winner.

Numerically equivalent to chain-all-then-select (the selection score uses
only chained sigma and occlusion, reference MFT/MFT.py:114-132; the chained
flow of losing candidates is never observed), but gathers ~40% fewer bytes —
gathers are the TPU cost of the tracker step.

The winner's right-hand flow is sampled from the candidate-stacked source
(N*H, W, 2) with block-local zeros padding: a bilinear tap that leaves the
winner's HxW block contributes zero, exactly like sampling that candidate's
map alone.
"""

import jax
import jax.numpy as jnp

from mft_tpu.core.coords import grid_coords
from mft_tpu.core.flowou import FlowOU, invalid_mask
from mft_tpu.core.interp import bilinear_sample


def _select_n(arr, best):
    """Per-pixel candidate selection without a gather.

    args: arr (N, H, W, ...) candidate maps, best (H, W) int32 winner index.
    One-hot contraction over the candidate axis: exactly one weight per
    pixel is 1.0, so the sum is bit-exact selection. Measured on the v5e
    (tools/select_bench.py, N=7 @ 512^2, 3 payloads): onehot 0.80 ms vs
    where-chain 0.98 ms vs XLA take_along_axis gather 6.76 ms.

    Assumes FINITE candidate maps: 0 * NaN = NaN, so a non-finite value in
    a LOSING candidate would contaminate the winner (a where-chain would
    not). Chained flow/occl/sigma are finite by construction here — the
    chain clamps sample coords in-bounds and the model heads are bounded —
    so the contraction is safe; if a divergent model must be tolerated,
    nan_to_num the inputs before selection.
    """
    N = arr.shape[0]
    oh = (best[None] == jnp.arange(N, dtype=best.dtype)[:, None, None])
    if arr.ndim == 4:
        return jnp.einsum("nhw,nhwc->hwc", oh.astype(arr.dtype), arr)
    return jnp.einsum("nhw,nhw->hw", oh.astype(arr.dtype), arr)


def _sample_stacked_flow(right_flow, coords, block_idx):
    """Bilinear-sample per-pixel-selected candidate flow maps.

    args:
      right_flow: (N, H, W, 2) candidate flow maps.
      coords: (H, W, 2) sample positions (shared grid + selected left flow).
      block_idx: (H, W) int32 selected candidate per pixel.
    returns: (H, W, 2) sampled flow with per-candidate zeros padding.
    """
    N, H, W, C = right_flow.shape
    src = right_flow.reshape(N * H, W, C)
    x = coords[..., 0]
    y = coords[..., 1]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    base = block_idx * H

    def tap(xi, yi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        rows = base + jnp.clip(yi, 0, H - 1)
        v = src[rows, jnp.clip(xi, 0, W - 1)]
        return jnp.where(valid[..., None], v, 0.0) * w[..., None]

    return (tap(x0, y0, (1 - wx) * (1 - wy))
            + tap(x0 + 1, y0, wx * (1 - wy))
            + tap(x0, y0 + 1, (1 - wx) * wy)
            + tap(x0 + 1, y0 + 1, wx * wy))


def chain_select_pallas(left: FlowOU, right: FlowOU, valid: jnp.ndarray,
                        occlusion_threshold: float = 0.02) -> FlowOU:
    """TPU path of :func:`chain_select` — same semantics, one Pallas call.

    ALL candidate sampling (occlusion, sigma, and both flow channels split
    hi/lo for accuracy) runs as a single 6-channel tent-matmul warp kernel
    (ops/warp_pallas.py); chaining, selection and the winner pick are cheap
    fused element-wise XLA ops (no gathers anywhere).

    Accuracy vs the exact jnp path: sample positions snap to 1/256 px and
    flow reconstructs to ~2^-16 relative; occl/sigma carry bf16 map
    quantization (~0.4%) which only matters at exact selection ties.
    """
    from mft_tpu.ops.warp_pallas import split_hi_lo

    N, H, W = left.occlusion.shape
    grid = grid_coords(H, W)
    sx = grid[None, ..., 0] + left.flow[..., 0].astype(jnp.float32)
    sy = grid[None, ..., 1] + left.flow[..., 1].astype(jnp.float32)

    fhi, flo = split_hi_lo(right.flow.astype(jnp.float32))      # (N,H,W,2)
    maps = jnp.concatenate([
        fhi.astype(jnp.bfloat16),
        flo.astype(jnp.bfloat16),
        right.occlusion[..., None].astype(jnp.bfloat16),
        right.sigma[..., None].astype(jnp.bfloat16),
    ], axis=-1)                                                  # (N,H,W,6)
    # NB: the native-tile variant (bilinear_warp_tiled) removes the two
    # raster<->block relayouts but its per-sub-row dots measured slightly
    # slower overall (9.0 vs 8.7 ms profiled) — keep the blocked kernel
    coords_b = jnp.stack([sx.reshape(N, -1), sy.reshape(N, -1)], axis=-1)
    from mft_tpu.ops.warp_pallas import bilinear_warp_blocked
    samp = bilinear_warp_blocked(maps, coords_b).reshape(N, H, W, 6)
    samp_flow = samp[..., 0:2] + samp[..., 2:4]
    samp_occl = samp[..., 4]
    samp_sigma = samp[..., 5]

    chained_flow = left.flow + samp_flow
    chained_occl = jnp.maximum(left.occlusion, samp_occl)
    chained_sigma = jnp.sqrt(jnp.square(left.sigma)
                             + jnp.square(samp_sigma))

    neg_inf = jnp.float32(-jnp.inf)
    scores = jnp.where(chained_occl > occlusion_threshold, neg_inf,
                       -chained_sigma)
    scores = jnp.where(valid[:, None, None], scores, neg_inf)
    best = jnp.argmax(scores, axis=0)                            # (H, W)

    sel_flow = _select_n(chained_flow, best)
    sel_occl = _select_n(chained_occl, best)
    sel_sigma = _select_n(chained_sigma, best)

    inval = invalid_mask(sel_flow)
    sel_occl = jnp.where(inval, 1.0, sel_occl)
    return FlowOU(flow=sel_flow, occlusion=sel_occl, sigma=sel_sigma)


def chain_select(left: FlowOU, right: FlowOU, valid: jnp.ndarray,
                 occlusion_threshold: float = 0.02) -> FlowOU:
    """args: left/right FlowOU with stacked candidate axis (N, H, W, ...);
    valid (N,) candidate mask. returns the selected chained FlowOU (H, W, ...).

    Dispatches to the Pallas kernel path on TPU (chain_select_pallas); the
    jnp gather implementation below is the exact reference/CPU fallback.
    """
    if jax.default_backend() == "tpu" and (left.occlusion.shape[1] *
                                           left.occlusion.shape[2]) % 8 == 0:
        return chain_select_pallas(left, right, valid, occlusion_threshold)
    return chain_select_ref(left, right, valid, occlusion_threshold)


def chain_select_ref(left: FlowOU, right: FlowOU, valid: jnp.ndarray,
                     occlusion_threshold: float = 0.02) -> FlowOU:
    """Exact jnp implementation (select-late, gather-based)."""
    N, H, W = left.occlusion.shape
    grid = grid_coords(H, W)
    coords_b = grid[None] + left.flow.astype(jnp.float32)  # (N, H, W, 2)

    # chain occl+sigma for every candidate: one packed 2ch gather each
    packed = jnp.stack([right.occlusion, right.sigma], axis=-1)  # (N, H, W, 2)
    sampled = jax.vmap(bilinear_sample)(packed, coords_b)
    chained_occl = jnp.maximum(left.occlusion, sampled[..., 0])
    chained_sigma = jnp.sqrt(jnp.square(left.sigma)
                             + jnp.square(sampled[..., 1]))

    # selection on (-sigma, occlusion mask, validity); first max wins
    neg_inf = jnp.float32(-jnp.inf)
    scores = jnp.where(chained_occl > occlusion_threshold, neg_inf,
                       -chained_sigma)
    scores = jnp.where(valid[:, None, None], scores, neg_inf)
    best = jnp.argmax(scores, axis=0)  # (H, W)

    sel = lambda arr: jnp.take_along_axis(
        arr.reshape(N, H * W, -1),
        best.reshape(1, H * W, 1), axis=0)[0].reshape(H, W, -1)
    sel_left_flow = sel(left.flow)
    sel_occl = sel(chained_occl[..., None])[..., 0]
    sel_sigma = sel(chained_sigma[..., None])[..., 0]

    # chain flow only for the winner
    coords_sel = grid + sel_left_flow.astype(jnp.float32)
    sampled_flow = _sample_stacked_flow(right.flow.astype(jnp.float32),
                                        coords_sel, best)
    sel_flow = sel_left_flow + sampled_flow

    inval = invalid_mask(sel_flow)
    sel_occl = jnp.where(inval, 1.0, sel_occl)
    return FlowOU(flow=sel_flow, occlusion=sel_occl, sigma=sel_sigma)
