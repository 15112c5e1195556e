"""Pallas TPU kernel: dense bilinear warp (gather) as tent-weight matmuls.

XLA's gather lowering on TPU reads ~one full map row per gathered element —
a single (512, 512, 2) bilinear sample costs ~1.5 GB of HBM traffic, and the
tracker's chain+select step (7 candidates x several channels) blows up to
~580 GB/frame. TPUs have no per-lane dynamic addressing, but they have a
very fast MXU: this kernel expresses the bilinear sample of ALL channels of
a map as one tent-weight matmul per pixel tile,

    R[p, x*C + c] = sum_y tent(sy_p - y) * M[y, x*C + c]      (MXU, f32 acc)
    out[p, c]     = sum_x tent(sx_p - x) * R[p, x*C + c]      (VPU reduce)

with tent(d) = max(0, 1 - |d|), which IS grid_sample's zeros-padding
bilinear kernel (align_corners=True pixel coordinates, reference
MFT/utils/interpolation.py:63-94, used by results.py chain/warp_backward).
Everything stays in VMEM; HBM traffic is one read of the map per tile wave.

Used by the tracker's fused chain+select step and by FlowOU.warp_backward
on TPU; the jnp fallback is core.interp.bilinear_sample.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tile_p(P: int, cap: int) -> int:
    t = P & (-P)
    return min(t, cap)


def _snap256(s):
    """Snap the fractional part to a 1/256 grid.

    Tent weights built from 1/256-grid fractions are multiples of 2^-8 in
    [0, 1] and therefore EXACTLY representable in bfloat16 (8-bit mantissa),
    so bf16 MXU sampling carries no weight-rounding error — only a <=2^-8 px
    position shift. Combined with a hi/lo bf16 map split the sample is
    accurate to ~2^-16 relative even for large flow values.
    """
    f = jnp.floor(s)
    return f + jnp.round((s - f) * 256.0) * (1.0 / 256.0)


def _warp_kernel(coords_ref, maps_ref, out_ref, *, C: int, tile_p: int,
                 dot_dtype, snap: bool):
    m = maps_ref[0]                             # (H, C*W) channel-major
    H, CW = m.shape
    W = CW // C
    c = coords_ref[0]                           # (TILE_P, 2) f32
    sx = c[:, 0][:, None]                       # (TILE_P, 1)
    sy = c[:, 1][:, None]
    if snap:
        sx = _snap256(sx)
        sy = _snap256(sy)

    yy = jax.lax.broadcasted_iota(jnp.int32, (tile_p, H), 1).astype(jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy - yy))           # (TILE_P, H)

    # default matmul precision truncates f32 operands to bf16 on TPU; the
    # f32 mode must request full precision explicitly
    prec = (jax.lax.Precision.HIGHEST if dot_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    r = jax.lax.dot_general(
        wy.astype(dot_dtype), m.astype(dot_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=prec,
        preferred_element_type=jnp.float32)                 # (TILE_P, C*W)

    xx = jax.lax.broadcasted_iota(jnp.int32, (tile_p, W), 1).astype(jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx - xx))           # (TILE_P, W)
    # channel-major layout: each channel is a contiguous static lane slice
    for ci in range(C):
        col = jnp.sum(r[:, ci * W:(ci + 1) * W] * wx, axis=1)  # (TILE_P,)
        out_ref[0, :, ci] = col


def bilinear_warp_pallas(maps, coords, dot_dtype=jnp.bfloat16,
                         tile_p: int = 512, snap: bool = True):
    """Bilinear-sample batched multi-channel maps at per-pixel coordinates.

    args:
      maps: (N, H, W, C) source maps (any float dtype; C small, e.g. <= 8).
      coords: (N, P, 2) float32 (x, y) pixel coordinates (align_corners=True
        convention; out-of-bounds taps contribute zero).
      dot_dtype: matmul operand dtype. bfloat16 (default) + snap gives exact
        tent weights (see _snap256); for values of large magnitude (flow)
        pass the map split as bf16 hi/lo channel pairs and recombine — see
        split_hi_lo. float32 runs the slower multi-pass MXU mode (exact).
      snap: snap fractions to 1/256 (exact bf16 weights, <=2^-8 px shift).
    returns:
      (N, P, C) float32 sampled values.
    """
    N, H, W, C = maps.shape
    P = coords.shape[1]
    tp = _tile_p(P, tile_p)
    if tp < 8:
        raise ValueError(f"P={P} has no power-of-two tiling")
    # channel-major lanes (H, C*W): per-channel x-reduction needs only a
    # static contiguous lane slice in the kernel
    maps2 = maps.swapaxes(2, 3).reshape(N, H, C * W)

    grid = (N, P // tp)
    kernel = functools.partial(_warp_kernel, C=C, tile_p=tp,
                               dot_dtype=dot_dtype, snap=snap)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tp, 2), lambda n, p: (n, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, C * W), lambda n, p: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tp, C), lambda n, p: (n, p, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, P, C), jnp.float32),
        interpret=_interpret(),
    )(coords.astype(jnp.float32), maps2)


def _banded_kernel(coords_ref, maps_ref, out_ref, r_ref, *, C: int,
                   tile_p: int, band: int, n_bands: int):
    W = maps_ref.shape[2] // C
    c = coords_ref[0]                           # (TILE_P, 2) f32, pre-snapped
    sx = c[:, 0][:, None]
    sy = c[:, 1][:, None]
    # band occupancy computed IN-KERNEL (a scalar-prefetch mask would be a
    # device->host roundtrip per call on remote-dispatch platforms)
    m_lo = jnp.min(sy)
    m_hi = jnp.max(sy)

    # accumulate in a VMEM scratch ref under @pl.when — a lax.cond carrying
    # the (TILE_P, C*W) value would copy the full accumulator per band
    r_ref[:] = jnp.zeros((tile_p, C * W), jnp.float32)
    for b in range(n_bands):                    # static unroll, runtime skip
        touched = jnp.logical_and(m_hi > b * band - 1.0,
                                  m_lo < (b + 1) * band)

        @pl.when(touched)
        def _(b=b):
            m = maps_ref[0, b * band:(b + 1) * band]        # (BAND, C*W)
            yy = (b * band) + jax.lax.broadcasted_iota(
                jnp.int32, (tile_p, band), 1).astype(jnp.float32)
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy - yy))   # (TILE_P, BAND)
            r_ref[:] += jax.lax.dot_general(
                wy.astype(jnp.bfloat16), m.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    xx = jax.lax.broadcasted_iota(
        jnp.int32, (tile_p, W), 1).astype(jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx - xx))
    r = r_ref[:]
    for ci in range(C):
        out_ref[0, :, ci] = jnp.sum(r[:, ci * W:(ci + 1) * W] * wx, axis=1)


def bilinear_warp_banded(maps, coords, band: int = 128, tile_p: int = 256):
    """Band-sparse bilinear warp: like bilinear_warp_pallas (bf16 + snapped
    tents), but the tent matmul over map rows is decomposed into row BANDS,
    statically unrolled in-kernel and skipped (@pl.when on the tile's y
    min/max, computed in-kernel) when no pixel of the tile samples that
    band. Exact same result; for smooth flow each tile touches 1-2 of
    H/band bands, cutting MXU work ~2-4x. Worst case (wild flow) degrades
    to the dense kernel's cost plus branch overhead.

    args/returns: as bilinear_warp_pallas (bf16 path); requires H % band == 0.
    """
    N, H, W, C = maps.shape
    P = coords.shape[1]
    tp = _tile_p(P, tile_p)
    if tp < 8 or H % band != 0 or H // band < 2:
        return bilinear_warp_pallas(maps, coords, tile_p=tile_p)
    n_bands = H // band
    maps2 = maps.swapaxes(2, 3).reshape(N, H, C * W)
    coords = _snap256(coords.astype(jnp.float32))

    kernel = functools.partial(_banded_kernel, C=C, tile_p=tp, band=band,
                               n_bands=n_bands)
    return pl.pallas_call(
        kernel,
        grid=(N, P // tp),
        in_specs=[
            pl.BlockSpec((1, tp, 2), lambda n, t: (n, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, C * W), lambda n, t: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tp, C), lambda n, t: (n, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, P, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tp, C * W), jnp.float32)],
        interpret=_interpret(),
    )(coords, maps2)


def _tiled_kernel(sx_ref, sy_ref, maps_ref, *out_refs, C: int, BH: int,
                  BW: int, ywin: int, xband: int, W: int):
    """Native-tile warp: the grid walks (BH, BW)=(8,128) image blocks of the
    raster coords/outputs directly (BlockSpec index maps), so NO host-side
    raster<->block transposes exist. Each of the BH sub-rows runs one
    (BW, ywin) x (ywin, C*XB) MXU dot against a dynamic 8-aligned row slab.
    """
    H = maps_ref.shape[1]
    n_xb = W // xband
    sx = sx_ref[0]                              # (BH, BW) f32, pre-snapped
    sy = sy_ref[0]
    x_lo = jnp.min(sx)
    x_hi = jnp.max(sx)
    y_lo = jnp.min(sy)
    y_hi = jnp.max(sy)
    # one (BH, BW) -> (BW, BH) relayout each; per-sub-row (BW, 1) columns
    # then come from free static lane slices
    sxT = sx.T
    syT = sy.T

    y0f = jnp.clip(jnp.floor((y_lo - 1.0) / 8.0) * 8.0, 0.0, float(H - ywin))
    y_fits = y_hi <= y0f + (ywin - 1)
    y0 = pl.multiple_of(y0f.astype(jnp.int32), 8)

    for c in range(C):
        out_refs[c][0] = jnp.zeros((BH, BW), jnp.float32)

    xw = jax.lax.broadcasted_iota(jnp.int32, (BW, xband), 1).astype(jnp.float32)

    def do_block(xb, rows, row0):
        """rows: (K, C*XB) map slab, first absolute map row row0."""
        k = rows.shape[0]
        for r in range(BH):
            sy_r = syT[:, r:r + 1]              # (BW, 1)
            sx_r = sxT[:, r:r + 1]
            yy = row0.astype(jnp.float32) + jax.lax.broadcasted_iota(
                jnp.int32, (BW, k), 1).astype(jnp.float32)
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy_r - yy))
            acc = jax.lax.dot_general(
                wy.astype(jnp.bfloat16), rows.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (BW, C*XB)
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx_r - (xb * xband) - xw))
            for c in range(C):
                col = jnp.sum(acc[:, c * xband:(c + 1) * xband] * wx, axis=1)
                out_refs[c][0, r, :] += col

    for xb in range(n_xb):
        x_touch = jnp.logical_and(x_hi > xb * xband - 1.0,
                                  x_lo < (xb + 1) * xband)
        lane0 = xb * C * xband

        @pl.when(jnp.logical_and(x_touch, y_fits))
        def _(xb=xb, lane0=lane0):
            do_block(xb, maps_ref[0, pl.ds(y0, ywin), lane0:lane0 + C * xband],
                     y0)

        @pl.when(jnp.logical_and(x_touch, jnp.logical_not(y_fits)))
        def _(xb=xb, lane0=lane0):
            do_block(xb, maps_ref[0, :, lane0:lane0 + C * xband],
                     jnp.int32(0))


def bilinear_warp_tiled(maps, sx, sy, ywin: int = 128, xband: int = 128,
                        block_hw=(8, 128)):
    """Bilinear warp over native (8, 128) image tiles, no pixel reordering.

    Drop-in replacement for bilinear_warp_blocked's role in chain+select:
    instead of transposing coords into block order and the result back
    (~2.9 ms/frame of pure relayout at 512x512, profiled), the BlockSpec
    index maps walk 2D image tiles of the RASTER arrays directly — the
    (8, 128) block is exactly one native TPU tile, so block reads/writes
    are layout-free.

    args:
      maps: (N, H, W, C) source maps (sampled with zeros padding).
      sx, sy: (N, H, W) float32 sample coordinates (align_corners pixel
        convention; snapped to 1/256 inside).
    returns:
      list of C arrays (N, H, W) float32 — the sampled channels.
    """
    N, H, W, C = maps.shape
    BH, BW = block_hw
    if H % BH or W % BW or W % xband or H % ywin or H // ywin < 2:
        out = bilinear_warp_blocked(
            maps, jnp.stack([sx.reshape(N, -1), sy.reshape(N, -1)], -1))
        return [out[..., c].reshape(N, H, W) for c in range(C)]
    n_xb = W // xband
    nwb = W // BW

    # x-block-major channel grouping, as bilinear_warp_blocked
    maps2 = (maps.reshape(N, H, n_xb, xband, C)
             .transpose(0, 1, 2, 4, 3)
             .reshape(N, H, n_xb * C * xband))
    sx = _snap256(sx.astype(jnp.float32))
    sy = _snap256(sy.astype(jnp.float32))

    grid = (N, (H // BH) * nwb)
    cblock = pl.BlockSpec((1, BH, BW),
                          lambda n, t: (n, t // nwb, t % nwb),
                          memory_space=pltpu.VMEM)
    kernel = functools.partial(_tiled_kernel, C=C, BH=BH, BW=BW,
                               ywin=ywin, xband=xband, W=W)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            cblock, cblock,
            pl.BlockSpec((1, H, n_xb * C * xband), lambda n, t: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[cblock] * C,
        out_shape=[jax.ShapeDtypeStruct((N, H, W), jnp.float32)] * C,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(sx, sy, maps2)
    return list(outs)


def split_hi_lo(x):
    """Split float32 values into two bfloat16 parts (x ~= hi + lo).

    Sampling hi and lo separately with exact (snapped) tent weights and
    adding the float32 results reconstructs the bilinear sample to ~2^-16
    relative accuracy — needed for flow values (hundreds of px) where plain
    bf16 maps would quantize to ~0.4 px.
    """
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _blocked_kernel(coords_ref, maps_ref, out_ref, *, C: int,
                    tile_p: int, ywin: int, xband: int, W: int):
    H = maps_ref.shape[1]
    n_xb = W // xband
    c = coords_ref[0]                           # (TILE_P, 2) f32, pre-snapped
    sx = c[:, 0][:, None]
    sy = c[:, 1][:, None]
    x_lo = jnp.min(sx)
    x_hi = jnp.max(sx)
    y_lo = jnp.min(sy)
    y_hi = jnp.max(sy)

    # dynamic y window: an 8-aligned YWIN-row slab covering the tile's
    # samples (tiles are 2D image blocks, so the y spread is local for
    # smooth flow). If the spread exceeds the window, fall back to all rows.
    y0f = jnp.clip(jnp.floor((y_lo - 1.0) / 8.0) * 8.0, 0.0,
                   float(H - ywin))
    # sample y touches rows floor(y) and floor(y)+1; both must lie within
    # [y0, y0+ywin-1], i.e. y <= y0+ywin-1 (at equality the upper tap's
    # tent weight is exactly zero)
    y_fits = y_hi <= y0f + (ywin - 1)
    y0 = pl.multiple_of(y0f.astype(jnp.int32), 8)

    xw = jax.lax.broadcasted_iota(
        jnp.int32, (tile_p, xband), 1).astype(jnp.float32)
    out_ref[0] = jnp.zeros((tile_p, C), jnp.float32)

    def do_block(lane0, xb, rows, row0):
        """rows: (K, C*XB) map slab starting at absolute row `row0`."""
        k = rows.shape[0]
        yy = row0.astype(jnp.float32) + jax.lax.broadcasted_iota(
            jnp.int32, (tile_p, k), 1).astype(jnp.float32)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy - yy))
        r = jax.lax.dot_general(
            wy.astype(jnp.bfloat16), rows.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (TILE_P, C*XB)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx - (xb * xband) - xw))
        for ci in range(C):
            out_ref[0, :, ci] += jnp.sum(
                r[:, ci * xband:(ci + 1) * xband] * wx, axis=1)

    for xb in range(n_xb):
        x_touch = jnp.logical_and(x_hi > xb * xband - 1.0,
                                  x_lo < (xb + 1) * xband)
        lane0 = xb * C * xband

        @pl.when(jnp.logical_and(x_touch, y_fits))
        def _(xb=xb, lane0=lane0):
            rows = maps_ref[0, pl.ds(y0, ywin), lane0:lane0 + C * xband]
            do_block(lane0, xb, rows, y0)

        @pl.when(jnp.logical_and(x_touch, jnp.logical_not(y_fits)))
        def _(xb=xb, lane0=lane0):
            rows = maps_ref[0, :, lane0:lane0 + C * xband]
            do_block(lane0, xb, rows, jnp.int32(0))


def bilinear_warp_blocked(maps, coords, ywin: int = 128, xband: int = 128,
                          block_hw=(16, 32)):
    """2D-block-tiled band-sparse warp: pixels are re-tiled into BHxBW image
    blocks so a tile's sample coordinates are local in BOTH axes. Per tile,
    the tent matmul contracts only a dynamic 8-aligned YWIN-row slab of the
    map (one dynamic sublane slice — no per-band accumulator or zero-fill)
    and only the touched static x-blocks; tiles whose y spread exceeds the
    window fall back to all rows (exact for arbitrary flow).

    args: maps (N, H, W, C); coords (N, H*W, 2) in RASTER order (this
    function handles the block reordering). Requires H % (ywin, BH) == 0
    and W % (xband, BW) == 0; otherwise falls back to the 1D-banded kernel.
    returns: (N, H*W, C) float32 in raster order.
    """
    N, H, W, C = maps.shape
    P = coords.shape[1]
    BH, BW = block_hw
    tp = BH * BW
    if (P != H * W or H % ywin or W % xband or H % BH or W % BW
            or H // ywin < 2 or W // xband < 2):
        return bilinear_warp_banded(maps, coords)

    # x-block-major channel grouping: lane index = (xb*C + c)*XB + xw
    n_xb = W // xband
    maps2 = (maps.reshape(N, H, n_xb, xband, C)
             .transpose(0, 1, 2, 4, 3)
             .reshape(N, H, n_xb * C * xband))

    # raster -> (BH, BW) block order
    coords = _snap256(coords.astype(jnp.float32))
    cb = (coords.reshape(N, H // BH, BH, W // BW, BW, 2)
          .transpose(0, 1, 3, 2, 4, 5).reshape(N, P, 2))

    kernel = functools.partial(_blocked_kernel, C=C, tile_p=tp,
                               ywin=ywin, xband=xband, W=W)
    out = pl.pallas_call(
        kernel,
        grid=(N, P // tp),
        in_specs=[
            pl.BlockSpec((1, tp, 2), lambda n, t: (n, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, n_xb * C * xband), lambda n, t: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tp, C), lambda n, t: (n, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, P, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(cb, maps2)

    # block order -> raster
    return (out.reshape(N, H // BH, W // BW, BH, BW, C)
            .transpose(0, 1, 3, 2, 4, 5).reshape(N, P, C))
