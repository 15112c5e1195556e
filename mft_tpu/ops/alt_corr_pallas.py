"""On-the-fly correlation lookup (TPU equivalent of alt_cuda_corr).

The reference's CUDA kernel (MFT/RAFT/alt_cuda_corr/correlation_kernel.cu:
19-119, used via AlternateCorrBlock, corr.py:72-100) avoids materializing
the O((H*W)^2) all-pairs volume by computing window correlations directly
from the feature maps. This kernel is the same trade on TPU: per pixel
tile, the tile's slice of the correlation map is recomputed in VMEM with
one MXU dot against the (tiny, VMEM-resident) target feature pyramid, then
tent-contracted to the (2r+1)^2 window — HBM never sees a volume.

vs. the default path (corr_lookup_pallas over a materialized volume):
  - memory: O(B * HW * C) features instead of O(B * HW^2) volume — at
    1024x1024 the volume is ~4.3 GB/pair where features are ~17 MB;
  - compute: the all-pairs dot is redone every GRU iteration (12x), so at
    moderate sizes the default path is faster. 'auto' keeps the volume.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mft_tpu.ops.corr_lookup_pallas import _interpret, _tile_p


def build_feature_pyramid(fmap2, num_levels: int = 4, dtype=jnp.bfloat16):
    """Average-pooled target features, flattened per level: [(B, h*w, C)].

    Pooling features == pooling the correlation volume (the dot is linear),
    matching reference CorrBlock pyramid semantics (corr.py:26-28).
    """
    from mft_tpu.models.raft.corr import avg_pool2x2_nhwc
    B, H, W, C = fmap2.shape
    out = []
    f = fmap2
    for lvl in range(num_levels):
        if lvl > 0:
            f = avg_pool2x2_nhwc(f)
        h, w = f.shape[1:3]
        out.append((f.reshape(B, h * w, C).astype(dtype), (h, w)))
    return out


def _alt_kernel(coords_ref, f1_ref, *f2_refs, radius: int, tile_p: int,
                dims, inv_sqrt_c: float):
    out_ref = f2_refs[-1]
    f2_refs = f2_refs[:-1]
    n = 2 * radius + 1
    f1 = f1_ref[0]                                   # (TILE_P, C)
    c = coords_ref[0]                                # (TILE_P, 2)
    cx = c[:, 0]
    cy = c[:, 1]

    for lvl, f2_ref in enumerate(f2_refs):
        h, w = dims[lvl]
        inv = 1.0 / (2.0 ** lvl)
        sx = (cx * inv)[:, None]                     # (TILE_P, 1)
        sy = cy * inv                                # (TILE_P,)

        f2 = f2_ref[0]                               # (h*w, C)
        # the tile's slice of the correlation map, recomputed on the MXU
        g = jax.lax.dot_general(
            f1, f2,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_sqrt_c  # (TILE_P, h*w)

        # y tent contraction over static row slices of g
        t = [jnp.zeros((tile_p, w), jnp.float32) for _ in range(n)]
        for y in range(h):
            row = g[:, y * w:(y + 1) * w]            # (TILE_P, w)
            d = sy - float(y)
            for j in range(n):
                wj = jnp.maximum(0.0, 1.0 - jnp.abs(d + (j - radius)))
                t[j] = t[j] + row * wj[:, None]

        # x tent contraction
        xx = jax.lax.broadcasted_iota(
            jnp.int32, (tile_p, w), 1).astype(jnp.float32)
        base = lvl * n * n
        for i in range(n):
            wi = jnp.maximum(0.0, 1.0 - jnp.abs(sx + (i - radius) - xx))
            for j in range(n):
                out_ref[0, :, base + i * n + j] = jnp.sum(t[j] * wi, axis=1)


def corr_lookup_alt(fmap1_flat, f2_pyramid, coords, radius: int = 4,
                    tile_p: int = 128):
    """Window correlation lookup straight from features (no volume).

    args:
      fmap1_flat: (B, P, C) source features (1/sqrt(C) scaling applied here).
      f2_pyramid: output of :func:`build_feature_pyramid`.
      coords: (B, P, 2) float32 level-0 correspondence centers.
    returns:
      (B, P, L*(2r+1)^2) float32, same ordering as corr_lookup_pallas.
    """
    B, P, C = fmap1_flat.shape
    n = 2 * radius + 1
    L = len(f2_pyramid)
    tp = _tile_p(P, tile_p)
    if tp < 8:
        raise ValueError(f"P={P} has no power-of-two tiling")
    dims = tuple(hw for _, hw in f2_pyramid)

    in_specs = [
        pl.BlockSpec((1, tp, 2), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tp, C), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
    ]
    for f2, (h, w) in f2_pyramid:
        in_specs.append(pl.BlockSpec((1, h * w, C), lambda b, t: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
    kernel = functools.partial(_alt_kernel, radius=radius, tile_p=tp,
                               dims=dims, inv_sqrt_c=float(C) ** -0.5)
    return pl.pallas_call(
        kernel,
        grid=(B, P // tp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tp, L * n * n), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, L * n * n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # the recomputed (TILE_P, h*w) correlation slice pushes scoped
            # VMEM past the 16M default at 512px (36M); the limit is a
            # compiler knob, not hardware VMEM (cf. corr_lookup_pallas)
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(coords.astype(jnp.float32),
      fmap1_flat.astype(f2_pyramid[0][0].dtype),
      *[f2 for f2, _ in f2_pyramid])


def _row_fold(h: int, w: int) -> int:
    """Image rows packed per slab row (fills the 128-lane registers)."""
    fold = max(1, min(h, 128 // max(w, 1)))
    while h % fold:
        fold -= 1
    return fold


def build_feature_pyramid_slab(fmap2, num_levels: int = 4,
                               dtype=jnp.bfloat16):
    """Pooled target features as row-packed slabs: [(B, h/fold, C, fold*w)].

    Each slab row packs ``fold`` consecutive image rows into the lane dim
    (lane index = f*w + x) so narrow pyramid levels still fill the 128-wide
    vector registers; the y dim stays dynamically row-sliceable.
    """
    from mft_tpu.models.raft.corr import avg_pool2x2_nhwc
    B, H, W, C = fmap2.shape
    out = []
    f = fmap2
    for lvl in range(num_levels):
        if lvl > 0:
            f = avg_pool2x2_nhwc(f)
        h, w = f.shape[1:3]
        fold = _row_fold(h, w)
        packed = (f.transpose(0, 1, 3, 2)               # (B, h, C, w)
                  .reshape(B, h // fold, fold, C, w)
                  .transpose(0, 1, 3, 2, 4)
                  .reshape(B, h // fold, C, fold * w))
        out.append((packed.astype(dtype), (h, w, fold)))
    return out


def _win_kernel(coords_ref, f1_ref, *rest, radius: int, tile_p: int,
                dims, ywins, inv_sqrt_c: float):
    L = len(dims)
    # pallas arg order: inputs..., outputs..., scratch...
    f2_refs, out_ref, t_ref = rest[:L], rest[L], rest[L + 1]
    n = 2 * radius + 1
    c = coords_ref[0]                                # (TILE_P, 2)
    cx = c[:, 0]
    cy = c[:, 1]
    f1b = f1_ref[0]        # (TILE_P, C), already in the slabs' dtype

    for lvl, f2_ref in enumerate(f2_refs):
        h, w, fold = dims[lvl]
        inv = 1.0 / (2.0 ** lvl)
        sx = (cx * inv)[:, None]                     # (TILE_P, 1)
        sy = cy * inv                                # (TILE_P,)
        ywin = ywins[lvl]
        base = lvl * n * n

        # dynamic row window [y0, y0+ywin): a fold-aligned slab covering the
        # tile's +-radius sample rows; tiles whose spread exceeds the window
        # fall back to all rows — same fori_loop, traced bounds.
        # y0 MUST be fold-aligned: flooring y0f // fold would silently move
        # the window start below y0f while `fits` was checked against
        # [y0f, y0f + ywin) — the top sampled rows would never be contracted.
        if ywin < h and ywin % fold == 0 and h % fold == 0:
            y_lo = jnp.min(sy) - (radius + 1.0)
            y_hi = jnp.max(sy) + radius + 1.0
            y0f = jnp.clip(jnp.floor(y_lo / fold) * fold, 0.0,
                           float(h - ywin))
            fits = y_hi <= y0f + (ywin - 1)
            y0p = jnp.where(fits, y0f.astype(jnp.int32) // fold, 0)
            count = jnp.where(fits, ywin // fold, h // fold)
        else:
            y0p = jnp.int32(0)
            count = jnp.int32(h // fold)

        for j in range(n):
            t_ref[j, :, :w] = jnp.zeros((tile_p, w), jnp.float32)

        def body(i, carry):
            yp = y0p + i
            # slab row (C, fold*w): correlation of the tile's pixels against
            # `fold` packed image rows, recomputed on the MXU
            g = jax.lax.dot_general(
                f1b, f2_ref[0, yp],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * inv_sqrt_c
            yfp = yp.astype(jnp.float32) * fold
            for half in range(fold):
                row = g[:, half * w:(half + 1) * w]  # (TILE_P, w)
                d = sy - (yfp + half)
                for j in range(n):
                    wj = jnp.maximum(0.0, 1.0 - jnp.abs(d + (j - radius)))
                    t_ref[j, :, :w] += row * wj[:, None]
            return carry

        jax.lax.fori_loop(0, count, body, 0)

        xx = jax.lax.broadcasted_iota(
            jnp.int32, (tile_p, w), 1).astype(jnp.float32)
        for i in range(n):
            wi = jnp.maximum(0.0, 1.0 - jnp.abs(sx + (i - radius) - xx))
            for j in range(n):
                out_ref[0, :, base + i * n + j] = jnp.sum(
                    t_ref[j, :, :w] * wi, axis=1)


def corr_lookup_win(fmap1_flat, f2_slabs, coords, radius: int = 4,
                    tile_p: int = 128):
    """Windowed on-the-fly correlation lookup (no volume, tile-local slabs).

    Like :func:`corr_lookup_alt` but each pixel tile recomputes only a
    dynamic row window of its correlation map (GRU correspondence
    coordinates are spatially local for all but the wildest motions), so
    both the MXU dot and the tent contraction shrink ~4x; tiles with larger
    spread fall back to the full rows (same fori_loop with traced bounds —
    exact same math either way). The row loop is a fori_loop accumulating
    into a VMEM scratch, keeping kernel code size independent of h (the
    statically-unrolled predecessor exhausted Mosaic's scoped VMEM).

    args:
      fmap1_flat: (B, P, C) source features.
      f2_slabs: output of :func:`build_feature_pyramid_slab`.
      coords: (B, P, 2) float32 level-0 centers.
    returns: (B, P, L*(2r+1)^2) float32.
    """
    B, P, C = fmap1_flat.shape
    n = 2 * radius + 1
    L = len(f2_slabs)
    tp = _tile_p(P, tile_p)
    if tp < 8:
        raise ValueError(f"P={P} has no power-of-two tiling")
    dims = tuple(hwf for _, hwf in f2_slabs)
    ywins = tuple(max(16, h // 4) for (h, w, fold) in dims)
    max_w = max(w for (_, w, _) in dims)

    in_specs = [
        pl.BlockSpec((1, tp, 2), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tp, C), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
    ]
    for packed, _ in f2_slabs:
        hp, Cc, wp = packed.shape[1:]
        in_specs.append(pl.BlockSpec(
            (1, hp, Cc, wp), lambda b, t: (b, 0, 0, 0),
            memory_space=pltpu.VMEM))
    kernel = functools.partial(_win_kernel, radius=radius, tile_p=tp,
                               dims=dims, ywins=ywins,
                               inv_sqrt_c=float(C) ** -0.5)
    return pl.pallas_call(
        kernel,
        grid=(B, P // tp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tp, L * n * n), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, L * n * n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n, tp, max_w), jnp.float32)],
        interpret=_interpret(),
    )(coords.astype(jnp.float32), fmap1_flat.astype(f2_slabs[0][0].dtype),
      *[packed for packed, _ in f2_slabs])
