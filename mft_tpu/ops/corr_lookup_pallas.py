"""Fused Pallas TPU kernel for the RAFT correlation-pyramid lookup.

This is the TPU-native equivalent of the reference's CUDA kernel
(MFT/RAFT/alt_cuda_corr/correlation_kernel.cu:19-119): per query pixel,
sample a bilinear (2r+1)^2 window around its current correspondence from
every pyramid level. The XLA einsum formulation (models/raft/corr.py,
``_lookup_level_mxu``) materializes the tent-weight tensors and windowed
intermediates in HBM — ~6 GB of traffic per GRU iteration at 512x512.
This kernel keeps everything in VMEM: each (TILE_P, h, w) block of the
volume is read from HBM exactly once per lookup and contracted in-core.

Math (identical to _lookup_level_mxu, zeros-padding bilinear semantics):
    S[p, i, j] = sum_{y, x} Wy[p, j, y] * corr[p, y, x] * Wx[p, i, x]
with tent weights  W[p, k, t] = max(0, 1 - |c_p + (k - r) - t|),
window channel k = i * (2r+1) + j  <->  offset (dx = i - r, dy = j - r)
(the reference's transposed-offset quirk, MFT/RAFT/core/corr.py:38-44).

Two layouts:
- :func:`corr_lookup_pallas`   — volume (B, P, h, w) (pixel-major, matches
  ``build_corr_pyramid``); batched MXU dots per pixel tile.
- :func:`corr_lookup_pallas_t` — volume (B, h, w, P) (pixels on lanes);
  the y/x contractions run as full-width VPU FMAs. Requires the transposed
  pyramid from ``build_corr_pyramid_t``.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tile_p(P: int, cap: int = 256) -> int:
    """Largest power-of-two divisor of P, capped (0 if P has none >= 8)."""
    t = P & (-P)  # largest power of two dividing P
    t = min(t, cap)
    return t if t >= 8 else 0


# DIAGNOSTIC ONLY (tools/attrib_bench.py 'cheapw' variant): when True the
# pixel-major kernel replaces the tent weights with constants of the same
# shape — the MXU dots and DMA stay identical while the VPU weight build
# vanishes, isolating the build's share of the lookup cost. Wrong math.
_DIAG_FAKE_WEIGHTS = False


# --------------------------------------------------------------------------- #
# layout A: (B, P, h, w) pixel-major blocks, batched MXU dots
# --------------------------------------------------------------------------- #
def _kernel_pixel_major(coords_ref, *rest, radius: int, tile_p: int,
                        ywin: int = 0):
    n = 2 * radius + 1
    corr_refs, out_ref = rest[:-1], rest[-1]
    c = coords_ref[0]                     # (TILE_P, 2) f32, level-0 scale
    cx = c[:, 0][:, None, None]           # (TILE_P, 1, 1)
    cy = c[:, 1][:, None, None]

    for lvl, ref in enumerate(corr_refs):
        h, w = ref.shape[2], ref.shape[3]
        dt = ref.dtype
        inv = 1.0 / (2.0 ** lvl)
        base = lvl * n * n

        if _DIAG_FAKE_WEIGHTS:
            wx = (cx * inv).astype(dt) * jnp.ones((tile_p, n, w), dt)
        else:
            kx = jax.lax.broadcasted_iota(jnp.int32, (tile_p, n, w), 1).astype(jnp.float32) - radius
            xx = jax.lax.broadcasted_iota(jnp.int32, (tile_p, n, w), 2).astype(jnp.float32)
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(cx * inv + kx - xx)).astype(dt)

        def contract(corr, row0, k):
            """Tent-contract (TILE_P, k, w) rows starting at map row row0."""
            if _DIAG_FAKE_WEIGHTS:
                wy = (cy * inv).astype(dt) * jnp.ones((tile_p, n, k), dt)
            else:
                ky = jax.lax.broadcasted_iota(
                    jnp.int32, (tile_p, n, k), 1).astype(jnp.float32) - radius
                yy = row0 + jax.lax.broadcasted_iota(
                    jnp.int32, (tile_p, n, k), 2).astype(jnp.float32)
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(cy * inv + ky - yy)).astype(dt)
            # T[p, j, x] = sum_y Wy[p, j, y] corr[p, y, x]  (batched MXU dot)
            t = jax.lax.dot_general(
                wy, corr,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(dt)
            # S[p, i, j] = sum_x Wx[p, i, x] T[p, j, x]
            s = jax.lax.dot_general(
                wx, t,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            # (tp, n, n) -> (tp, n*n) written as n static column-slices
            # (Mosaic supports neither the relayouting reshape nor a wide
            # lane-concatenate of 9-wide vectors)
            for i in range(n):
                out_ref[0, :, base + i * n: base + (i + 1) * n] = (
                    s[:, i, :].astype(out_ref.dtype))

        if ywin and ywin < h:
            # dynamic row window: pixel tiles are raster-contiguous, so for
            # smooth correspondence fields the sampled rows span a narrow
            # 8-aligned slab — contract only it (4x less MXU work on the
            # big levels); wild tiles fall back to all rows (exact)
            sy = cy[:, :, 0] * inv                       # (TILE_P, 1)
            y_lo = jnp.min(sy) - (radius + 1.0)
            y_hi = jnp.max(sy) + radius + 1.0
            # clip bound floored to the 8-row alignment too: clipping to a
            # non-multiple h - ywin would break the multiple_of declaration
            hi8 = float(((h - ywin) // 8) * 8)
            y0f = jnp.clip(jnp.floor(y_lo / 8.0) * 8.0, 0.0, hi8)
            fits = y_hi <= y0f + (ywin - 1)
            y0 = pl.multiple_of(y0f.astype(jnp.int32), 8)

            @pl.when(fits)
            def _():
                contract(ref[0, :, pl.ds(y0, ywin), :],
                         y0.astype(jnp.float32), ywin)

            @pl.when(jnp.logical_not(fits))
            def _():
                contract(ref[0], 0.0, h)
        else:
            contract(ref[0], 0.0, h)


def corr_lookup_pallas(pyramid, coords, radius: int = 4, tile_p: int = 256,
                       ywin: int = 0):
    """Fused pyramid lookup, pixel-major volume layout.

    args:
      pyramid: list of (B, P, h_l, w_l) arrays (f32 or bf16).
      coords: (B, P, 2) float32 (x, y) centers at level-0 scale.
      ywin: if nonzero, levels taller than ywin rows contract only a dynamic
        8-aligned ywin-row window per tile (falling back to all rows when a
        tile's sample spread exceeds it — exact either way).
    returns:
      (B, P, L*(2r+1)^2) in the PYRAMID's dtype (f32 accumulation inside;
      a bf16 volume yields bf16 output — the consumers cast to the compute
      dtype anyway and the f32 round trip through HBM is pure waste);
      levels concatenated last, window channel k = i*(2r+1)+j with i
      offsetting x (reference ordering).
    """
    B, P, _, _ = pyramid[0].shape
    n = 2 * radius + 1
    L = len(pyramid)
    tp = _tile_p(P, tile_p)
    if tp == 0:
        raise ValueError(f"P={P} has no power-of-two tiling")
    out_dtype = pyramid[0].dtype

    grid = (B, P // tp)
    in_specs = [pl.BlockSpec((1, tp, 2), lambda b, p: (b, p, 0),
                             memory_space=pltpu.VMEM)]
    for lvl in range(L):
        h, w = pyramid[lvl].shape[2:]
        in_specs.append(pl.BlockSpec(
            (1, tp, h, w), lambda b, p: (b, p, 0, 0),
            memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1, tp, L * n * n), lambda b, p: (b, p, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel_pixel_major, radius=radius, tile_p=tp,
                               ywin=ywin)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, P, L * n * n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(coords.astype(jnp.float32), *pyramid)


# --------------------------------------------------------------------------- #
# layout A + fused epilogue: lookup -> motion-encoder convc1 (1x1) -> relu
# --------------------------------------------------------------------------- #
def _kernel_pixel_major_fused(coords_ref, wc_ref, b_ref, *rest, radius: int,
                              tile_p: int):
    """Pixel-major lookup with the 324->256 1x1 conv fused as an epilogue.

    Identical per-level tent contractions as _kernel_pixel_major, but the
    (tile_p, L*n*n) window samples stay in a VMEM scratch and are contracted
    against the motion encoder's convc1 kernel (+bias, relu) before leaving
    the kernel — the 324-ch lookup output never round-trips HBM on the
    iterations whose only consumer is convc1 (reference update.py:142-160
    applies convc1 immediately to the CUDA lookup's output).
    """
    n = 2 * radius + 1
    corr_refs, out_ref, s_ref = rest[:-2], rest[-2], rest[-1]
    c = coords_ref[0]
    cx = c[:, 0][:, None, None]
    cy = c[:, 1][:, None, None]

    for lvl, ref in enumerate(corr_refs):
        h, w = ref.shape[2], ref.shape[3]
        dt = ref.dtype
        inv = 1.0 / (2.0 ** lvl)
        base = lvl * n * n

        kx = jax.lax.broadcasted_iota(jnp.int32, (tile_p, n, w), 1).astype(jnp.float32) - radius
        xx = jax.lax.broadcasted_iota(jnp.int32, (tile_p, n, w), 2).astype(jnp.float32)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(cx * inv + kx - xx)).astype(dt)

        ky = jax.lax.broadcasted_iota(
            jnp.int32, (tile_p, n, h), 1).astype(jnp.float32) - radius
        yy = jax.lax.broadcasted_iota(
            jnp.int32, (tile_p, n, h), 2).astype(jnp.float32)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(cy * inv + ky - yy)).astype(dt)
        t = jax.lax.dot_general(
            wy, ref[0],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt)
        s = jax.lax.dot_general(
            wx, t,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        for i in range(n):
            s_ref[:, base + i * n: base + (i + 1) * n] = (
                s[:, i, :].astype(s_ref.dtype))

    # epilogue: relu(samples @ Wc + b) — samples quantize through the volume
    # dtype first, matching the unfused contract (lookup output is written
    # in the pyramid's dtype and convc1 consumes that)
    wdt = wc_ref.dtype
    samples = s_ref[...].astype(wdt)
    acc = jax.lax.dot_general(
        samples, wc_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)[None, :]
    out_ref[0] = jnp.maximum(acc, 0.0).astype(out_ref.dtype)


def corr_lookup_pallas_fused(pyramid, coords, wc, bias, radius: int = 4,
                             tile_p: int = 256):
    """Pixel-major pyramid lookup fused with a 1x1 conv + relu epilogue.

    args:
      pyramid: list of (B, P, h_l, w_l) arrays (f32 or bf16).
      coords: (B, P, 2) float32 level-0 (x, y) centers.
      wc: (L*(2r+1)^2, F) conv kernel; bias: (F,).
    returns: (B, P, F) = relu(lookup(pyramid, coords) @ wc + bias) in the
      pyramid's dtype, accumulated in float32.
    """
    B, P, _, _ = pyramid[0].shape
    n = 2 * radius + 1
    L = len(pyramid)
    C = L * n * n
    F = wc.shape[-1]
    if wc.shape[0] != C:
        raise ValueError(f"wc rows {wc.shape[0]} != L*n^2 = {C}")
    tp = _tile_p(P, tile_p)
    if tp == 0:
        raise ValueError(f"P={P} has no power-of-two tiling")
    out_dtype = pyramid[0].dtype

    grid = (B, P // tp)
    in_specs = [
        pl.BlockSpec((1, tp, 2), lambda b, p: (b, p, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C, F), lambda b, p: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, F), lambda b, p: (0, 0), memory_space=pltpu.VMEM),
    ]
    for lvl in range(L):
        h, w = pyramid[lvl].shape[2:]
        in_specs.append(pl.BlockSpec(
            (1, tp, h, w), lambda b, p: (b, p, 0, 0),
            memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1, tp, F), lambda b, p: (b, p, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel_pixel_major_fused, radius=radius,
                               tile_p=tp)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, P, F), out_dtype),
        scratch_shapes=[pltpu.VMEM((tp, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(coords.astype(jnp.float32), wc.astype(out_dtype),
      bias.reshape(1, F).astype(jnp.float32), *pyramid)


def _kernel_folded(coords_ref, *rest, radius: int, tile_p: int, dims,
                   ywin: int = 0):
    """Pixel-major lookup over FOLDED fully-lane-packed volume levels.

    The plain 4D (B, P, h, w) layout pads every w<128 map row to 128
    lanes — at 512x512 the physical pyramid is ~880 MB/lookup instead of
    the logical 313 MB, and the (DMA-bound) lookup kernel sits at that
    padded-DMA floor (profiled).  The folded layout packs ``fold`` = 128/w
    adjacent image rows into each 128-lane row: levels are (B, P, h/fold,
    128) with lane = u*w + x for image row y = q*fold + u.  Blocks arrive
    natively (sublane, lane)-tiled — no in-kernel reshape (an earlier flat
    (B, P, h*w) variant needed a (tp, h*w)->(tp, hp, 128) view per level,
    which Mosaic executes as a real VMEM relayout and benched at 11.7 vs
    16.7 FPS).  The y tent-contraction runs as ``fold`` batched dots over
    the packed rows — same total MACs as the padded pixel-major kernel's
    single dot — one per row-within-group offset u, each result
    contributing lanes [u*w:(u+1)*w].  Math identical to
    _kernel_pixel_major / _lookup_level_mxu.

    ``ywin`` (image rows, multiple of 8*fold) optionally contracts only a
    dynamic row window around the sampled span, as _kernel_pixel_major.
    """
    n = 2 * radius + 1
    corr_refs, out_ref = rest[:-1], rest[-1]
    c = coords_ref[0]                     # (TILE_P, 2) f32, level-0 scale
    cx = c[:, 0][:, None, None]           # (TILE_P, 1, 1)
    cy = c[:, 1][:, None, None]

    for lvl, ref in enumerate(corr_refs):
        h, w = dims[lvl]
        dt = ref.dtype
        inv = 1.0 / (2.0 ** lvl)
        base = lvl * n * n

        kx = jax.lax.broadcasted_iota(
            jnp.int32, (tile_p, n, w), 1).astype(jnp.float32) - radius
        xx = jax.lax.broadcasted_iota(
            jnp.int32, (tile_p, n, w), 2).astype(jnp.float32)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(cx * inv + kx - xx)).astype(dt)

        def write_out(t, base=base, dt=dt, wx=wx):
            # S[p, i, j] = sum_x Wx[p, i, x] T[p, j, x]; written as n static
            # column-slices (Mosaic supports neither the relayouting
            # reshape nor a wide lane-concatenate)
            s = jax.lax.dot_general(
                wx, t.astype(dt),
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            for i in range(n):
                out_ref[0, :, base + i * n: base + (i + 1) * n] = (
                    s[:, i, :].astype(out_ref.dtype))

        if h * w <= 128:
            # whole (zero-padded) map is one packed row: weight every lane
            # by its image row's tent and reduce lane groups to x columns
            # with a static one-hot select matrix (Mosaic rejects both the
            # (tp, 1, hw) view and sub-128-lane minor dims)
            x2 = ref[0, :, 0, :]                          # (tp, 128)
            hwp = x2.shape[-1]
            ky2 = jax.lax.broadcasted_iota(
                jnp.int32, (tile_p, n, hwp), 1).astype(jnp.float32) - radius
            yy_l = (jax.lax.broadcasted_iota(
                jnp.int32, (tile_p, n, hwp), 2) // w).astype(jnp.float32)
            wfull = jnp.maximum(
                0.0, 1.0 - jnp.abs(cy * inv + ky2 - yy_l)).astype(dt)
            prod = wfull * x2[:, None, :]
            xl = jax.lax.broadcasted_iota(jnp.int32, (hwp, w), 0) % w
            xc = jax.lax.broadcasted_iota(jnp.int32, (hwp, w), 1)
            sel = (xl == xc).astype(dt)                   # (hwp, w)
            t = jax.lax.dot_general(
                prod, sel,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            write_out(t)
            continue

        fold = 128 // w                   # image rows per packed row
        h2 = h // fold                    # packed rows

        def contract(x4, q0, nq, fold=fold, lvl=lvl, inv=inv, dt=dt,
                     write_out=write_out, w=w):
            """Tent-contract (tile_p, nq, 128) packed rows starting at
            packed row q0 (absolute image row q0*fold)."""
            ky = jax.lax.broadcasted_iota(
                jnp.int32, (tile_p, n, nq), 1).astype(jnp.float32) - radius
            qq = (q0.astype(jnp.float32) + jax.lax.broadcasted_iota(
                jnp.int32, (tile_p, n, nq), 2).astype(jnp.float32)) * fold
            t = None
            for u in range(fold):
                wy_u = jnp.maximum(
                    0.0, 1.0 - jnp.abs(cy * inv + ky - (qq + u))).astype(dt)
                d = jax.lax.dot_general(
                    wy_u, x4,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)      # (tp, n, 128)
                part = d[:, :, u * w:(u + 1) * w]
                t = part if t is None else t + part
            write_out(t)

        if ywin and ywin < h and ywin % fold == 0:
            # dynamic packed-row window: pixel tiles are raster-contiguous,
            # so for smooth correspondence fields the sampled rows span a
            # narrow slab — contract only it; wild tiles fall back to all
            # rows (exact).  q0 is kept 8-packed-row aligned for Mosaic.
            qwin = ywin // fold
            align = 8 * fold              # image rows per aligned q0 step
            sy = cy[:, :, 0] * inv                       # (TILE_P, 1)
            y_lo = jnp.min(sy) - (radius + 1.0)
            y_hi = jnp.max(sy) + radius + 1.0
            # clip bound floored to the alignment too (a non-multiple
            # h - ywin would break the multiple_of declaration below)
            hi = float(((h - ywin) // align) * align)
            y0f = jnp.clip(jnp.floor(y_lo / align) * align, 0.0, hi)
            fits = y_hi <= y0f + (ywin - 1)
            q0 = pl.multiple_of((y0f.astype(jnp.int32)) // fold, 8)

            @pl.when(fits)
            def _():
                contract(ref[0, :, pl.ds(q0, qwin), :], q0, qwin)

            @pl.when(jnp.logical_not(fits))
            def _():
                contract(ref[0], jnp.int32(0), h2)
        else:
            contract(ref[0], jnp.int32(0), h2)


def corr_lookup_pallas_folded(pyramid_folded, dims, coords, radius: int = 4,
                              tile_p: int = 128, ywin: int = 0):
    """Lookup over folded (B, P, h/fold, 128) volume levels (_kernel_folded).

    args:
      pyramid_folded: list of (B, P, h2_l, 128) arrays
        (build_corr_pyramid_pallas with folded=True).
      dims: [(h_l, w_l)] logical per-level map sizes.
      coords: (B, P, 2) float32 level-0 centers.
      ywin: optional per-tile dynamic row window (image rows) on levels
        where it divides cleanly; 0 disables.
    returns: (B, P, L*(2r+1)^2) in the volume dtype.
    """
    B, P, _, _ = pyramid_folded[0].shape
    n = 2 * radius + 1
    L = len(pyramid_folded)
    tp = _tile_p(P, tile_p)
    if tp == 0:
        raise ValueError(f"P={P} has no power-of-two tiling")
    out_dtype = pyramid_folded[0].dtype

    in_specs = [pl.BlockSpec((1, tp, 2), lambda b, p: (b, p, 0),
                             memory_space=pltpu.VMEM)]
    for lvl in range(L):
        h2 = pyramid_folded[lvl].shape[2]
        in_specs.append(pl.BlockSpec(
            (1, tp, h2, 128), lambda b, p: (b, p, 0, 0),
            memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1, tp, L * n * n), lambda b, p: (b, p, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel_folded, radius=radius, tile_p=tp,
                               dims=tuple(dims), ywin=ywin)
    return pl.pallas_call(
        kernel,
        grid=(B, P // tp),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, P, L * n * n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(coords.astype(jnp.float32), *pyramid_folded)


def _build_kernel(f1_ref, *rest, dims, tile_p: int, inv_sqrt_c: float):
    """Write all folded pyramid levels for one pixel tile.

    Each MXU dot produces exactly one packed row: f2 arrives in flat
    raster row order, so rows [q*128:(q+1)*128) of f2 are image rows
    [q*fold:(q+1)*fold) — the (TILE_P, 128) result IS the folded lane
    layout, written with zero data movement.  Small levels come in
    zero-row-padded to 128 (zero features => zero correlation lanes).
    """
    L = len(dims)
    f2_refs, out_refs = rest[:L], rest[L:]
    f1 = f1_ref[0]                                   # (TILE_P, C)
    for lvl, (f2_ref, out_ref) in enumerate(zip(f2_refs, out_refs)):
        h2 = out_ref.shape[2]
        f2 = f2_ref[0]                               # (h2*128, C)
        for q in range(h2):
            # f32 accumulation, scaled, cast to storage dtype — same
            # numerics as the XLA einsum build (corr.py:72-74)
            g = jax.lax.dot_general(
                f1, f2[q * 128:(q + 1) * 128],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * inv_sqrt_c
            out_ref[0, :, q, :] = g.astype(out_ref.dtype)


def build_corr_pyramid_pallas(fmap1, fmap2, num_levels: int = 4,
                              normalized_features: bool = False,
                              dtype=jnp.float32, tile_p: int = 128):
    """All-pairs correlation pyramid built INSIDE a Pallas kernel, in the
    folded fully-lane-packed layout corr_lookup_pallas_folded reads.

    Same math as models.raft.corr.build_corr_pyramid (pooled features,
    1/sqrt(C) scale, f32 accumulation), but each (TILE_P, 128) MXU dot
    result is written directly as one packed volume row — XLA's dot emits
    the (B, P, q) result q-major and then pays a relayout copy per level
    at 512x512 (profiled), and the 4D (B, P, h, w) layout additionally
    pads w<128 rows to 128 lanes in HBM (~2.8x the lookup DMA).

    returns: (levels, dims) — levels[l] is (B, P, h_l/fold_l, 128) in
    ``dtype`` (lane = u*w + x, image row y = q*fold + u), dims[l] the
    logical (h_l, w_l).  Requires 128 % w_l == 0 (or h_l*w_l <= 128) per
    level — see models.raft.raft._packable.
    """
    B, H, W, C = fmap1.shape
    P = H * W
    f1 = fmap1.reshape(B, P, C).astype(dtype)
    f2 = fmap2.astype(dtype)
    if normalized_features:
        f1 = f1 / jnp.linalg.norm(f1.astype(jnp.float32), axis=-1,
                                  keepdims=True).astype(dtype)
        f2 = f2 / jnp.linalg.norm(f2.astype(jnp.float32), axis=-1,
                                  keepdims=True).astype(dtype)

    # pool FEATURES per level (cheap; pooling commutes with the dot)
    from mft_tpu.models.raft.corr import avg_pool2x2_nhwc
    f2_levels = []
    dims = []
    cur = f2
    h, w = H, W
    for lvl in range(num_levels):
        if lvl > 0:
            cur = avg_pool2x2_nhwc(cur)
            h, w = cur.shape[1], cur.shape[2]
        flat = cur.reshape(B, h * w, C)
        if h * w < 128:
            # zero feature rows => zero correlation in the padding lanes
            flat = jnp.pad(flat, ((0, 0), (0, 128 - h * w), (0, 0)))
        f2_levels.append(flat)
        dims.append((h, w))

    tp = _tile_p(P, tile_p)
    if tp < 8:
        raise ValueError(f"P={P} has no power-of-two tiling")

    in_specs = [pl.BlockSpec((1, tp, C), lambda b, t: (b, t, 0),
                             memory_space=pltpu.VMEM)]
    for f2l in f2_levels:
        r = f2l.shape[1]
        in_specs.append(pl.BlockSpec((1, r, C), lambda b, t: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
    h2s = [f2l.shape[1] // 128 for f2l in f2_levels]
    out_specs = [pl.BlockSpec((1, tp, h2, 128), lambda b, t: (b, t, 0, 0),
                              memory_space=pltpu.VMEM) for h2 in h2s]
    out_shapes = [jax.ShapeDtypeStruct((B, P, h2, 128), dtype) for h2 in h2s]

    kernel = functools.partial(_build_kernel, dims=tuple(dims), tile_p=tp,
                               inv_sqrt_c=float(C) ** -0.5)
    out = pl.pallas_call(
        kernel,
        grid=(B, P // tp),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(f1, *f2_levels)
    return list(out), dims


def _kernel_pixel_major_q(coords_ref, scales_ref, *rest, radius: int,
                          tile_p: int):
    """Pixel-major lookup over an int8-QUANTIZED volume.

    Same contraction as _kernel_pixel_major, but the volume blocks arrive
    as int8 (half the HBM DMA — the lookup kernel is DMA-bound) and are
    widened to bfloat16 in VMEM. Quantized integer values (|v| <= 127) are
    EXACTLY representable in bf16, so the tent matmuls are exact given the
    quantized volume; dequantization is one scalar multiply per level on
    the (TILE_P, n, n) output (scales_ref[b, lvl] = max|corr| / 127).
    """
    n = 2 * radius + 1
    corr_refs, out_ref = rest[:-1], rest[-1]
    b = pl.program_id(0)
    c = coords_ref[0]                     # (TILE_P, 2) f32, level-0 scale
    cx = c[:, 0][:, None, None]           # (TILE_P, 1, 1)
    cy = c[:, 1][:, None, None]
    dt = jnp.bfloat16

    for lvl, ref in enumerate(corr_refs):
        h, w = ref.shape[2], ref.shape[3]
        inv = 1.0 / (2.0 ** lvl)
        base = lvl * n * n
        scale = scales_ref[b, lvl]

        kx = jax.lax.broadcasted_iota(
            jnp.int32, (tile_p, n, w), 1).astype(jnp.float32) - radius
        xx = jax.lax.broadcasted_iota(
            jnp.int32, (tile_p, n, w), 2).astype(jnp.float32)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(cx * inv + kx - xx)).astype(dt)

        ky = jax.lax.broadcasted_iota(
            jnp.int32, (tile_p, n, h), 1).astype(jnp.float32) - radius
        yy = jax.lax.broadcasted_iota(
            jnp.int32, (tile_p, n, h), 2).astype(jnp.float32)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(cy * inv + ky - yy)).astype(dt)
        corr = ref[0].astype(dt)          # int8 -> bf16 widen in VMEM
        t = jax.lax.dot_general(
            wy, corr,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt)
        s = jax.lax.dot_general(
            wx, t,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        for i in range(n):
            out_ref[0, :, base + i * n: base + (i + 1) * n] = (
                s[:, i, :].astype(out_ref.dtype))


def corr_lookup_pallas_q(pyramid_i8, scales, coords, radius: int = 4,
                         tile_p: int = 128):
    """Fused pyramid lookup over an int8 volume (see _kernel_pixel_major_q).

    args:
      pyramid_i8: list of (B, P, h_l, w_l) int8 arrays.
      scales: (B, L) float32 per-(pair, level) dequantization scales.
      coords: (B, P, 2) float32 (x, y) centers at level-0 scale.
    returns: (B, P, L*(2r+1)^2) bfloat16.
    """
    B, P, _, _ = pyramid_i8[0].shape
    n = 2 * radius + 1
    L = len(pyramid_i8)
    tp = _tile_p(P, tile_p)
    if tp == 0:
        raise ValueError(f"P={P} has no power-of-two tiling")

    grid = (B, P // tp)
    in_specs = [
        pl.BlockSpec((1, tp, 2), lambda b, p: (b, p, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, L), lambda b, p: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    for lvl in range(L):
        h, w = pyramid_i8[lvl].shape[2:]
        in_specs.append(pl.BlockSpec(
            (1, tp, h, w), lambda b, p: (b, p, 0, 0),
            memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1, tp, L * n * n), lambda b, p: (b, p, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel_pixel_major_q, radius=radius,
                               tile_p=tp)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, P, L * n * n), jnp.bfloat16),
        interpret=_interpret(),
    )(coords.astype(jnp.float32), scales.astype(jnp.float32), *pyramid_i8)


# --------------------------------------------------------------------------- #
# layout P: ALL pyramid levels lane-packed side by side in ONE map per pixel
# --------------------------------------------------------------------------- #
def pack_corr_pyramid(pyramid):
    """Concatenate pyramid levels along LANES into one (B, P, H0, sum_w) map.

    The per-level kernels (_kernel_pixel_major) issue 2 batched dots per
    pixel per LEVEL (8 per pixel at 4 levels), and profiling shows the
    lookup is bound by that dot count, not by DMA or MACs (int8 volumes,
    ywin row windows and tile-size sweeps all left it unchanged). Packing
    the levels side by side — level l occupying lanes
    [off_l, off_l + w_l) of a shared (H0, sum_l w_l) map, rows >= h_l
    zero-padded — lets :func:`corr_lookup_pallas_packed` contract ALL levels
    with 2 batched dots per pixel total, each with 4x the rows (L*n vs n):
    4x fewer dot issues and far better MXU shapes. As a bonus the physical
    HBM volume drops ~2x: at 512x512 the plain 4D layout lane-pads every
    w<128 level to 128 lanes (~880 MB per lookup), while the packed map is
    64+32+16+8 = 120 lanes (~470 MB).

    returns: (packed (B, P, H0, sum_w), dims tuple of (h_l, w_l)).
    Requires sum_l w_l <= 128 (one physical lane row), i.e. W0 <= 68.
    """
    B, P, H0, W0 = pyramid[0].shape
    cols, dims = [], []
    for arr in pyramid:
        h, w = arr.shape[2:]
        dims.append((h, w))
        if h < H0:
            # zero row padding => exact zeros-padding bilinear semantics for
            # y taps beyond the level's map (no weight masking needed)
            arr = jnp.pad(arr, ((0, 0), (0, 0), (0, H0 - h), (0, 0)))
        cols.append(arr)
    if sum(w for _, w in dims) > 128:
        raise ValueError(
            f"packed layout needs sum of level widths <= 128 lanes, got "
            f"{[w for _, w in dims]}")
    return jnp.concatenate(cols, axis=-1), tuple(dims)


def _kernel_packed(coords_ref, *rest, radius: int, tile_p: int, dims):
    """All-levels tent lookup over the lane-packed volume: 2 dots per tile.

    Math identical to _kernel_pixel_major / _lookup_level_mxu. The x tent
    weights are masked to each level's lane range (lanes outside a level
    hold OTHER levels' data); y taps beyond a level's height hit the packed
    map's zero row padding, which IS the zeros-padding bilinear semantics.
    The second dot computes all (L*n)^2 cross products and keeps the L
    diagonal n x n blocks — 4x the MACs of the per-level form, but MACs are
    free here; dot ISSUES are the bottleneck (see pack_corr_pyramid).

    Quantized variant (``rest`` = scales_ref, packed_ref, out_ref): the map
    arrives int8 (half the HBM DMA of bf16) and is widened to bf16 in VMEM —
    quantized integer values (|v| <= 127) are EXACT in bf16, so the tent
    contraction is exact given the quantized volume; dequantization is one
    scalar multiply per level on the diagonal output block
    (scales_ref[b, lvl] = max|corr_lvl| / 127).
    """
    n = 2 * radius + 1
    L = len(dims)
    quantized = len(rest) == 3
    if quantized:
        scales_ref, packed_ref, out_ref = rest
        b = pl.program_id(0)
        dt = jnp.bfloat16
    else:
        packed_ref, out_ref = rest
        dt = packed_ref.dtype
    c = coords_ref[0]                     # (TILE_P, 2) f32, level-0 scale
    cx = c[:, 0][:, None, None]           # (TILE_P, 1, 1)
    cy = c[:, 1][:, None, None]
    H0 = packed_ref.shape[2]
    Wp = packed_ref.shape[3]

    wy_parts, wx_parts = [], []
    off = 0
    for lvl, (h, w) in enumerate(dims):
        inv = 1.0 / (2.0 ** lvl)
        ky = jax.lax.broadcasted_iota(
            jnp.int32, (tile_p, n, H0), 1).astype(jnp.float32) - radius
        yy = jax.lax.broadcasted_iota(
            jnp.int32, (tile_p, n, H0), 2).astype(jnp.float32)
        wy_parts.append(jnp.maximum(0.0, 1.0 - jnp.abs(cy * inv + ky - yy)))
        kx = jax.lax.broadcasted_iota(
            jnp.int32, (tile_p, n, Wp), 1).astype(jnp.float32) - radius
        xi = jax.lax.broadcasted_iota(jnp.int32, (tile_p, n, Wp), 2) - off
        xl = xi.astype(jnp.float32)
        wxl = jnp.maximum(0.0, 1.0 - jnp.abs(cx * inv + kx - xl))
        wx_parts.append(jnp.where((xi >= 0) & (xi < w), wxl, 0.0))
        off += w
    wy = jnp.concatenate(wy_parts, axis=1).astype(dt)     # (tp, L*n, H0)
    wx = jnp.concatenate(wx_parts, axis=1).astype(dt)     # (tp, L*n, Wp)

    x = packed_ref[0]                                     # (tp, H0, Wp)
    if quantized:
        x = x.astype(dt)                  # int8 -> bf16 widen in VMEM
    # T[p, l*n+j, lane] = sum_y Wy[p, l*n+j, y] map[p, y, lane]
    t = jax.lax.dot_general(
        wy, x,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dt)
    # S[p, l*n+i, m*n+j] = sum_lane Wx[p, l*n+i, lane] T[p, m*n+j, lane];
    # only the l == m diagonal blocks are meaningful (wx masks its level)
    s = jax.lax.dot_general(
        wx, t,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    for lvl in range(L):
        base = lvl * n * n
        blk = s[:, lvl * n: lvl * n + n, lvl * n: lvl * n + n]
        if quantized:
            blk = blk * scales_ref[b, lvl]
        for i in range(n):
            out_ref[0, :, base + i * n: base + (i + 1) * n] = (
                blk[:, i, :].astype(out_ref.dtype))


def corr_lookup_pallas_packed(packed, dims, coords, radius: int = 4,
                              tile_p: int = 256):
    """Fused pyramid lookup over the lane-packed volume (_kernel_packed).

    args:
      packed: (B, P, H0, sum_w) from :func:`pack_corr_pyramid`.
      dims: tuple of per-level (h_l, w_l).
      coords: (B, P, 2) float32 (x, y) centers at level-0 scale.
    returns: (B, P, L*(2r+1)^2) in the volume dtype (f32 accumulation).
    """
    B, P, _, _ = packed.shape
    n = 2 * radius + 1
    L = len(dims)
    tp = _tile_p(P, tile_p)
    if tp == 0:
        raise ValueError(f"P={P} has no power-of-two tiling")
    out_dtype = packed.dtype

    in_specs = [
        pl.BlockSpec((1, tp, 2), lambda b, p: (b, p, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tp, packed.shape[2], packed.shape[3]),
                     lambda b, p: (b, p, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, tp, L * n * n), lambda b, p: (b, p, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel_packed, radius=radius, tile_p=tp,
                               dims=tuple(dims))
    return pl.pallas_call(
        kernel,
        grid=(B, P // tp),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, P, L * n * n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(coords.astype(jnp.float32), packed)


def pack_corr_pyramid_i8(pyramid):
    """pack_corr_pyramid with per-(pair, level) int8 quantization.

    Halves the lane-packed volume's HBM bytes again (int8 vs bf16) — the
    fallback if the packed lookup turns out DMA-bound. Quantization error
    is bounded by max|corr_lvl|/254 per value; the tent contraction itself
    is exact on the quantized values (see _kernel_packed's quantized mode).

    returns: (packed int8 (B, P, H0, sum_w), scales (B, L) f32 with
    value = q * scale, dims tuple of (h_l, w_l)).
    """
    from mft_tpu.models.raft.corr import quantize_pyramid
    levels, scales = quantize_pyramid(pyramid)
    packed, dims = pack_corr_pyramid(levels)
    return packed, scales, dims


def corr_lookup_pallas_packed_i8(packed_i8, scales, dims, coords,
                                 radius: int = 4, tile_p: int = 256):
    """Lookup over the int8 lane-packed volume (_kernel_packed, quantized).

    args:
      packed_i8: (B, P, H0, sum_w) int8 from :func:`pack_corr_pyramid_i8`.
      scales: (B, L) float32 per-(pair, level) dequantization scales.
      dims: tuple of per-level (h_l, w_l).
      coords: (B, P, 2) float32 (x, y) centers at level-0 scale.
    returns: (B, P, L*(2r+1)^2) bfloat16.
    """
    B, P, _, _ = packed_i8.shape
    n = 2 * radius + 1
    L = len(dims)
    tp = _tile_p(P, tile_p)
    if tp == 0:
        raise ValueError(f"P={P} has no power-of-two tiling")

    in_specs = [
        pl.BlockSpec((1, tp, 2), lambda b, p: (b, p, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, L), lambda b, p: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, tp, packed_i8.shape[2], packed_i8.shape[3]),
                     lambda b, p: (b, p, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, tp, L * n * n), lambda b, p: (b, p, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel_packed, radius=radius, tile_p=tp,
                               dims=tuple(dims))
    return pl.pallas_call(
        kernel,
        grid=(B, P // tp),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, P, L * n * n), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(coords.astype(jnp.float32), scales.astype(jnp.float32), packed_i8)


# NOTE on manual-DMA row windowing: a chunked HBM->VMEM DMA variant of the
# pixel-major kernel (skip volume row bands no pixel of the tile samples —
# the role of the reference CUDA kernel's shared-memory staging) was built
# and removed: Mosaic requires DMA slice shapes 128-lane aligned, and the
# level-0 maps are 64 wide, so the kernel cannot compile on this toolchain
# ("Slice shape along dimension 3 must be aligned to tiling (128)").
# Padding the volume to 128 lanes would double the DMA bytes and erase the
# win. Revisit if the volume layout ever packs two rows per 128 lanes.


# --------------------------------------------------------------------------- #
# layout M: big levels folded DENSE (128 lanes = fold image rows), small
# levels padded pixel-major — dense DMA with pixel-major-cheap compute
# --------------------------------------------------------------------------- #
def _kernel_mixed(coords_ref, *rest, radius: int, tile_p: int, fdims,
                  n_folded: int):
    """Lookup over folded big levels + padded small levels.

    The production pixel-major kernel is read-DMA-bound on the PADDED
    volume blocks (isolated probe: read-only == full kernel == 1.7 ms/call
    at 512px; the dense folded read is 0.9 ms). Earlier folded-compute
    schemes lost the DMA win to EXTRA MXU ops (per-fold lane-slice
    extraction 3.4 ms/call; per-parity y/x dot pairs 2.16 ms/lookup
    in-graph vs 1.36 for the padded kernel). This kernel keeps the padded
    kernel's exact 2-dots-per-level structure on the dense layout:

      y:  D2 = dot(Wy2, F)   — ONE interleaved dot; Wy2 row m = u*n + j
          holds the tent of y-tap j evaluated at image rows r*fold + u,
          so D2 contains every parity's partial as a CONTIGUOUS n-row
          band (same MACs as the padded y-dot, all 128 lanes useful)
      Σ:  T2 = sum_u D2[u-band] * mask_u — fold cheap VPU multiply-adds
          with the constant lane-parity mask (lane//w == u)
      x:  S = dot(Wx, T2) with x tents at lane positions x = lane % w;
          no cross-group leakage is possible because group selection
          already happened in T2, so the tents need no masking.

    Same math as _kernel_pixel_major (f32 accumulation per dot; the fold
    partial sum adds in f32 — accumulation-order-level difference only).

    args layout: coords, folded levels (n_folded), padded levels, out.
    fdims: per-FOLDED-level (h, w).
    """
    n = 2 * radius + 1
    corr_refs, out_ref = rest[:-1], rest[-1]
    c = coords_ref[0]                     # (TILE_P, 2) f32, level-0 scale
    cx = c[:, 0][:, None, None]           # (TILE_P, 1, 1)
    cy = c[:, 1][:, None, None]

    for lvl, ref in enumerate(corr_refs):
        inv = 1.0 / (2.0 ** lvl)
        base = lvl * n * n
        dt = ref.dtype

        if lvl < n_folded:
            h, w = fdims[lvl]
            fold = 128 // w
            h2 = h // fold
            F = ref[0]                                    # (tp, h2, 128)
            nf = n * fold
            m_i = jax.lax.broadcasted_iota(jnp.int32, (tile_p, nf, h2), 1)
            r_i = jax.lax.broadcasted_iota(jnp.int32, (tile_p, nf, h2), 2)
            ky = (m_i % n).astype(jnp.float32) - radius   # y tap j
            yy = (r_i * fold + m_i // n).astype(jnp.float32)  # row parity u
            wy2 = jnp.maximum(0.0, 1.0 - jnp.abs(cy * inv + ky - yy)
                              ).astype(dt)                # (tp, n*fold, h2)
            d2 = jax.lax.dot_general(
                wy2, F,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)       # (tp, n*fold, 128)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, n, 128), 2)
            ug = lane // w
            t2 = None
            for u in range(fold):
                part = d2[:, u * n:(u + 1) * n, :] * jnp.where(ug == u,
                                                               1.0, 0.0)
                t2 = part if t2 is None else t2 + part    # (tp, n, 128) f32
            kx = jax.lax.broadcasted_iota(
                jnp.int32, (tile_p, n, 128), 1).astype(jnp.float32) - radius
            xl = (lane % w).astype(jnp.float32)
            wx2 = jnp.maximum(0.0, 1.0 - jnp.abs(cx * inv + kx - xl)
                              ).astype(dt)                # (tp, n, 128)
            s = jax.lax.dot_general(
                wx2, t2.astype(dt),
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)       # (tp, n_i, n_j)
            for i in range(n):
                out_ref[0, :, base + i * n: base + (i + 1) * n] = (
                    s[:, i, :].astype(out_ref.dtype))
            continue

        # small levels: standard padded pixel-major 2-dot contraction
        h, w = ref.shape[2], ref.shape[3]
        kx = jax.lax.broadcasted_iota(
            jnp.int32, (tile_p, n, w), 1).astype(jnp.float32) - radius
        xx = jax.lax.broadcasted_iota(
            jnp.int32, (tile_p, n, w), 2).astype(jnp.float32)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(cx * inv + kx - xx)).astype(dt)
        ky = jax.lax.broadcasted_iota(
            jnp.int32, (tile_p, n, h), 1).astype(jnp.float32) - radius
        yy = jax.lax.broadcasted_iota(
            jnp.int32, (tile_p, n, h), 2).astype(jnp.float32)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(cy * inv + ky - yy)).astype(dt)
        t = jax.lax.dot_general(
            wy, ref[0],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt)
        s = jax.lax.dot_general(
            wx, t,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        for i in range(n):
            out_ref[0, :, base + i * n: base + (i + 1) * n] = (
                s[:, i, :].astype(out_ref.dtype))


def corr_lookup_pallas_mixed(folded, fdims, padded, coords, radius: int = 4,
                             tile_p: int = 512):
    """Fused pyramid lookup over folded big levels + padded small levels.

    args:
      folded: list of (B, P, h_l/fold_l, 128) DENSE arrays, lane = u*w + x
        (a free reshape of the flat (B, P, h*w) einsum output — see
        corr.py fold_level).
      fdims: per-folded-level (h, w).
      padded: remaining levels as plain (B, P, h, w) arrays.
      coords: (B, P, 2) float32 level-0 centers.
    returns: (B, P, L*(2r+1)^2) in the volume dtype, reference ordering.
    """
    B, P = folded[0].shape[:2]
    n = 2 * radius + 1
    L = len(folded) + len(padded)
    tp = _tile_p(P, tile_p)
    if tp == 0:
        raise ValueError(f"P={P} has no power-of-two tiling")
    out_dtype = folded[0].dtype

    in_specs = [pl.BlockSpec((1, tp, 2), lambda b, p: (b, p, 0),
                             memory_space=pltpu.VMEM)]
    for arr in list(folded) + list(padded):
        s2, s3 = arr.shape[2], arr.shape[3]
        in_specs.append(pl.BlockSpec(
            (1, tp, s2, s3), lambda b, p: (b, p, 0, 0),
            memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1, tp, L * n * n), lambda b, p: (b, p, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel_mixed, radius=radius, tile_p=tp,
                               fdims=tuple(fdims), n_folded=len(folded))
    return pl.pallas_call(
        kernel,
        grid=(B, P // tp),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, P, L * n * n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(coords.astype(jnp.float32), *folded, *padded)

# --------------------------------------------------------------------------- #
# layout B: (B, h, w, P) pixels-on-lanes blocks, full-width VPU FMAs
# --------------------------------------------------------------------------- #
def _kernel_lane_major(coords_ref, *rest, radius: int, tile_p: int):
    n = 2 * radius + 1
    corr_refs, out_ref = rest[:-1], rest[-1]
    c = coords_ref[0]                     # (2, TILE_P) f32
    cx = c[0]                             # (TILE_P,)
    cy = c[1]

    off = 0
    for lvl, ref in enumerate(corr_refs):
        h, w = ref.shape[1:3]
        inv = 1.0 / (2.0 ** lvl)
        sx = cx * inv                     # (TILE_P,)
        sy = cy * inv

        # y contraction: T[j, x, p] = sum_y tent(sy + j - r - y) corr[y, x, p]
        # statically unrolled (Mosaic cannot dynamic-slice loaded vectors);
        # each step is a full-lane-width (w, TILE_P) VPU FMA.
        t = [jnp.zeros((w, tile_p), jnp.float32) for _ in range(n)]
        for y in range(h):
            row = ref[0, y].astype(jnp.float32)           # (w, TILE_P)
            d = sy - float(y)                              # (TILE_P,)
            for j in range(n):
                wj = jnp.maximum(0.0, 1.0 - jnp.abs(d + (j - radius)))
                t[j] = t[j] + row * wj[None, :]

        # x contraction: S[i, j, p] = sum_x tent(sx + i - r - x) T[j, x, p]
        s = [[jnp.zeros((tile_p,), jnp.float32)] * n for _ in range(n)]
        for x in range(w):
            d = sx - float(x)
            wi = [jnp.maximum(0.0, 1.0 - jnp.abs(d + (i - radius)))
                  for i in range(n)]
            for j in range(n):
                col = t[j][x]                              # (TILE_P,)
                for i in range(n):
                    s[i][j] = s[i][j] + col * wi[i]

        for i in range(n):
            for j in range(n):
                out_ref[0, off + i * n + j] = s[i][j]
        off += n * n


def build_corr_pyramid_t(fmap1, fmap2, num_levels: int = 4,
                         normalized_features: bool = False,
                         dtype=jnp.float32):
    """All-pairs correlation pyramid in (B, h, w, P) lane-major layout.

    Same math as models.raft.corr.build_corr_pyramid (incl. 1/sqrt(C) scale
    and torch floor avg-pool semantics), but the volume is stored with the
    SOURCE pixel on the minor (lane) axis so :func:`corr_lookup_pallas_t`
    reads it without relayout. The transpose is free: we swap the matmul
    operands instead of transposing the (B, P, h, w) volume.
    """
    B, H, W, C = fmap1.shape
    f1 = fmap1.reshape(B, H * W, C).astype(dtype)
    f2 = fmap2.astype(dtype)
    if normalized_features:
        f1 = f1 / jnp.linalg.norm(f1.astype(jnp.float32), axis=-1,
                                  keepdims=True).astype(dtype)
        f2 = f2 / jnp.linalg.norm(f2.astype(jnp.float32), axis=-1,
                                  keepdims=True).astype(dtype)
    # pool FEATURES, not volumes (dot products are linear — bit-equivalent
    # to pooling the (B, y, x, P) volume incl. floor/VALID truncation, and
    # ~10x less HBM traffic; same trick as build_corr_pyramid)
    from mft_tpu.models.raft.corr import avg_pool2x2_nhwc
    scale = 1.0 / jnp.sqrt(jnp.float32(C))
    pyramid = []
    h, w = H, W
    for lvl in range(num_levels):
        if lvl > 0:
            f2 = avg_pool2x2_nhwc(f2)
            h, w = f2.shape[1], f2.shape[2]
        corr_l = jnp.einsum("bqc,bpc->bqp", f2.reshape(B, h * w, C), f1,
                            preferred_element_type=jnp.float32)
        pyramid.append((corr_l * scale).astype(dtype).reshape(B, h, w, H * W))
    return pyramid


def corr_lookup_pallas_t(pyramid_t, coords, radius: int = 4,
                         tile_p: int = 512):
    """Fused pyramid lookup, lane-major layout (pixels on lanes).

    args:
      pyramid_t: list of (B, h_l, w_l, P) arrays from build_corr_pyramid_t.
      coords: (B, P, 2) float32 level-0 centers.
    returns:
      (B, P, L*(2r+1)^2) float32 (same ordering as corr_lookup_pallas).
    """
    B, _, _, P = pyramid_t[0].shape
    n = 2 * radius + 1
    L = len(pyramid_t)
    tp = _tile_p(P, tile_p)
    if tp < 128:
        raise ValueError(f"P={P} needs a >=128 power-of-two divisor")

    coords_t = coords.astype(jnp.float32).swapaxes(1, 2)   # (B, 2, P)
    grid = (B, P // tp)
    in_specs = [pl.BlockSpec((1, 2, tp), lambda b, p: (b, 0, p),
                             memory_space=pltpu.VMEM)]
    for lvl in range(L):
        h, w = pyramid_t[lvl].shape[1:3]
        in_specs.append(pl.BlockSpec(
            (1, h, w, tp), lambda b, p: (b, 0, 0, p),
            memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1, L * n * n, tp), lambda b, p: (b, 0, p),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel_lane_major, radius=radius, tile_p=tp)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, L * n * n, P), jnp.float32),
        interpret=_interpret(),
    )(coords_t, *pyramid_t)
    return out.swapaxes(1, 2)                                # (B, P, L*n*n)
