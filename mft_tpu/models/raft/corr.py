"""All-pairs correlation volume + multi-scale windowed lookup.

TPU design: the all-pairs volume is ONE big MXU matmul over the stride-8
feature maps (B, H1*W1, C) x (B, C, H2*W2) — this is where the FLOPs belong.
The 4-level pyramid is an average-pool cascade over the target dims, and the
per-iteration lookup is a bilinear 4-tap gather of a (2r+1)^2 window around
each pixel's current correspondence, expressed as per-row ``take_along_axis``
gathers that XLA maps to native gather; a fused Pallas kernel lives in
``mft_tpu.kernels.corr_lookup`` for the hot path.

Parity notes (reference MFT/RAFT/core/corr.py):
- scaling by 1/sqrt(C) (corr.py:69);
- optional feature L2 normalization (corr.py:59-64);
- window ordering replicates the reference's transposed-offset quirk
  (corr.py:38-44): output channel k = i*(2r+1)+j samples at
  (x + (i - r), y + (j - r)) — the FIRST window axis offsets x.
- levels are concatenated last: 324 = 4 levels x 81 channels (corr.py:50);
- bilinear taps use zeros padding (utils.py:98-112 bilinear_sampler);
- torch avg_pool2d floor semantics (odd trailing row/col dropped).
"""

from functools import partial

import jax
import jax.numpy as jnp


def avg_pool2x2_nhwc(f: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 average pool over the H, W dims of (B, H, W, C) features, floor
    (VALID) semantics — torch avg_pool2d parity (reference corr.py:26-28).

    THE shared feature-pooling cascade step: every corr_method's pyramid
    builder (XLA einsum, pallas folded/lane-major, alt/win on-the-fly) must
    pool through this one function so the 'pooling features == pooling the
    volume' parity argument holds bit-identically across methods.
    """
    B, h, w, C = f.shape
    c = f[:, : h - h % 2, : w - w % 2]
    s = c.shape
    return c.reshape(B, s[1] // 2, 2, s[2] // 2, 2, C).mean(axis=(2, 4))


def build_corr_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                       num_levels: int = 4,
                       normalized_features: bool = False,
                       dtype=jnp.float32) -> list:
    """Build the all-pairs correlation pyramid.

    args:
      fmap1, fmap2: (B, H, W, C) stride-8 feature maps.
      dtype: storage/compute dtype of the volume (bf16 halves the HBM
        traffic of the dominant tensor; the matmul always accumulates f32).
    returns:
      list of ``num_levels`` arrays, level l: (B, H*W, H/2^l, W/2^l).
    """
    B, H, W, C = fmap1.shape
    f1 = fmap1.reshape(B, H * W, C).astype(dtype)
    f2 = fmap2.astype(dtype)
    if normalized_features:
        f1 = f1 / jnp.linalg.norm(f1.astype(jnp.float32), axis=-1,
                                  keepdims=True).astype(dtype)
        f2 = f2 / jnp.linalg.norm(f2.astype(jnp.float32), axis=-1,
                                  keepdims=True).astype(dtype)
    # Pooling the volume over target windows == dotting with avg-pooled
    # target FEATURES (the dot product is linear): instead of building the
    # level-0 volume and average-pooling ~600 MB of it per level (reference
    # corr.py:26-28), pool the tiny (H, W, C) feature map and run one small
    # MXU matmul per level. Bit-equivalent math (incl. the floor/VALID
    # odd-edge truncation), ~10x less HBM traffic.
    scale = 1.0 / jnp.sqrt(jnp.float32(C))
    pyramid = []
    h, w = H, W
    for lvl in range(num_levels):
        if lvl > 0:
            f2 = avg_pool2x2_nhwc(f2)
            h, w = f2.shape[1], f2.shape[2]
        corr_l = jnp.einsum("bpc,bqc->bpq", f1, f2.reshape(B, h * w, C),
                            preferred_element_type=jnp.float32)
        pyramid.append((corr_l * scale).astype(dtype).reshape(B, H * W, h, w))
    return pyramid


def build_corr_pyramid_mixed(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                             num_levels: int = 4,
                             normalized_features: bool = False,
                             dtype=jnp.float32, max_fold: int = None):
    """All-pairs pyramid with the big levels in the folded DENSE layout.

    The per-iteration Pallas lookup is read-DMA-bound on the padded
    (B, P, h, w) blocks (HBM lane-pads every w<128 row to 128 — ~880 MB per
    lookup at 512x512 vs 313 logical). A level whose rows pack evenly into
    128 lanes is kept as (B, P, h/fold, 128) with lane = u*w + x — and
    because the einsum's flat (B, P, h*w) output is already minor-dim dense,
    this is a FREE reshape (no relayout), unlike folding the padded array.
    Levels with fold > ``max_fold`` (tiny maps; degenerate per-parity dots)
    stay padded.

    returns: ("mixed", folded, fdims, padded) for corr_lookup —
      folded: leading levels as (B, P, h/fold, 128); fdims their (h, w);
      padded: the remaining levels as (B, P, h, w).
    """
    B, H, W, C = fmap1.shape
    f1 = fmap1.reshape(B, H * W, C).astype(dtype)
    f2 = fmap2.astype(dtype)
    if normalized_features:
        f1 = f1 / jnp.linalg.norm(f1.astype(jnp.float32), axis=-1,
                                  keepdims=True).astype(dtype)
        f2 = f2 / jnp.linalg.norm(f2.astype(jnp.float32), axis=-1,
                                  keepdims=True).astype(dtype)
    scale = 1.0 / jnp.sqrt(jnp.float32(C))
    if max_fold is None:
        max_fold = 4
    folded, fdims, padded = [], [], []
    h, w = H, W
    for lvl in range(num_levels):
        if lvl > 0:
            f2 = avg_pool2x2_nhwc(f2)
            h, w = f2.shape[1], f2.shape[2]
        corr_l = jnp.einsum("bpc,bqc->bpq", f1, f2.reshape(B, h * w, C),
                            preferred_element_type=jnp.float32)
        corr_l = (corr_l * scale).astype(dtype)
        fold = 128 // w if w and 128 % w == 0 else 0
        if (not padded and h * w > 128 and fold and h % fold == 0
                and fold <= max_fold):
            folded.append(corr_l.reshape(B, H * W, h // fold, 128))
            fdims.append((h, w))
        else:
            padded.append(corr_l.reshape(B, H * W, h, w))
    return ("mixed", folded, tuple(fdims), padded)


def _unfold_levels(folded, fdims):
    """Folded (B, P, h/fold, 128) levels -> plain (B, P, h, w) (free on CPU)."""
    out = []
    for arr, (h, w) in zip(folded, fdims):
        B, P = arr.shape[:2]
        out.append(arr.reshape(B, P, h, w))
    return out


def quantize_pyramid(pyramid):
    """Quantize a correlation pyramid to int8 with per-(pair, level) scales.

    The lookup kernel is DMA-bound on the materialized volume (the dominant
    HBM tensor at 313 MB logical / 880 MB padded per lookup at 512x512);
    int8 halves the bytes. Quantization error is bounded by max|corr|/254
    per value; the tent contraction itself stays exact (integer values are
    exact in bf16 — see _kernel_pixel_major_q).

    returns: (levels_int8, scales) — scales (B, L) f32, value = q * scale.
    """
    levels, scales = [], []
    for corr_l in pyramid:
        a = corr_l.astype(jnp.float32)
        mx = jnp.maximum(jnp.max(jnp.abs(a), axis=(1, 2, 3)), 1e-12)  # (B,)
        q = jnp.clip(jnp.round(a * (127.0 / mx)[:, None, None, None]),
                     -127.0, 127.0).astype(jnp.int8)
        levels.append(q)
        scales.append(mx / 127.0)
    return levels, jnp.stack(scales, axis=1)


def _lookup_level(corr_l: jnp.ndarray, coords: jnp.ndarray, radius: int):
    """Gather a bilinear (2r+1)^2 window from one pyramid level.

    args:
      corr_l: (B, P, h, w) correlation maps (one per source pixel).
      coords: (B, P, 2) (x, y) centers at THIS level's scale.
    returns:
      (B, P, (2r+1)^2) sampled correlations, window ordering k = i*(2r+1)+j
      <-> offset (dx=i-r, dy=j-r).
    """
    B, P, h, w = corr_l.shape
    n = 2 * radius + 1
    # offsets: first axis offsets x, second offsets y (reference quirk)
    off = jnp.arange(n, dtype=jnp.float32) - radius
    ox = jnp.repeat(off, n)   # (n*n,) i-major
    oy = jnp.tile(off, n)

    x = coords[..., 0:1] + ox  # (B, P, n*n)
    y = coords[..., 1:2] + oy
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    flat = corr_l.reshape(B, P, h * w)

    def tap(xi, yi, wgt):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        v = jnp.take_along_axis(flat, idx, axis=-1)
        return jnp.where(valid, v, 0.0) * wgt

    return (tap(x0, y0, (1 - wx) * (1 - wy))
            + tap(x0 + 1, y0, wx * (1 - wy))
            + tap(x0, y0 + 1, (1 - wx) * wy)
            + tap(x0 + 1, y0 + 1, wx * wy))


def _lookup_level_mxu(corr_l: jnp.ndarray, coords: jnp.ndarray, radius: int):
    """Gather-free window sampling: bilinear interpolation as tent matmuls.

    TPU has no fast hardware gather; instead we express the bilinear window
    sample as two small matrix contractions on the MXU. For each pixel p the
    weight of source column xx on window tap i is the bilinear "tent"
    ``max(0, 1 - |cx + (i - r) - xx|)`` — which is exactly grid_sample's
    zeros-padding bilinear kernel (out-of-image taps get weight 0). Then

        S[p, i, j] = sum_{yy,xx} Wy[p, j, yy] * corr[p, yy, xx] * Wx[p, i, xx]

    i.e. S = (Wy @ corr @ Wx^T) per pixel: two batched MXU matmuls instead of
    per-element gathers. Window ordering matches _lookup_level (i offsets x).
    """
    B, P, h, w = corr_l.shape
    n = 2 * radius + 1
    off = jnp.arange(n, dtype=jnp.float32) - radius

    gx = coords[..., 0:1] + off  # (B, P, n)
    gy = coords[..., 1:2] + off
    xx = jnp.arange(w, dtype=jnp.float32)
    yy = jnp.arange(h, dtype=jnp.float32)
    dt = corr_l.dtype
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(gx[..., None] - xx)).astype(dt)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(gy[..., None] - yy)).astype(dt)

    t = jnp.einsum("bpjy,bpyx->bpjx", wy, corr_l,
                   preferred_element_type=jnp.float32).astype(dt)
    s = jnp.einsum("bpix,bpjx->bpij", wx, t,
                   preferred_element_type=jnp.float32)        # (B, P, n, n)
    return s.reshape(B, P, n * n)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _corr_lookup_pallas_ad(pyramid, coords, radius, tile_p, ywin=0):
    """Pallas lookup with a differentiable backward.

    pallas_call has no VJP; the backward differentiates the mathematically
    identical tent-matmul formulation (:func:`_lookup_level_mxu`), so
    training (gradients into both feature maps through the volume, as in
    the reference's alt_cuda_corr backward, correlation_kernel.cu:122-256)
    works with the fast kernel on the forward pass.
    """
    from mft_tpu.ops.corr_lookup_pallas import corr_lookup_pallas
    return corr_lookup_pallas(list(pyramid), coords, radius, tile_p=tile_p,
                              ywin=ywin)


def _unpack_levels(packed, pdims):
    """Lane-packed (B, P, H0, sum_w) volume -> per-level (B, P, h, w) views."""
    levels, off = [], 0
    for (h, w) in pdims:
        levels.append(packed[:, :, :h, off:off + w])
        off += w
    return levels


def _dequant_levels(levels, scales):
    """int8 volume levels * per-(pair, level) scales -> float32 levels."""
    return [l.astype(jnp.float32) * scales[:, i, None, None, None]
            for i, l in enumerate(levels)]


def _mxu_all_levels(pyramid, coords, radius, out_dtype):
    outs = [
        _lookup_level_mxu(corr_l, coords / (2.0 ** lvl), radius)
        for lvl, corr_l in enumerate(pyramid)
    ]
    return jnp.concatenate(outs, axis=-1).astype(out_dtype)


def _corr_lookup_ad_fwd(pyramid, coords, radius, tile_p, ywin=0):
    out = _corr_lookup_pallas_ad(pyramid, coords, radius, tile_p, ywin)
    return out, (pyramid, coords)


def _corr_lookup_ad_bwd(radius, tile_p, ywin, res, g):
    pyramid, coords = res
    _, vjp = jax.vjp(
        lambda pyr, c: _mxu_all_levels(pyr, c, radius, pyr[0].dtype),
        pyramid, coords)
    return vjp(g)


_corr_lookup_pallas_ad.defvjp(_corr_lookup_ad_fwd, _corr_lookup_ad_bwd)


def corr_lookup(pyramid: list, coords: jnp.ndarray, radius: int = 4,
                method: str = "auto", out_dtype=None,
                tile_p: int = 0) -> jnp.ndarray:
    """Sample the correlation pyramid around per-pixel correspondences.

    args:
      pyramid: output of :func:`build_corr_pyramid`.
      coords: (B, H, W, 2) current correspondence coordinates (level-0 scale).
      method: 'pallas' (fused VMEM kernel, ops/corr_lookup_pallas.py),
        'mxu' (tent-weight matmuls in XLA), 'gather' (4-tap take_along_axis),
        or 'auto' (pallas on TPU, mxu elsewhere; falls back to mxu when the
        pixel count has no power-of-two tiling).
    returns:
      (B, H, W, num_levels*(2r+1)^2), levels concatenated last, in
      ``out_dtype``. The default (None) is the PYRAMID's dtype, so the
      contract does not vary with the dispatch path or backend: bf16 volumes
      yield bf16 samples (f32 accumulation inside), f32 volumes yield f32.
    """
    B, H, W, _ = coords.shape
    c = coords.reshape(B, H * W, 2)
    if isinstance(pyramid, tuple) and pyramid[0] == "mixed":
        # folded-dense big levels + padded small levels: the read-DMA-bound
        # lookup reads ~2x fewer HBM bytes with pixel-major-cheap compute
        # (ops/corr_lookup_pallas.py _kernel_mixed). CPU/tiny shapes unfold
        # (a free reshape) and use the exact mxu path.
        _, folded, fdims, padded = pyramid
        if out_dtype is None:
            out_dtype = (list(folded) + list(padded))[0].dtype
        from mft_tpu.ops.corr_lookup_pallas import (corr_lookup_pallas_mixed,
                                                    _tile_p)
        cap = tile_p or 512
        on_tpu = jax.default_backend() == "tpu" and _tile_p(H * W, cap) >= 8
        if folded and on_tpu:
            out = corr_lookup_pallas_mixed(folded, fdims, padded, c, radius,
                                           tile_p=cap)
        elif on_tpu:
            # nothing folded (any level width with 128 % w != 0, e.g. the
            # 368x768 train/eval resolution -> w=96): dispatch the all-padded
            # pyramid to the pixel-major Pallas kernel, which handles
            # arbitrary (h, w) — NOT the XLA mxu path (~6 GB HBM traffic per
            # GRU iteration at 512px, see module docstring)
            out = _corr_lookup_pallas_ad(tuple(padded), c, radius, cap, 0)
        else:
            out = _mxu_all_levels(_unfold_levels(folded, fdims) + list(padded),
                                  c, radius, out_dtype)
        return out.reshape(B, H, W, -1).astype(out_dtype)
    if isinstance(pyramid, tuple) and pyramid[0] == "packed":
        # lane-packed all-levels-in-one-map volume: the lookup contracts
        # every level with 2 batched dots per pixel tile instead of 2 per
        # LEVEL — the kernel is dot-issue-bound (ops/corr_lookup_pallas.py
        # pack_corr_pyramid). CPU/tiny shapes unpack and use the exact mxu
        # path, so semantics do not vary with the backend.
        _, packed, pdims = pyramid
        if out_dtype is None:
            out_dtype = packed.dtype
        from mft_tpu.ops.corr_lookup_pallas import (corr_lookup_pallas_packed,
                                                    _tile_p)
        cap = tile_p or 256
        if jax.default_backend() == "tpu" and _tile_p(H * W, cap) >= 8:
            out = corr_lookup_pallas_packed(packed, pdims, c, radius,
                                            tile_p=cap)
        else:
            out = _mxu_all_levels(_unpack_levels(packed, pdims), c, radius,
                                  out_dtype)
        return out.reshape(B, H, W, -1).astype(out_dtype)
    if isinstance(pyramid, tuple) and pyramid[0] == "packed_i8":
        # int8 lane-packed volume: the packed layout's 2-dots-per-tile
        # contraction at half the DMA bytes again. CPU/tiny shapes unpack,
        # dequantize the SAME int8 values and use the exact mxu path.
        _, packed, scales, pdims = pyramid
        if out_dtype is None:
            out_dtype = jnp.bfloat16
        from mft_tpu.ops.corr_lookup_pallas import (
            corr_lookup_pallas_packed_i8, _tile_p)
        cap = tile_p or 256
        if jax.default_backend() == "tpu" and _tile_p(H * W, cap) >= 8:
            out = corr_lookup_pallas_packed_i8(packed, scales, pdims, c,
                                               radius, tile_p=cap)
        else:
            deq = _dequant_levels(_unpack_levels(packed, pdims), scales)
            out = _mxu_all_levels(deq, c, radius, jnp.float32)
        return out.reshape(B, H, W, -1).astype(out_dtype)
    if isinstance(pyramid, tuple) and pyramid[0] == "fold":
        from mft_tpu.ops.corr_lookup_pallas import corr_lookup_pallas_folded
        _, levels, ldims = pyramid
        if out_dtype is None:
            out_dtype = levels[0].dtype
        out = corr_lookup_pallas_folded(levels, ldims, c, radius)
        return out.reshape(B, H, W, -1).astype(out_dtype)
    if isinstance(pyramid, tuple) and pyramid[0] == "i8":
        # int8-quantized volume: half the (DMA-bound) lookup bytes; the
        # non-TPU path dequantizes the SAME int8 values through the exact
        # mxu formulation, so semantics do not vary with the backend
        _, levels, scales = pyramid
        if out_dtype is None:
            out_dtype = jnp.bfloat16
        from mft_tpu.ops.corr_lookup_pallas import corr_lookup_pallas_q, _tile_p
        if jax.default_backend() == "tpu" and _tile_p(H * W, 128) >= 8:
            out = corr_lookup_pallas_q(levels, scales, c, radius)
        else:
            out = _mxu_all_levels(_dequant_levels(levels, scales), c, radius,
                                  jnp.float32)
        return out.reshape(B, H, W, -1).astype(out_dtype)
    if isinstance(pyramid, tuple) and pyramid[0] == "t":
        from mft_tpu.ops.corr_lookup_pallas import corr_lookup_pallas_t, _tile_p
        pyr_t = pyramid[1]
        if out_dtype is None:
            out_dtype = pyr_t[0].dtype
        if _tile_p(H * W, 256) >= 128 and jax.default_backend() == "tpu":
            out = corr_lookup_pallas_t(pyr_t, c, radius, tile_p=256)
        else:
            # small shapes (model-init probes, tests) / CPU: transpose back
            # to pixel-major and use the exact mxu tent-matmul path
            out = _mxu_all_levels([jnp.moveaxis(l, 3, 1) for l in pyr_t],
                                  c, radius, out_dtype)
        return out.reshape(B, H, W, -1).astype(out_dtype)
    if isinstance(pyramid, tuple) and pyramid[0] == "win":
        from mft_tpu.ops.alt_corr_pallas import corr_lookup_win
        _, f1_flat, f2_slabs = pyramid
        if out_dtype is None:
            out_dtype = f1_flat.dtype
        if H * W >= 1024 or jax.default_backend() != "tpu":
            out = corr_lookup_win(f1_flat, f2_slabs, c, radius)
        else:
            # tiny init-probe shapes: reconstruct the volume and use mxu
            scale = 1.0 / jnp.sqrt(jnp.float32(f1_flat.shape[-1]))
            vol = []
            for packed, (h, w, fold) in f2_slabs:
                Bp, hp, C, fw = packed.shape
                f2 = (packed.reshape(Bp, hp, C, fold, w)
                      .transpose(0, 1, 3, 4, 2).reshape(Bp, h * w, C))
                vol.append((jnp.einsum(
                    "bpc,bqc->bpq", f1_flat.astype(jnp.float32),
                    f2.astype(jnp.float32)) * scale).reshape(B, H * W, h, w))
            out = _mxu_all_levels(vol, c, radius, jnp.float32)
        return out.reshape(B, H, W, -1).astype(out_dtype)
    if isinstance(pyramid, tuple) and pyramid[0] == "alt":
        from mft_tpu.ops.alt_corr_pallas import corr_lookup_alt
        _, f1_flat, f2_pyr = pyramid
        if out_dtype is None:
            out_dtype = f1_flat.dtype
        if H * W >= 1024 or jax.default_backend() != "tpu":
            out = corr_lookup_alt(f1_flat, f2_pyr, c, radius)
        else:
            # tiny shapes (model-init probes) trip a Mosaic lowering bug in
            # the alt kernel's small dot; materialize the mini-volume from
            # the features and use the exact mxu path instead
            scale = 1.0 / jnp.sqrt(jnp.float32(f1_flat.shape[-1]))
            vol = [
                (jnp.einsum("bpc,bqc->bpq", f1_flat.astype(jnp.float32),
                            f2.astype(jnp.float32)) * scale
                 ).reshape(B, H * W, h, w)
                for f2, (h, w) in f2_pyr
            ]
            out = _mxu_all_levels(vol, c, radius, jnp.float32)
        return out.reshape(B, H, W, -1).astype(out_dtype)
    if out_dtype is None:
        out_dtype = pyramid[0].dtype
    if method in ("auto", "pallas"):
        from mft_tpu.ops.corr_lookup_pallas import corr_lookup_pallas, _tile_p
        use_pallas = method == "pallas" or jax.default_backend() == "tpu"
        # the kernel is per-tile-overhead-bound, not DMA-bound: bigger pixel
        # tiles amortize the fixed per-tile work (tent builds, dot issues,
        # output slice writes). 512 needs the raised scoped-VMEM limit set
        # in corr_lookup_pallas (isolated sweep: 128/256/512/1024 ->
        # 2.16/1.62/1.48/1.90 ms); f32 blocks are 2x the bytes -> 256.
        cap = tile_p or (512 if pyramid[0].dtype == jnp.bfloat16 else 256)
        if use_pallas and _tile_p(H * W, cap) >= 8:
            # ywin row-windowing measured slightly WORSE in the full graph
            # (15.95 vs 16.64 FPS) — the kernel is not contraction-bound;
            # keep it available but off
            out = _corr_lookup_pallas_ad(tuple(pyramid), c, radius, cap, 0)
            return out.reshape(B, H, W, -1).astype(out_dtype)
        method = "mxu"
    lookup = _lookup_level_mxu if method == "mxu" else _lookup_level
    out = [
        lookup(corr_l, c / (2.0 ** lvl), radius)
        for lvl, corr_l in enumerate(pyramid)
    ]
    return jnp.concatenate(out, axis=-1).reshape(B, H, W, -1).astype(out_dtype)


def corr_lookup_fused_conv(pyramid, coords, kernel, bias, radius: int = 4,
                           method: str = "auto", tile_p: int = 0):
    """Lookup fused with the motion encoder's convc1: relu(lookup @ Wc + b).

    Inference-only epilogue fusion (ops/corr_lookup_pallas.py
    corr_lookup_pallas_fused): the (2r+1)^2*L window samples stay in VMEM
    and contract against the (1,1,C,F) conv kernel in the same Pallas call,
    skipping the HBM round-trip of the C-channel lookup output. Non-TPU /
    untileable shapes fall back to the exact unfused composition, so the
    function's semantics do not vary with the backend.

    args:
      pyramid: build_corr_pyramid output (plain list layout only).
      coords: (B, H, W, 2) level-0 correspondence coordinates.
      kernel: (1, 1, C, F) convc1 kernel; bias: (F,).
    returns: (B, H, W, F) in the pyramid's dtype.
    """
    B, H, W, _ = coords.shape
    C, F = kernel.shape[2], kernel.shape[3]
    out_dtype = pyramid[0].dtype
    if method in ("auto", "pallas"):
        from mft_tpu.ops.corr_lookup_pallas import (corr_lookup_pallas_fused,
                                                    _tile_p)
        cap = tile_p or (512 if out_dtype == jnp.bfloat16 else 256)
        if jax.default_backend() == "tpu" and _tile_p(H * W, cap) >= 8:
            out = corr_lookup_pallas_fused(
                list(pyramid), coords.reshape(B, H * W, 2),
                kernel.reshape(C, F), bias, radius, tile_p=cap)
            return out.reshape(B, H, W, F)
    samples = corr_lookup(pyramid, coords, radius, method=method,
                          tile_p=tile_p)
    acc = jnp.einsum("bhwc,cf->bhwf", samples.astype(out_dtype),
                     kernel.reshape(C, F).astype(out_dtype),
                     preferred_element_type=jnp.float32)
    acc = acc + bias.astype(jnp.float32)
    return jnp.maximum(acc, 0.0).astype(out_dtype)
