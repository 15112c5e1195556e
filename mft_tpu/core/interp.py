"""Bilinear gather (sampling) and scatter (splatting) in pure jnp.

These are the numeric contracts the rest of the framework builds on. The
sampling semantics exactly match ``torch.nn.functional.grid_sample`` with
``align_corners=True, padding_mode='zeros'`` expressed directly in *pixel*
coordinates (no [-1, 1] normalization round-trip — with align_corners=True the
denormalized coordinate IS the pixel coordinate, see reference
MFT/utils/interpolation.py:63-94).

The splatting semantics match the reference's scatter-add splat
(MFT/utils/interpolation.py:234-309), including its border behavior: query
coordinates are clamped into the grid before weights are computed, so a point
exactly on the right/bottom border contributes zero weight.

Pallas TPU kernels for the hot paths live in ``mft_tpu.kernels``; these jnp
versions are the reference implementations and the CPU/test fallbacks.
"""

import jax.numpy as jnp

from mft_tpu.core.coords import grid_coords


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample ``img`` at fractional pixel coordinates.

    args:
      img: (H, W, C) array.
      coords: (..., 2) array of (x, y) pixel coordinates.

    returns:
      (..., C) array. Out-of-bounds corner taps contribute zero (torch
      grid_sample 'zeros' padding); the bilinear weights are NOT renormalized.
    """
    H, W = img.shape[0], img.shape[1]
    x = coords[..., 0]
    y = coords[..., 1]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    def tap(xi, yi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(valid[..., None], v, 0.0) * w[..., None]

    return (
        tap(x0, y0, (1.0 - wx) * (1.0 - wy))
        + tap(x0 + 1, y0, wx * (1.0 - wy))
        + tap(x0, y0 + 1, (1.0 - wx) * wy)
        + tap(x0 + 1, y0 + 1, wx * wy)
    )


def bilinear_splat(data: jnp.ndarray, coords: jnp.ndarray, grid_shape,
                   point_weights: jnp.ndarray | None = None) -> tuple:
    """Bilinearly scatter-add ``data`` points onto a grid.

    args:
      data: (N, C) values to splat.
      coords: (N, 2) (x, y) destination coordinates.
      grid_shape: (H, W).
      point_weights: optional (N,) per-point weight multiplier (e.g. a 0/1
        mask). jit-friendly replacement for the reference's boolean-indexing
        point filtering (MFT/results.py:221-224).

    returns:
      grid: (H, W, C) accumulated weighted values.
      counts: (H, W, 1) accumulated weights.

    Border behavior matches reference MFT/utils/interpolation.py:234-309:
    coordinates are clamped into the grid AFTER computing the integer corners,
    and the weights are computed from the clamped values, so a point clamped
    onto the far border splats with zero total weight.
    """
    H, W = grid_shape
    C = data.shape[1]
    x = coords[:, 0]
    y = coords[:, 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    x1 = x0 + 1
    y0 = jnp.floor(y).astype(jnp.int32)
    y1 = y0 + 1

    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.clip(x0, 0, W - 1)
    x1 = jnp.clip(x1, 0, W - 1)
    y0 = jnp.clip(y0, 0, H - 1)
    y1 = jnp.clip(y1, 0, H - 1)

    x0f = x0.astype(data.dtype)
    x1f = x1.astype(data.dtype)
    y0f = y0.astype(data.dtype)
    y1f = y1.astype(data.dtype)
    w_a = (x1f - x) * (y1f - y)
    w_b = (x1f - x) * (y - y0f)
    w_c = (x - x0f) * (y1f - y)
    w_d = (x - x0f) * (y - y0f)

    if point_weights is not None:
        pw = point_weights.astype(data.dtype)
        w_a, w_b, w_c, w_d = w_a * pw, w_b * pw, w_c * pw, w_d * pw

    rows = jnp.concatenate([y0, y1, y0, y1])
    cols = jnp.concatenate([x0, x0, x1, x1])
    flat_idx = rows * W + cols
    weights = jnp.concatenate([w_a, w_b, w_c, w_d])[:, None]
    values = weights * jnp.concatenate([data, data, data, data], axis=0)

    grid_flat = jnp.zeros((H * W, C), dtype=data.dtype).at[flat_idx].add(values)
    counts_flat = jnp.zeros((H * W, 1), dtype=data.dtype).at[flat_idx].add(weights)
    return grid_flat.reshape(H, W, C), counts_flat.reshape(H, W, 1)


def warp_forward_image(img: jnp.ndarray, flow: jnp.ndarray, mask=None,
                       border=None) -> jnp.ndarray:
    """Forward-warp (splat) an image by a dense flow field.

    args:
      img: (H, W) or (H, W, C) values to warp.
      flow: (H, W, 2) flow field (dst = src + flow).
      mask: optional (H, W) bool; only True pixels are splatted.
      border: optional fill value for cells that received no data.

    returns:
      warped image, same shape as ``img``. Weight-0 cells are 0 (or ``border``).

    Reference parity: MFT/results.py:190-248 (warp_forward).
    """
    H, W = img.shape[0], img.shape[1]
    squeeze = img.ndim == 2
    vals = img.reshape(H * W, 1 if squeeze else -1).astype(jnp.float32)
    dst = (grid_coords(H, W) + flow).reshape(-1, 2)
    pw = mask.reshape(-1) if mask is not None else None
    accum, counts = bilinear_splat(vals, dst, (H, W), point_weights=pw)
    out = jnp.where(counts > 0, accum / jnp.where(counts > 0, counts, 1.0), 0.0)
    if border is not None:
        out = jnp.where(counts > 0, out, border)
    return out[..., 0] if squeeze else out.reshape(img.shape)
