"""Flow/field upsampling: convex (mask-weighted) 8x upsampling + bilinear 8x.

Parity notes:
- convex_upsample replicates reference raft.py:83-94 exactly: the 576-channel
  mask is interpreted as (9, 8, 8) [k-major], softmaxed over the 9
  neighborhood taps, and combined with the 3x3 zero-padded neighborhood of
  mult_coef*field. unfold ordering k = (ky*3 + kx), ky/kx in {-1,0,1}.
- upsample8 is bilinear resize with align_corners=True (utils.py:121-127).
"""

import jax
import jax.numpy as jnp


def convex_upsample(field: jnp.ndarray, mask: jnp.ndarray,
                    mult_coef: float = 8.0) -> jnp.ndarray:
    """Convex-combination 8x upsampling.

    args:
      field: (B, h, w, C) coarse field (C=2 for flow, C=1/2 for OU maps).
      mask: (B, h, w, 576) raw mask logits from the update block.
      mult_coef: scale applied to the field before upsampling (8.0 for flow —
        pixel units change — 1.0 for occlusion, 8.0 for uncertainty).
    returns:
      (B, 8h, 8w, C).
    """
    B, h, w, C = field.shape
    m = mask.reshape(B, h, w, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)

    f = mult_coef * field
    fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 9 shifted views, k = ky*3 + kx (row-major over the 3x3 window)
    taps = jnp.stack([
        fp[:, ky:ky + h, kx:kx + w, :]
        for ky in range(3) for kx in range(3)
    ], axis=3)  # (B, h, w, 9, C)

    # out[b, 8y+dy, 8x+dx, c] = sum_k m[b,y,x,k,dy,dx] * taps[b,y,x,k,c]
    up = jnp.einsum("bhwkde,bhwkc->bhdwec", m, taps)  # (B,h,8,w,8,C)
    return up.reshape(B, 8 * h, 8 * w, C)


def resize_bilinear_align_corners(img: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Bilinear resize matching torch F.interpolate(align_corners=True).

    args:
      img: (B, H, W, C); out_hw: (H_out, W_out).
    """
    B, H, W, C = img.shape
    Ho, Wo = out_hw
    ys = jnp.linspace(0.0, H - 1.0, Ho)
    xs = jnp.linspace(0.0, W - 1.0, Wo)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    a = img[:, y0][:, :, x0]
    b = img[:, y0][:, :, x1]
    c = img[:, y1][:, :, x0]
    d = img[:, y1][:, :, x1]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx)


def upsample8(maps: jnp.ndarray) -> jnp.ndarray:
    """8x bilinear upsampling (no value scaling). Reference utils.py:125-127."""
    B, h, w, C = maps.shape
    return resize_bilinear_align_corners(maps, (8 * h, 8 * w))


def upflow8(flow: jnp.ndarray) -> jnp.ndarray:
    """8x bilinear flow upsampling with 8x value scaling. utils.py:121-123."""
    return 8.0 * upsample8(flow)


def downsample_flow8(flow: jnp.ndarray) -> jnp.ndarray:
    """Downsample (B, H, W, 2) flow to 1/8 scale and 1/8 magnitude.

    Reference parity: MFT/raft.py:98-101 (downsample_flow_8).
    """
    B, H, W, C = flow.shape
    return resize_bilinear_align_corners(flow, (H // 8, W // 8)) / 8.0
