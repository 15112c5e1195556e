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


def convex_upsample_multi(fields, mask, mult_coefs):
    """Convex-combination 8x upsampling of several fields sharing one mask.

    The mask softmax and the 9-tap combination are done ONCE for the
    channel-concatenated fields — the per-field einsum formulation made XLA
    materialize transposed copies of the 67 MB mask tensor per call
    (~4.8 GB of HBM traffic for the RAFT-OU triple; this is ~0.3 GB).

    args:
      fields: list of (B, h, w, C_i) coarse fields.
      mask: (B, h, w, 576) raw mask logits ((9, 8, 8) k-major layout).
      mult_coefs: per-field scale (8.0 for flow, 1.0 for occlusion, ...).
    returns:
      list of (B, 8h, 8w, C_i).
    """
    B, h, w, _ = fields[0].shape
    f = jnp.concatenate([c * x for x, c in zip(fields, mult_coefs)], axis=-1)
    C = f.shape[-1]

    # softmax over the 9 taps with the 64 (dy, dx) subpixels flat on the
    # minor axis — same math as reshape(B,h,w,9,8,8)
    m = jax.nn.softmax(mask.reshape(B, h, w, 9, 64), axis=3)

    fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 9 shifted views, k = ky*3 + kx (row-major over the 3x3 window)
    taps = jnp.stack([
        fp[:, ky:ky + h, kx:kx + w, :]
        for ky in range(3) for kx in range(3)
    ], axis=3)  # (B, h, w, 9, C)

    # out[b, 8y+dy, 8x+dx, c] = sum_k m[b,y,x,k,(dy,dx)] * taps[b,y,x,k,c].
    # contract k with (b,h,w) as contiguous batch dims, THEN do the pixel
    # shuffle as one explicit transpose — the interleaved-output einsum
    # ("...->bhdwec") made XLA materialize scattered 64x copies (~2.5x
    # slower end to end on TPU)
    up = jnp.einsum("bhwkd,bhwkc->bhwdc", m, taps)       # (B, h, w, 64, C)
    up = up.reshape(B, h, w, 8, 8, C).transpose(0, 1, 3, 2, 4, 5)
    up = up.reshape(B, 8 * h, 8 * w, C)
    outs = []
    off = 0
    for x in fields:
        ci = x.shape[-1]
        outs.append(up[..., off:off + ci])
        off += ci
    return outs


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
    return convex_upsample_multi([field], mask, [mult_coef])[0]


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


def forward_interpolate(flow):
    """Advect a flow field forward for next-frame warm starting.

    Each pixel's flow vector is carried to its target location and the
    scattered samples are nearest-neighbor interpolated back onto the grid
    (reference MFT/RAFT/core/utils/utils.py:67-95). Host-side numpy/scipy —
    used between frames (TC warm-start mode), not inside jit.

    args: flow (H, W, 2) array. returns (H, W, 2) float32 numpy array.
    """
    import numpy as np
    from scipy import interpolate

    flow = np.asarray(flow, np.float32)
    H, W = flow.shape[:2]
    x0, y0 = np.meshgrid(np.arange(W), np.arange(H))
    dx, dy = flow[..., 0].ravel(), flow[..., 1].ravel()
    x1 = x0.ravel() + dx
    y1 = y0.ravel() + dy
    valid = (x1 > 0) & (x1 < W) & (y1 > 0) & (y1 < H)
    if not valid.any():
        return np.zeros_like(flow)
    pts = (x1[valid], y1[valid])
    fx = interpolate.griddata(pts, dx[valid], (x0, y0), method="nearest",
                              fill_value=0)
    fy = interpolate.griddata(pts, dy[valid], (x0, y0), method="nearest",
                              fill_value=0)
    return np.stack([fx, fy], axis=-1).astype(np.float32)


class InputCropAndResize:
    """Scale-crop preprocessing alternative to padding (reference
    MFT/RAFT/core/utils/utils.py:26-63), NHWC jnp version.

    ``crop`` center-crops inputs to ``scale`` of their size (remembering
    shapes), ``upsize``/``downsize`` resize with align_corners=True, and
    ``downsize_flow`` additionally rescales the flow VALUES by the size
    ratio.
    """

    def __init__(self, scale: float):
        self.scale = scale

    def crop(self, *inputs):
        outs = []
        for x in inputs:
            N, H, W, C = x.shape
            self.orig_hw = (H, W)
            nh, nw = int(H * self.scale), int(W * self.scale)
            self.new_hw = (nh, nw)
            sh = int((H - nh) * self.scale)
            sw = int((W - nw) * self.scale)
            outs.append(x[:, sh:sh + nh, sw:sw + nw, :])
        return outs

    def _resize(self, x, hw):
        return resize_bilinear_align_corners(x, hw)

    def upsize(self, *inputs):
        return [self._resize(x, self.orig_hw) for x in inputs]

    def downsize(self, *inputs):
        return [self._resize(x, self.new_hw) for x in inputs]

    def downsize_flow(self, *inputs):
        outs = []
        for x in inputs:
            H, W = x.shape[1:3]
            ratio_h = self.new_hw[0] / H
            ratio_w = self.new_hw[1] / W
            f = self._resize(x, self.new_hw)
            outs.append(jnp.stack([f[..., 0] * ratio_w,
                                   f[..., 1] * ratio_h], axis=-1))
        return outs
