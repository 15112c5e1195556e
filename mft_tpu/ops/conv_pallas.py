"""Pallas TPU kernel: fused small-spatial NHWC conv with a VMEM accumulator.

The RAFT update block (reference MFT/RAFT/core/update.py:96-238) is a chain
of small-spatial convs at (B=7, 64, 64, C) — ~1.84 TFLOP/frame over 12
iterations. XLA lowers each conv either through its conv emitter (~20%
slower than shifted matmuls here) or, with the shifted-matmul rewrite
(update.py conv_apply), as kh*kw separate GEMMs whose float32 partial maps
cannot fuse across dots and roundtrip HBM: for a 3x3 256->192 conv that is
~9 x 22 MB of f32 partial writes + reads per conv per iteration. The
measured result is ~40% of bf16 MXU peak (docs/PERFORMANCE.md).

This kernel runs one whole (H, W) image per grid step with everything in
VMEM: the input image is copied once into a zero-padded VMEM scratch, the
kh*kw shifted views are contracted on the MXU into a single float32 VMEM
accumulator, and the bias + optional activation epilogue is applied before
the single bf16 output write. HBM traffic is exactly one read of x and one
write of y; no partial map ever leaves VMEM.

Math matches conv_apply(matmul=True) (same shifted-dot decomposition, f32
accumulation per dot, bias in f32, one final cast); accumulation order
differs from the XLA conv at float rounding level only.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_ACTS = {
    None: lambda x: x,
    "relu": lambda x: jnp.maximum(x, 0.0),
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
}


def _conv_kernel(x_ref, k_ref, b_ref, out_ref, xpad_ref, *, kh: int, kw: int,
                 ph: int, pw: int, act):
    H, W = x_ref.shape[1], x_ref.shape[2]
    cin = x_ref.shape[3]
    cout = out_ref.shape[3]
    # zero-padded copy of the image (one VPU clear + one copy)
    xpad_ref[...] = jnp.zeros_like(xpad_ref)
    xpad_ref[ph:ph + H, pw:pw + W, :] = x_ref[0]
    acc = jnp.zeros((H * W, cout), jnp.float32)
    for ky in range(kh):
        for kx in range(kw):
            view = xpad_ref[ky:ky + H, kx:kx + W, :].reshape(H * W, cin)
            acc = acc + jnp.dot(view, k_ref[ky, kx],
                                preferred_element_type=jnp.float32)
    acc = acc + b_ref[...].astype(jnp.float32)
    out_ref[0] = _ACTS[act](acc).reshape(H, W, cout).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("padding", "act", "out_dtype"))
def conv_pallas(x, kernel, bias, padding, act=None, out_dtype=None):
    """Fused NHWC conv: one whole image per grid step, VMEM f32 accumulator.

    x: (B, H, W, Cin); kernel: (kh, kw, Cin, Cout); bias: (Cout,).
    padding: ((top, bottom), (left, right)) explicit pads (static).
    act: None | 'relu' | 'sigmoid' | 'tanh' fused into the epilogue.

    Shapes must satisfy pad == kernel-1 (SAME-size output); use
    conv_fits_pallas() before calling.
    """
    B, H, W, cin = x.shape
    kh, kw, _, cout = kernel.shape
    (pt, pb), (plf, prt) = padding
    if pt + pb != kh - 1 or plf + prt != kw - 1:
        raise ValueError(f"padding {padding} is not SAME-size for {kh}x{kw}")
    if out_dtype is None:
        out_dtype = x.dtype
    k = kernel.astype(x.dtype)
    b = bias.reshape(1, cout).astype(jnp.float32)
    kern = functools.partial(_conv_kernel, kh=kh, kw=kw, ph=pt, pw=plf,
                             act=act)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, kw, cin, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((H + kh - 1, W + kw - 1, cin), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, k, b)


def conv_fits_pallas(x_shape, k_shape, padding) -> bool:
    """True iff conv_pallas handles this conv within a safe VMEM budget."""
    B, H, W, cin = x_shape
    kh, kw, _, cout = k_shape
    (pt, pb), (plf, prt) = padding
    if pt + pb != kh - 1 or plf + prt != kw - 1:
        return False
    if W % 128 and W != 64:  # lane-tiled widths only (production is 64/128)
        return False
    bytes_x = (H + kh - 1) * (W + kw - 1) * cin * 2 * 2   # x block + pad copy
    bytes_k = kh * kw * cin * cout * 2
    bytes_acc = H * W * cout * 4
    bytes_out = H * W * cout * 2
    # double-buffered blocks: stay well under the 100 MB scoped limit
    return bytes_x + bytes_k + bytes_acc + bytes_out < 60 * 1024 * 1024
