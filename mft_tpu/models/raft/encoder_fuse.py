"""Fused fnet+cnet encoder: one grouped-conv stack for both feature nets.

The tracker encodes every frame with BOTH BasicEncoders (fnet: instance
norm, cnet: batch norm — reference extractor.py:118-195, raft.py:62-64) on
the same input image. Their architectures are identical, so each pair of
convs runs as ONE grouped conv (``feature_group_count=2``, kernels
concatenated along the output axis): the early layers' narrow channel
widths (64) fill the 128-lane registers exactly when doubled, and the
per-layer launch/relayout overheads halve. Norms stay per-slice (instance
for the fnet half, eval-mode batch for the cnet half). Math per group is
identical to the separate passes; parameters are read from the UNCHANGED
fnet/cnet trees (checkpoint layout untouched).

Used by the inference wrapper's feature-ring path (wrapper.padded_encode);
the flax module path (RAFT.encode) remains the reference implementation.
"""

import jax
import jax.numpy as jnp


def _gconv(x, kf, kc, bf, bc, stride=1, pad="VALID", dtype=jnp.float32):
    """One grouped conv applying fnet kernel to the first input half and
    cnet kernel to the second; outputs concatenated [fnet_out, cnet_out]."""
    kernel = jnp.concatenate([kf, kc], axis=-1).astype(dtype)
    bias = jnp.concatenate([bf, bc], axis=-1).astype(dtype)
    if pad != "VALID" and isinstance(pad, int):
        pad = [(pad, pad), (pad, pad)]
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride), padding=pad,
        feature_group_count=2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


def _instance_norm(x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(-3, -2), keepdims=True)
    var = jnp.var(x32, axis=(-3, -2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _batch_norm(x, scale, bias, mean, var, eps=1e-5):
    x32 = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps) * scale.astype(jnp.float32)
    return ((x32 - mean.astype(jnp.float32)) * inv
            + bias.astype(jnp.float32)).astype(x.dtype)


def _norm_pair(y, c_half, pc_norm, bs_norm):
    """fnet half: instance norm; cnet half: eval-mode batch norm."""
    yf = _instance_norm(y[..., :c_half])
    yc = _batch_norm(y[..., c_half:], pc_norm["scale"], pc_norm["bias"],
                     bs_norm["mean"], bs_norm["var"])
    return jnp.concatenate([yf, yc], axis=-1)


def _res_block(x, pf, pc, bs, c_in, c_out, stride, dtype):
    """Fused ResidualBlock pair (reference extractor.py:6-56)."""
    y = _gconv(x, pf["conv1"]["kernel"], pc["conv1"]["kernel"],
               pf["conv1"]["bias"], pc["conv1"]["bias"],
               stride=stride, pad=1, dtype=dtype)
    y = _norm_pair(y, c_out, pc["BatchNorm_0"], bs["BatchNorm_0"])
    y = jax.nn.relu(y)
    y = _gconv(y, pf["conv2"]["kernel"], pc["conv2"]["kernel"],
               pf["conv2"]["bias"], pc["conv2"]["bias"],
               stride=1, pad=1, dtype=dtype)
    y = _norm_pair(y, c_out, pc["BatchNorm_1"], bs["BatchNorm_1"])
    y = jax.nn.relu(y)
    if stride != 1:
        x = _gconv(x, pf["downsample_conv"]["kernel"],
                   pc["downsample_conv"]["kernel"],
                   pf["downsample_conv"]["bias"],
                   pc["downsample_conv"]["bias"],
                   stride=stride, pad="VALID", dtype=dtype)
        x = _norm_pair(x, c_out, pc["BatchNorm_2"], bs["BatchNorm_2"])
    return jax.nn.relu(x + y)


def fused_basic_encode(variables, image, dtype=jnp.float32,
                       normalise_input=True):
    """(B, H, W, 3) [0,255] image -> (fmap (.., 256), cnet (.., 256)).

    Equivalent to running BasicEncoder fnet (instance) and cnet (batch,
    eval) separately (RAFT.encode); one grouped-conv stack instead of two.
    """
    pf = variables["params"]["fnet"]
    pc = variables["params"]["cnet"]
    bs = variables["batch_stats"]["cnet"]

    if normalise_input:
        image = 2.0 * (image.astype(jnp.float32) / 255.0) - 1.0
    x = image.astype(dtype)
    x = jnp.concatenate([x, x], axis=-1)  # both groups see the image

    y = _gconv(x, pf["conv1"]["kernel"], pc["conv1"]["kernel"],
               pf["conv1"]["bias"], pc["conv1"]["bias"],
               stride=2, pad=3, dtype=dtype)
    y = _norm_pair(y, 64, pc["BatchNorm_0"], bs["BatchNorm_0"])
    y = jax.nn.relu(y)

    c = 64
    for i, (dim, stride) in enumerate([(64, 1), (96, 2), (128, 2)], start=1):
        for j, s in ((0, stride), (1, 1)):
            name = f"layer{i}_{j}"
            y = _res_block(y, pf[name], pc[name], bs[name], c, dim, s, dtype)
            c = dim

    out = _gconv(y, pf["conv2"]["kernel"], pc["conv2"]["kernel"],
                 pf["conv2"]["bias"], pc["conv2"]["bias"],
                 stride=1, pad="VALID", dtype=dtype)
    n_f = pf["conv2"]["kernel"].shape[-1]
    return out[..., :n_f], out[..., n_f:]
