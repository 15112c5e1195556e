"""Update blocks: motion encoder, separable ConvGRU, flow/mask/OU heads.

Parity notes (reference MFT/RAFT/core/update.py):
- BasicMotionEncoder (update.py:142-160): corr -> 256(1x1) -> 192(3x3),
  flow -> 128(7x7) -> 64(3x3), concat -> 126(3x3), concat raw flow -> 128ch.
- SepConvGRU (update.py:96-123): two GRU passes with (1,5) then (5,1) convs.
- BasicUpdateBlock (update.py:216-238): GRU input = concat(context 128,
  motion 128); flow head 128->256->2; mask head 128->256->576 scaled by 0.25.
- OcclusionAndUncertaintyBlock (update.py:177-214): input concat
  [net, inp, corr, flow, delta_flow, motion_features] = 712 ch; separate
  'simple' (2-conv) or 'morelayers' (4-conv) occlusion (2ch) and uncertainty
  (1ch) heads with hidden width 128.
"""

import jax
import jax.numpy as jnp
import flax.linen as nn

from mft_tpu.models.raft.layers import _pad


def conv_apply(x, kernel, bias, padding, dtype, matmul):
    """Apply a conv given raw (kernel, bias) — lax conv, shifted matmuls,
    or one im2col GEMM.

    matmul=True executes the k_h x k_w conv as k_h*k_w shifted
    (B,H,W,Cin) x (Cin,Cout) MXU einsums accumulated in float32 (bias added
    in f32, one final cast) — measured ~20% faster than the XLA conv
    lowering for this model's small-spatial NHWC shapes on the v5e. Same
    math; accumulation order differs from the conv at float rounding level.

    matmul='im2col' concatenates the k_h*k_w shifted views on the channel
    axis and contracts them with the (kh*kw*Cin, Cout) reshaped kernel in
    ONE einsum. A/B-measured 5 FPS SLOWER than shifted matmuls as a
    blanket policy (materializing the kh*kw-times-wider cols array costs
    more HBM traffic than the f32 partial-map roundtrips it avoids).

    matmul='hybrid' picks im2col only for tiny-Cin convs (Cin <= 8 —
    e.g. the 7x7 flow conv, whose shifted path is 49 GEMMs with K=2:
    pure per-op issue overhead, while its cols array is just 98 channels)
    and shifted matmuls everywhere else.

    matmul='pallas' runs the conv as ONE fused Pallas kernel with a VMEM
    f32 accumulator (ops/conv_pallas.py — no partial-map HBM roundtrips at
    all); tiny-Cin convs route to im2col and non-fitting shapes to shifted
    matmuls. Inference-only (the kernel has no VJP).
    """
    kh, kw = kernel.shape[:2]
    x = x.astype(dtype)
    k = kernel.astype(dtype)
    if matmul == "pallas":
        from mft_tpu.ops.conv_pallas import conv_fits_pallas, conv_pallas
        pads = ([(0, 0), (0, 0)] if padding == "VALID"
                else [tuple(p) for p in padding])
        if x.shape[-1] <= 8 and kh * kw > 1:
            matmul = "im2col"
        elif conv_fits_pallas(x.shape, k.shape, pads):
            return conv_pallas(x, k, bias, (tuple(pads[0]), tuple(pads[1])))
        else:
            matmul = True
    if matmul == "hybrid":
        matmul = "im2col" if x.shape[-1] <= 8 and kh * kw > 1 else True
    if not matmul:
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(dtype)
    pads = [(0, 0), (0, 0)] if padding == "VALID" else list(padding)
    xpad = jnp.pad(x, ((0, 0), tuple(pads[0]), tuple(pads[1]), (0, 0)))
    H = xpad.shape[1] - kh + 1
    W = xpad.shape[2] - kw + 1
    if matmul == "im2col":
        cols = jnp.concatenate(
            [xpad[:, ky:ky + H, kx:kx + W]
             for ky in range(kh) for kx in range(kw)], axis=-1)
        acc = jnp.einsum("bhwc,co->bhwo", cols,
                         k.reshape(-1, k.shape[-1]),
                         preferred_element_type=jnp.float32)
        return (acc + bias.astype(jnp.float32)).astype(dtype)
    acc = None
    for ky in range(kh):
        for kx in range(kw):
            part = jnp.einsum("bhwc,co->bhwo",
                              xpad[:, ky:ky + H, kx:kx + W], k[ky, kx],
                              preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    return (acc + bias.astype(jnp.float32)).astype(dtype)


class MXConv(nn.Module):
    """nn.Conv-compatible conv with an optional shifted-matmul apply path.

    Param names/shapes/init match nn.Conv ({kernel (kh,kw,cin,cout), bias}),
    so checkpoint conversion and existing trees are untouched; only the
    apply-time lowering changes when ``matmul`` (static) is True.
    """
    features: int
    kernel_size: tuple
    padding: object = "VALID"
    dtype: object = jnp.float32
    matmul: object = False  # False | True (shifted matmuls) | "im2col"

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        return conv_apply(x, kernel, bias, self.padding, self.dtype,
                          self.matmul)


class FlowHead(nn.Module):
    """3x3 conv -> relu -> 3x3 conv to ``out_dim``. Reference update.py:6-14."""
    hidden_dim: int = 256
    out_dim: int = 2
    dtype: object = jnp.float32
    matmul: object = False  # False | True (shifted matmuls) | "im2col"

    @nn.compact
    def __call__(self, x):
        x = MXConv(self.hidden_dim, (3, 3), padding=_pad(3), dtype=self.dtype,
                   matmul=self.matmul, name="conv1")(x)
        x = nn.relu(x)
        return MXConv(self.out_dim, (3, 3), padding=_pad(3), dtype=self.dtype,
                      matmul=self.matmul, name="conv2")(x)


class SimpleHead(nn.Module):
    """'simple' OU head variant: conv-relu-conv. Reference update.py:17-75."""
    hidden_dim: int
    out_dim: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.hidden_dim, (3, 3), padding=_pad(3), dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(x)
        return nn.Conv(self.out_dim, (3, 3), padding=_pad(3), dtype=self.dtype,
                       name="conv2")(x)


class MoreLayersHead(nn.Module):
    """'morelayers' OU head variant: 4 convs. Reference update.py:27-36."""
    hidden_dim: int
    out_dim: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = nn.Conv(self.hidden_dim, (3, 3), padding=_pad(3),
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
        return nn.Conv(self.out_dim, (3, 3), padding=_pad(3), dtype=self.dtype,
                       name="conv3")(x)


class _ConvParams(nn.Module):
    """Parameter-only stand-in for MXConv: declares the same {kernel, bias}
    tree (so checkpoints are interchangeable) and returns them raw, letting
    the caller choose the apply path — conv_apply or a fused Pallas epilogue
    (corr.py corr_lookup_fused_conv)."""
    features: int
    kernel_size: tuple
    in_features: int

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        return kernel, bias


class BasicMotionEncoder(nn.Module):
    """Encode (corr window sample, flow) into 128-ch motion features.

    ``corr`` is either the (B, H, W, C) lookup output, or — on the fused
    inference path — a callable ``corr(kernel, bias) -> (B, H, W, 256)``
    that computes relu(convc1(lookup)) inside the lookup kernel itself;
    convc1's parameters are declared here either way (same tree).
    """
    corr_channels: int = 324  # 4 levels * 9^2
    dtype: object = jnp.float32
    matmul: object = False  # False | True (shifted matmuls) | "im2col"

    @nn.compact
    def __call__(self, flow, corr):
        flow = flow.astype(self.dtype)
        mm = self.matmul
        ck, cb = _ConvParams(256, (1, 1), self.corr_channels,
                             name="convc1")()
        if callable(corr):
            cor = corr(ck, cb).astype(self.dtype)
        else:
            corr = corr.astype(self.dtype)
            cor = nn.relu(conv_apply(corr, ck, cb, "VALID", self.dtype, mm))
        cor = nn.relu(MXConv(192, (3, 3), padding=_pad(3), dtype=self.dtype,
                             matmul=mm, name="convc2")(cor))
        # convf1 stays a conv: 7x7 on 2 input channels — 49 shifted matmuls
        # of a tiny contraction would be pure overhead
        flo = nn.relu(nn.Conv(128, (7, 7), padding=_pad(7), dtype=self.dtype,
                              name="convf1")(flow))
        flo = nn.relu(MXConv(64, (3, 3), padding=_pad(3), dtype=self.dtype,
                             matmul=mm, name="convf2")(flo))
        out = nn.relu(MXConv(126, (3, 3), padding=_pad(3), dtype=self.dtype,
                             matmul=mm, name="conv")(
                                 jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)  # 128 ch


class SepConvGRU(nn.Module):
    """Separable ConvGRU: horizontal (1,5) pass then vertical (5,1) pass.

    The z (update) and r (reset) convs share their input; they are executed
    as ONE fused conv on the MXU by concatenating their kernels along the
    output axis at apply time (parameter layout — and therefore checkpoint
    compatibility — is unchanged; the concat is a few KB and fuses into the
    conv's weight load). Math is bit-identical to two separate convs.
    """
    hidden_dim: int = 128
    dtype: object = jnp.float32
    matmul: object = False  # False | True (shifted matmuls) | "im2col"

    @nn.compact
    def __call__(self, h, x):
        hd = self.hidden_dim
        for suffix, ksize, pad in (("1", (1, 5), [(0, 0), (2, 2)]),
                                   ("2", (5, 1), [(2, 2), (0, 0)])):
            hx = jnp.concatenate([h, x], axis=-1)
            convz = nn.Conv(hd, ksize, padding=pad, dtype=self.dtype,
                            name=f"convz{suffix}")
            convr = nn.Conv(hd, ksize, padding=pad, dtype=self.dtype,
                            name=f"convr{suffix}")
            zr = _fused_conv_pair(self, convz, convr, hx, ksize, pad,
                                  matmul=self.matmul)
            z = nn.sigmoid(zr[..., :hd])
            r = nn.sigmoid(zr[..., hd:])
            q = nn.tanh(MXConv(hd, ksize, padding=pad, dtype=self.dtype,
                               matmul=self.matmul, name=f"convq{suffix}")(
                jnp.concatenate([r * h, x], axis=-1)))
            h = (1.0 - z) * h + z * q
        return h


def _fused_conv_pair(parent, conv_a, conv_b, x, ksize, pad, matmul=False):
    """Apply two same-shape convs sharing one input as ONE fused conv.

    During init both children run normally, so parameters keep their
    reference-compatible names/shapes (checkpoint conversion unchanged). At
    apply time a single lax conv runs with the kernels concatenated along
    the output-channel axis — bit-identical outputs, one MXU pass instead of
    two. Output channels: [conv_a out, conv_b out].

    Caveat: reading raw params via ``parent.scope.get_variable`` bypasses
    ``nn.Conv.__call__``, so Conv-level features (precision args, param-dtype
    promotion, partitioning metadata) and module transforms (nn.scan/remat
    wrapping the parent) would NOT see this apply path. Pinned by the
    test_update_fusion parity tests; revisit if these blocks are ever wrapped
    in a lifted transform.
    """
    if parent.is_initializing():
        return jnp.concatenate([conv_a(x), conv_b(x)], axis=-1)
    pa = parent.scope.get_variable("params", conv_a.name)
    pb = parent.scope.get_variable("params", conv_b.name)
    dt = conv_a.dtype
    kernel = jnp.concatenate([pa["kernel"], pb["kernel"]], axis=-1)
    bias = jnp.concatenate([pa["bias"], pb["bias"]], axis=-1)
    return conv_apply(x, kernel, bias, pad, dt, matmul)


class BasicUpdateBlock(nn.Module):
    """One RAFT refinement step: motion enc -> GRU -> flow delta + up-mask."""
    hidden_dim: int = 128
    corr_channels: int = 324  # levels * (2*radius+1)^2
    dtype: object = jnp.float32
    matmul: object = False  # False | True (shifted matmuls) | "im2col"

    @nn.compact
    def __call__(self, net, inp, corr, flow, need_mask: bool = True,
                 mask_rows=None):
        mm = self.matmul
        motion_features = BasicMotionEncoder(corr_channels=self.corr_channels,
                                             dtype=self.dtype, matmul=mm,
                                             name="encoder")(flow, corr)
        gru_in = jnp.concatenate([inp, motion_features], axis=-1)
        net = SepConvGRU(self.hidden_dim, dtype=self.dtype, matmul=mm,
                         name="gru")(net, gru_in)
        delta_flow = FlowHead(256, 2, dtype=self.dtype, matmul=mm,
                              name="flow_head")(net)

        # mask head scaled 0.25 to balance gradients (reference update.py:237).
        # At test time the mask is only consumed on the final iteration
        # (raft.py upsamples once); need_mask=False skips the two convs
        # explicitly instead of relying on XLA dead-code elimination.
        # mask_rows (static (start, stop) batch slice) restricts the mask
        # head to the pairs that actually upsample this iteration — used by
        # the per-pair iteration schedule where pairs exit at different
        # iterations (raft.py _flow_scheduled).
        up_mask = None
        if need_mask or self.is_initializing():
            src = net if mask_rows is None else net[mask_rows[0]:mask_rows[1]]
            m = nn.relu(nn.Conv(256, (3, 3), padding=_pad(3), dtype=self.dtype,
                                name="mask_conv1")(src))
            up_mask = 0.25 * nn.Conv(576, (1, 1), padding="VALID",
                                     dtype=self.dtype, name="mask_conv2")(m)
        return net, up_mask, delta_flow, motion_features


class SmallMotionEncoder(nn.Module):
    """Small-model motion encoder (reference update.py:126-139): 82-ch out."""
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        flow = flow.astype(self.dtype)
        corr = corr.astype(self.dtype)
        cor = nn.relu(nn.Conv(96, (1, 1), padding="VALID", dtype=self.dtype,
                              name="convc1")(corr))
        flo = nn.relu(nn.Conv(64, (7, 7), padding=_pad(7), dtype=self.dtype,
                              name="convf1")(flow))
        flo = nn.relu(nn.Conv(32, (3, 3), padding=_pad(3), dtype=self.dtype,
                              name="convf2")(flo))
        out = nn.relu(nn.Conv(80, (3, 3), padding=_pad(3), dtype=self.dtype,
                              name="conv")(jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)  # 82 ch


class ConvGRU(nn.Module):
    """Plain 3x3 ConvGRU (small model, reference update.py:79-94)."""
    hidden_dim: int = 96
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(nn.Conv(self.hidden_dim, (3, 3), padding=_pad(3),
                               dtype=self.dtype, name="convz")(hx))
        r = nn.sigmoid(nn.Conv(self.hidden_dim, (3, 3), padding=_pad(3),
                               dtype=self.dtype, name="convr")(hx))
        q = nn.tanh(nn.Conv(self.hidden_dim, (3, 3), padding=_pad(3),
                            dtype=self.dtype, name="convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1.0 - z) * h + z * q


class SmallUpdateBlock(nn.Module):
    """Small-RAFT refinement step: no up-mask head (upflow8 upsampling).

    Reference parity: update.py:162-175.
    """
    hidden_dim: int = 96
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow, need_mask: bool = True,
                 mask_rows=None):
        del need_mask, mask_rows  # no mask head in the small model
        motion_features = SmallMotionEncoder(dtype=self.dtype,
                                             name="encoder")(flow, corr)
        gru_in = jnp.concatenate([inp, motion_features], axis=-1)
        net = ConvGRU(self.hidden_dim, dtype=self.dtype, name="gru")(net, gru_in)
        delta_flow = FlowHead(128, 2, dtype=self.dtype, name="flow_head")(net)
        return net, None, delta_flow, motion_features


class OcclusionAndUncertaintyBlock(nn.Module):
    """Separate occlusion (2ch logits) + uncertainty (1ch log-var) heads.

    Input: concat[net(128), inp(128), corr(324), flow(2), delta_flow(2),
    motion_features(128)] = 712 channels (reference raft.py:47, update.py:197).
    """
    architecture: str = "simple"
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow, delta_flow, motion_features):
        dt = self.dtype
        x = jnp.concatenate([net.astype(dt), inp.astype(dt), corr.astype(dt),
                             flow.astype(dt), delta_flow.astype(dt),
                             motion_features.astype(dt)], axis=-1)
        if self.architecture == "simple":
            # both heads' first convs (3x3, 712 -> 128 each) share the input;
            # run them as one fused 712 -> 256 conv (bit-identical, see
            # _fused_conv_pair) so the wide input is read once
            hd = 128  # heads' hidden width; also the fused-output split below
            occl_head = SimpleHead(hd, 2, dtype=dt, name="occl_head")
            unc_head = SimpleHead(hd, 1, dtype=dt, name="uncertainty_head")
            if self.is_initializing():
                return occl_head(x), unc_head(x)
            po = self.scope.get_variable("params", "occl_head")
            pu = self.scope.get_variable("params", "uncertainty_head")
            kernel = jnp.concatenate([po["conv1"]["kernel"],
                                      pu["conv1"]["kernel"]], axis=-1).astype(dt)
            bias = jnp.concatenate([po["conv1"]["bias"],
                                    pu["conv1"]["bias"]], axis=-1).astype(dt)
            h = jax.lax.conv_general_dilated(
                x, kernel, window_strides=(1, 1), padding=_pad(3),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
            h = nn.relu(h)
            conv2 = lambda p, hh: (jax.lax.conv_general_dilated(
                hh, p["conv2"]["kernel"].astype(dt), window_strides=(1, 1),
                padding=_pad(3), dimension_numbers=("NHWC", "HWIO", "NHWC"))
                + p["conv2"]["bias"].astype(dt))
            occl = conv2(po, h[..., :hd])
            uncertainty = conv2(pu, h[..., hd:])
            return occl, uncertainty
        head = MoreLayersHead
        occl = head(128, 2, dtype=dt, name="occl_head")(x)
        uncertainty = head(128, 1, dtype=dt, name="uncertainty_head")(x)
        return occl, uncertainty
