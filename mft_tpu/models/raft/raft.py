"""RAFT-OU flow network: encoders -> corr volume -> iterative GRU -> OU heads.

TPU-first design decisions:
- NHWC everywhere; inputs are (B, H, W, 3) float32 in [0, 255] (RGB), with
  H, W divisible by 8 (see wrapper.py for padding).
- both frames go through fnet as ONE batched conv pass (batch concat), like
  the reference's list trick (extractor.py:171-174) — bigger MXU matmuls.
- the all-pairs correlation volume is a single MXU matmul (corr.py here).
- the refinement recurrence runs a statically-unrolled loop over ``iters``
  (static under jit): the compiled graph is identical to
  ``lax.scan(..., unroll=iters)`` and lets test mode skip the OU heads on all
  but the last iteration (reference raft.py:195-226).
- gradients: ``stop_gradient`` replaces the reference's ``.detach()`` calls
  (raft.py:174, 199-205) so the training objective matches exactly.

Architecture parity: MFT/RAFT/core/raft.py:24-259. Hyperparameters (big
model): hdim=cdim=128, corr_levels=4, corr_radius=4, OU input 712ch,
12 iterations at test time (configs/flow/RAFTou_kubric_huber_split_nonoccl.py:27).
"""

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from mft_tpu.models.raft.layers import BasicEncoder, SmallEncoder
from mft_tpu.models.raft.update import (
    BasicUpdateBlock,
    OcclusionAndUncertaintyBlock,
    SmallUpdateBlock,
)
from mft_tpu.models.raft.corr import (build_corr_pyramid, corr_lookup,
                                      corr_lookup_fused_conv)
from mft_tpu.models.raft.upsample import (convex_upsample_multi,
                                           upflow8, upsample8)


@dataclasses.dataclass(frozen=True)
class RAFTParams:
    """Static model configuration (mirrors the reference args namespace)."""
    small: bool = False
    occlusion_module: str | None = "separate_with_uncertainty"
    corr_levels: int = 4
    corr_radius: int = 4
    normalized_features: bool = False
    corr_method: str = "auto"  # 'auto'|'pallas'|'mixed'|'mxu'|'gather'|'alt'|'win'|'pallas_t'|'fold'|'int8'|'packed'|'packed_i8'
    compute_dtype: str = "float32"  # 'bfloat16' | 'auto' (bf16 on TPU only)
    conv_backend: str = "auto"  # 'auto'|'conv'|'matmul'|'im2col'|'hybrid'|'pallas' (update.py conv_apply)
    corr_tile: int = 0  # pixel-tile override for the pallas lookup (0 = auto)
    fuse_lookup: str = "auto"  # 'auto'|'on'|'off' — fuse corr lookup with the
    # motion encoder's convc1+relu in one Pallas kernel on iterations whose
    # only corr consumer is the update block (inference-only; corr.py
    # corr_lookup_fused_conv)
    relu_uncertainty: bool = False
    ou_last_iter_only: bool = False
    dropout: float = 0.0

    @property
    def occlusion_estimation(self) -> bool:
        return self.occlusion_module is not None

    @property
    def uncertainty_estimation(self) -> bool:
        return (self.occlusion_estimation
                and "with_uncertainty" in self.occlusion_module)

    @property
    def uncertainty_upsample_mult(self) -> float:
        # 'upsample8' variant multiplies upsampled uncertainty by 8
        return 8.0 if (self.occlusion_module
                       and "upsample8" in self.occlusion_module) else 1.0

    @property
    def ou_architecture(self) -> str:
        return ("morelayers" if (self.occlusion_module
                                 and "morelayers" in self.occlusion_module)
                else "simple")

    @property
    def dtype(self):
        """Compute dtype. 'auto' = bfloat16 on TPU, float32 elsewhere.

        bf16 is the TPU production precision (MXU-native; the measured
        TPU-path drift bound in docs/PERFORMANCE.md covers it); on CPU
        bf16 is emulated and slow, so 'auto' keeps f32 there.
        """
        if self.compute_dtype == "auto":
            return (jnp.bfloat16 if jax.default_backend() == "tpu"
                    else jnp.float32)
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @property
    def use_matmul_convs(self):
        """Update-block conv lowering (update.py conv_apply).

        'auto' picks the shifted-matmul path on TPU only: ~20% faster there
        (A/B-measured), pointless relayout churn on CPU. 'im2col' contracts
        all kh*kw shifted views in ONE GEMM (A/B: −5 FPS as a blanket
        policy — the wide cols array costs more than it saves). 'hybrid'
        uses im2col only for tiny-Cin convs and shifted matmuls elsewhere.
        Accumulation-order-level numerics difference vs the conv lowering
        (all are valid float evaluations)."""
        if self.conv_backend == "auto":
            return jax.default_backend() == "tpu"
        if self.conv_backend in ("im2col", "hybrid", "pallas"):
            return self.conv_backend
        return self.conv_backend == "matmul"

    @property
    def effective_corr_radius(self) -> int:
        # reference forces radius 3 for the small model (raft.py:37-40)
        return 3 if self.small else self.corr_radius

    @property
    def hidden_dim(self) -> int:
        return 96 if self.small else 128

    @property
    def context_dim(self) -> int:
        return 64 if self.small else 128


def initialize_coords(B: int, H8: int, W8: int):
    """coords0 == coords1 == pixel grid at 1/8 scale; flow = coords1 - coords0."""
    xs = jnp.arange(W8, dtype=jnp.float32)
    ys = jnp.arange(H8, dtype=jnp.float32)
    xg, yg = jnp.meshgrid(xs, ys)
    grid = jnp.stack([xg, yg], axis=-1)[None]  # (1, H8, W8, 2)
    return jnp.broadcast_to(grid, (B, H8, W8, 2))


def _packable(H8: int, W8: int, num_levels: int) -> bool:
    """True iff every pyramid level fits the packed flat-volume layout:
    either the whole map fits one zero-padded 128-lane row, or whole image
    rows pack evenly into 128-lane groups (128 % w == 0, h*w % 128 == 0)."""
    h, w = H8, W8
    for lvl in range(num_levels):
        if lvl > 0:
            h, w = h // 2, w // 2
        if h * w > 128 and (128 % w != 0 or (h * w) % 128 != 0):
            return False
    return True


class RAFT(nn.Module):
    """RAFT with occlusion+uncertainty heads.

    ``__call__(image1, image2, iters, flow_init, test_mode)`` returns a dict:
      test_mode=True:  {'flow': (B,H,W,2), 'occlusion': (B,H,W,2) raw logits,
                        'uncertainty': (B,H,W,1) log-variance,
                        'coords': (B,H/8,W/8,2) low-res flow}
      test_mode=False: same keys but each a list of per-iteration predictions
                       (for the gamma-weighted sequence losses).
    """
    cfg: RAFTParams = RAFTParams()
    train_mode: bool = False

    def setup(self):
        dt = self.cfg.dtype
        if self.cfg.small:
            self.fnet = SmallEncoder(output_dim=128, norm_fn="instance",
                                     train=self.train_mode,
                                     dropout=self.cfg.dropout, dtype=dt)
            self.cnet = SmallEncoder(
                output_dim=self.cfg.hidden_dim + self.cfg.context_dim,
                norm_fn="none", train=self.train_mode,
                dropout=self.cfg.dropout, dtype=dt)
        else:
            self.fnet = BasicEncoder(output_dim=256, norm_fn="instance",
                                     train=self.train_mode,
                                     dropout=self.cfg.dropout, dtype=dt)
            self.cnet = BasicEncoder(
                output_dim=self.cfg.hidden_dim + self.cfg.context_dim,
                norm_fn="batch", train=self.train_mode,
                dropout=self.cfg.dropout, dtype=dt)
        if self.cfg.small:
            self.update_block = SmallUpdateBlock(
                hidden_dim=self.cfg.hidden_dim, dtype=dt)
        else:
            matmul = self.cfg.use_matmul_convs
            if self.train_mode and matmul == "pallas":
                # conv_pallas has no VJP — the same limitation class as the
                # no-VJP corr methods (guarded in flow_from_features): train
                # with the differentiable shifted-matmul lowering instead
                matmul = True
            self.update_block = BasicUpdateBlock(
                hidden_dim=self.cfg.hidden_dim,
                corr_channels=(self.cfg.corr_levels
                               * (2 * self.cfg.effective_corr_radius + 1) ** 2),
                dtype=dt, matmul=matmul)
        if self.cfg.occlusion_estimation:
            self.occlusion_block = OcclusionAndUncertaintyBlock(
                architecture=self.cfg.ou_architecture, dtype=dt)

    def encode(self, image, normalise_input: bool = True,
               with_context: bool = True):
        """Per-frame encoder features: (fmap, cnet_out or None).

        Exposed separately so the tracker can CACHE features in its ring
        memory — every left frame of a delta pair was already the current
        frame once, and the 7 pairs share one right frame, so per tracked
        frame only ONE image ever needs encoding (vs 14 fnet + 7 cnet
        passes when encoding pairs from scratch).
        """
        if normalise_input:
            image = 2.0 * (image.astype(jnp.float32) / 255.0) - 1.0
        image = image.astype(self.cfg.dtype)
        fmap = self.fnet(image)
        cnet = self.cnet(image) if with_context else None
        return fmap, cnet

    def __call__(self, image1, image2, iters: int = 12, flow_init=None,
                 test_mode: bool = True, normalise_input: bool = True):
        cfg = self.cfg
        if normalise_input:
            image1 = 2.0 * (image1.astype(jnp.float32) / 255.0) - 1.0
            image2 = 2.0 * (image2.astype(jnp.float32) / 255.0) - 1.0
        image1 = image1.astype(cfg.dtype)
        image2 = image2.astype(cfg.dtype)

        B, H, W, _ = image1.shape

        # one batched conv pass over both frames (reference extractor.py:171-174)
        fmaps = self.fnet(jnp.concatenate([image1, image2], axis=0))
        fmap1, fmap2 = fmaps[:B], fmaps[B:]
        cnet = self.cnet(image1)
        return self.flow_from_features(fmap1, fmap2, cnet, iters=iters,
                                       flow_init=flow_init,
                                       test_mode=test_mode)

    def flow_from_features(self, fmap1, fmap2, cnet, iters=12,
                           flow_init=None, test_mode: bool = True):
        """Everything after the encoders (pyramid -> GRU loop -> heads).

        args: fmap1/fmap2 (B, H/8, W/8, 256) fnet features of the two
        frames, cnet (B, H/8, W/8, 256) context features of frame 1 — all
        as produced by :meth:`encode`. Split out so cached features can be
        fed directly (tracker feature-ring memory).

        ``iters`` may be a per-pair tuple (len B) instead of an int: each
        pair then runs its own iteration count (see :meth:`_flow_scheduled`)
        — the documented non-default speed mode for the MFT tracker.
        """
        if isinstance(iters, (tuple, list)):
            return self._flow_scheduled(fmap1, fmap2, cnet, tuple(iters),
                                        flow_init, test_mode)
        cfg = self.cfg
        B, H8, W8, _ = fmap1.shape
        H, W = H8 * 8, W8 * 8

        lookup_method = cfg.corr_method
        if cfg.corr_method in ("alt", "win", "pallas_t", "fold", "mixed",
                               "int8", "packed", "packed_i8") and self.train_mode:
            # the alt/win/lane-major/folded kernels have no VJP — train with
            # the materialized pyramid and the differentiable standard lookup
            lookup_method = "auto"
        if lookup_method == "mixed":
            # NON-DEFAULT: folded-dense big levels read ~2x fewer HBM bytes
            # but full-graph A/B measured 13.7-15.9 FPS vs 15.9-16.7 for the
            # padded pixel-major path (the fold-sum VPU pass costs more than
            # the DMA it saves); kept as an opt-in memory/layout variant.
            # Unfoldable shapes degrade to an all-padded pyramid + mxu path.
            from mft_tpu.models.raft.corr import build_corr_pyramid_mixed
            pyramid = build_corr_pyramid_mixed(fmap1, fmap2, cfg.corr_levels,
                                               cfg.normalized_features,
                                               dtype=cfg.dtype)
        elif lookup_method == "alt":
            # low-memory path (reference AlternateCorrBlock/alt_cuda_corr):
            # keep only the feature pyramid; the lookup kernel recomputes
            # the needed correlation slices in VMEM every iteration
            from mft_tpu.ops.alt_corr_pallas import build_feature_pyramid
            f1 = fmap1
            f2 = fmap2
            if cfg.normalized_features:
                norm = lambda f: f / jnp.linalg.norm(
                    f.astype(jnp.float32), axis=-1, keepdims=True).astype(f.dtype)
                f1, f2 = norm(f1), norm(f2)
            pyramid = ("alt", f1.reshape(B, H8 * W8, -1),
                       build_feature_pyramid(f2, cfg.corr_levels,
                                             dtype=cfg.dtype))
        elif lookup_method == "win":
            # windowed on-the-fly lookup: no volume anywhere — per pixel
            # tile only a dynamic row window of the correlation map is
            # recomputed from VMEM-resident features every iteration
            # (ops/alt_corr_pallas.py corr_lookup_win)
            from mft_tpu.ops.alt_corr_pallas import build_feature_pyramid_slab
            f1 = fmap1
            f2 = fmap2
            if cfg.normalized_features:
                norm = lambda f: f / jnp.linalg.norm(
                    f.astype(jnp.float32), axis=-1, keepdims=True).astype(f.dtype)
                f1, f2 = norm(f1), norm(f2)
            pyramid = ("win", f1.reshape(B, H8 * W8, -1),
                       build_feature_pyramid_slab(f2, cfg.corr_levels,
                                                  dtype=cfg.dtype))
        elif lookup_method == "pallas_t":
            # lane-major volume layout (source pixels on lanes): the lookup
            # kernel contracts with full-lane-width VPU FMAs instead of
            # per-pixel MXU dots (ops/corr_lookup_pallas.py layout B)
            from mft_tpu.ops.corr_lookup_pallas import build_corr_pyramid_t
            pyramid = ("t", build_corr_pyramid_t(
                fmap1, fmap2, cfg.corr_levels, cfg.normalized_features,
                dtype=cfg.dtype))
        elif lookup_method == "fold":
            # FOLDED fully-lane-packed volume (fold=128/w image rows per
            # 128-lane row; ~2.8x less lookup DMA than the padded 4D
            # layout).  NON-DEFAULT: benched 12.2 vs 16.7 FPS at 512px —
            # the pixel-major lookup is DMA-overlapped enough that the
            # extra per-level fold dots (19 vs 8 batched-dot issues per
            # lookup) cost more than the DMA they save.  Kept as the
            # starting point for a windowed-DMA variant.
            if not _packable(H8, W8, cfg.corr_levels):
                raise ValueError(
                    f"corr_method='fold' needs packable dims, got {H8}x{W8}")
            from mft_tpu.ops.corr_lookup_pallas import build_corr_pyramid_pallas
            levels, dims = build_corr_pyramid_pallas(
                fmap1, fmap2, cfg.corr_levels, cfg.normalized_features,
                dtype=cfg.dtype)
            pyramid = ("fold", levels, dims)
        elif lookup_method == "packed":
            # all pyramid levels lane-packed side by side in ONE map per
            # pixel: the (dot-issue-bound) lookup contracts every level
            # with 2 batched dots per tile instead of 2 per level, and the
            # physical HBM volume halves (no per-level lane padding) — see
            # ops/corr_lookup_pallas.py pack_corr_pyramid
            from mft_tpu.ops.corr_lookup_pallas import pack_corr_pyramid
            pyr = build_corr_pyramid(fmap1, fmap2, cfg.corr_levels,
                                     cfg.normalized_features,
                                     dtype=cfg.dtype)
            packed, pdims = pack_corr_pyramid(pyr)
            pyramid = ("packed", packed, pdims)
        elif lookup_method == "packed_i8":
            # lane-packed layout quantized to int8: the 2-dots-per-tile
            # contraction at half the DMA bytes again (inference-only
            # accuracy/speed trade, error <= max|corr|/254 per value)
            from mft_tpu.ops.corr_lookup_pallas import pack_corr_pyramid_i8
            pyr = build_corr_pyramid(fmap1, fmap2, cfg.corr_levels,
                                     cfg.normalized_features,
                                     dtype=cfg.dtype)
            packed, scales, pdims = pack_corr_pyramid_i8(pyr)
            pyramid = ("packed_i8", packed, scales, pdims)
        elif lookup_method == "int8":
            # int8-quantized volume: halves the DMA of the (DMA-bound)
            # per-iteration lookup. Inference-only accuracy/speed trade
            # (error <= max|corr|/254 per correlation value); training
            # falls back to the differentiable standard path above.
            from mft_tpu.models.raft.corr import quantize_pyramid
            pyr = build_corr_pyramid(fmap1, fmap2, cfg.corr_levels,
                                     cfg.normalized_features,
                                     dtype=cfg.dtype)
            levels, scales = quantize_pyramid(pyr)
            pyramid = ("i8", levels, scales)
        else:
            pyramid = build_corr_pyramid(fmap1, fmap2, cfg.corr_levels,
                                         cfg.normalized_features,
                                         dtype=cfg.dtype)

        net = jnp.tanh(cnet[..., : cfg.hidden_dim])
        inp = nn.relu(cnet[..., cfg.hidden_dim:])

        coords0 = initialize_coords(B, H8, W8)
        coords1 = coords0
        if flow_init is not None:
            coords1 = coords1 + flow_init

        flow_preds, occl_preds, unc_preds = [], [], []
        flow_up = occl_up = uncertainty_up = None
        fuse = self._fused_lookup_on(lookup_method, test_mode)
        for itr in range(iters):
            coords1 = jax.lax.stop_gradient(coords1)
            is_last = itr == iters - 1
            need_up = (not test_mode) or is_last
            ou_this_iter = cfg.occlusion_estimation and (
                is_last if (test_mode or cfg.ou_last_iter_only) else True)

            if fuse and not ou_this_iter:
                # corr's only consumer this iteration is the motion encoder's
                # convc1 — hand the update block a closure that computes
                # relu(convc1(lookup)) inside the lookup kernel itself, so the
                # 324-ch window samples never round-trip HBM
                corr = lambda k, b, _c=coords1: corr_lookup_fused_conv(
                    pyramid, _c, k, b, cfg.effective_corr_radius,
                    method=lookup_method, tile_p=cfg.corr_tile)
            else:
                corr = corr_lookup(pyramid, coords1, cfg.effective_corr_radius,
                                   method=lookup_method, tile_p=cfg.corr_tile)

            flow = coords1 - coords0
            # the convex-upsampling mask is consumed only on iterations that
            # upsample; skip its two convs on the others (test: all but last)
            net, up_mask, delta_flow, motion_features = self.update_block(
                net, inp, corr, flow, need_mask=need_up or ou_this_iter)
            delta_flow = delta_flow.astype(jnp.float32)  # coords math in f32
            coords1 = coords1 + delta_flow

            if ou_this_iter:
                occlusion, uncertainty = self.occlusion_block(
                    jax.lax.stop_gradient(net),
                    inp,
                    jax.lax.stop_gradient(corr),
                    jax.lax.stop_gradient(coords1 - coords0),
                    jax.lax.stop_gradient(delta_flow),
                    motion_features,
                )

            # one shared-mask convex upsampling for every field of this
            # iteration (upsample.py convex_upsample_multi)
            if need_up or ou_this_iter:
                fields, coefs = [], []
                if need_up:
                    fields.append(coords1 - coords0)
                    coefs.append(8.0)
                if ou_this_iter:
                    fields.append(occlusion.astype(jnp.float32))
                    coefs.append(1.0)
                    if cfg.uncertainty_estimation:
                        fields.append(uncertainty.astype(jnp.float32))
                        coefs.append(cfg.uncertainty_upsample_mult)
                if up_mask is None:  # small model: plain x8 bilinear
                    ups = [upflow8(fields[0])] if need_up else []
                    ups += [upsample8(f * c) for f, c in
                            zip(fields[len(ups):], coefs[len(ups):])]
                else:
                    ups = convex_upsample_multi(
                        fields, up_mask.astype(jnp.float32), coefs)
                if need_up:
                    flow_up = ups.pop(0)
                    flow_preds.append(flow_up)
                if ou_this_iter:
                    occl_up = ups.pop(0)
                    occl_preds.append(occl_up)
                    if cfg.uncertainty_estimation:
                        uncertainty_up = ups.pop(0)
                        if cfg.relu_uncertainty:
                            uncertainty_up = nn.relu(uncertainty_up)
                        unc_preds.append(uncertainty_up)

        outputs = {}
        if test_mode:
            outputs["flow"] = flow_up
            if cfg.occlusion_estimation:
                outputs["occlusion"] = occl_up
            if cfg.uncertainty_estimation:
                outputs["uncertainty"] = uncertainty_up
        else:
            outputs["flow"] = flow_preds
            if cfg.occlusion_estimation:
                outputs["occlusion"] = occl_preds
            if cfg.uncertainty_estimation:
                outputs["uncertainty"] = unc_preds
        outputs["coords"] = coords1 - coords0
        return outputs

    def _fused_lookup_on(self, lookup_method: str,
                         test_mode: bool = True) -> bool:
        """True when the lookup→convc1 fused epilogue applies.

        Inference-only — the fused kernel has no VJP, so it is disabled both
        in train mode AND for test_mode=False calls (an eval-constructed
        model being differentiated, e.g. test-time adaptation, must route
        through the unfused lookup whose custom VJP exists). Big model only,
        and only for the plain-list pyramid layouts the fused kernel
        consumes. 'auto' enables it on TPU.
        """
        cfg = self.cfg
        if (cfg.fuse_lookup == "off" or self.train_mode or not test_mode
                or cfg.small):
            return False
        if lookup_method not in ("auto", "pallas"):
            return False
        return cfg.fuse_lookup == "on" or jax.default_backend() == "tpu"

    def _flow_scheduled(self, fmap1, fmap2, cnet, iters_schedule,
                        flow_init, test_mode):
        """Per-pair GRU iteration schedule (non-default inference speed mode).

        Pair ``b`` runs exactly ``iters_schedule[b]`` refinement iterations
        with per-pair math IDENTICAL to ``flow_from_features(iters=
        iters_schedule[b])`` (tested in tests/test_iter_schedule.py): pairs
        are sorted by descending iteration count so the active set is always
        a batch prefix, each iteration computes only that prefix, and a
        pair's OU heads + convex upsampling run at its own last iteration on
        its exit slice (mask head restricted to the exit rows).

        Rationale: the MFT tracker's small-delta pairs carry tiny flows that
        converge far below the reference's uniform 12 iterations
        (configs/flow/RAFTou_kubric_huber_split_nonoccl.py:27); scheduling
        them lower trades a documented accuracy epsilon for throughput.
        The default configs keep the uniform 12 — this path only runs when
        a config sets ``flow_iters_schedule``.
        """
        cfg = self.cfg
        assert test_mode, "iteration schedules are an inference-only mode"
        if cfg.corr_method not in ("auto", "pallas", "mxu", "gather",
                                   "mixed", "packed", "packed_i8"):
            raise NotImplementedError(
                "iters schedule requires a sliceable materialized pyramid; "
                f"corr_method={cfg.corr_method!r} is not supported")
        B, H8, W8, _ = fmap1.shape
        if len(iters_schedule) != B:
            raise ValueError(f"schedule len {len(iters_schedule)} != B={B}")
        sched = [int(i) for i in iters_schedule]
        if min(sched) < 1:
            raise ValueError(f"schedule entries must be >= 1: {sched}")
        order = sorted(range(B), key=lambda b: -sched[b])  # descending, stable
        ssched = [sched[b] for b in order]
        max_iters = ssched[0]
        counts = [sum(1 for s in ssched if s > k) for k in range(max_iters)]

        perm = jnp.asarray(order)
        fmap1 = jnp.take(fmap1, perm, axis=0)
        fmap2 = jnp.take(fmap2, perm, axis=0)
        cnet = jnp.take(cnet, perm, axis=0)
        if flow_init is not None:
            flow_init = jnp.take(flow_init, perm, axis=0)

        if cfg.corr_method == "mixed":
            # same opt-in folded-dense layout as the uniform path
            from mft_tpu.models.raft.corr import build_corr_pyramid_mixed
            pyramid = build_corr_pyramid_mixed(fmap1, fmap2, cfg.corr_levels,
                                               cfg.normalized_features,
                                               dtype=cfg.dtype)
            slice_pyr = lambda pyr, mm: ("mixed",
                                         [a[:mm] for a in pyr[1]], pyr[2],
                                         [a[:mm] for a in pyr[3]])
        else:
            pyramid = build_corr_pyramid(fmap1, fmap2, cfg.corr_levels,
                                         cfg.normalized_features,
                                         dtype=cfg.dtype)
            if cfg.corr_method == "packed":
                from mft_tpu.ops.corr_lookup_pallas import pack_corr_pyramid
                packed, pdims = pack_corr_pyramid(pyramid)
                pyramid = ("packed", packed, pdims)
                slice_pyr = lambda pyr, mm: ("packed", pyr[1][:mm], pyr[2])
            elif cfg.corr_method == "packed_i8":
                from mft_tpu.ops.corr_lookup_pallas import pack_corr_pyramid_i8
                packed, scales, pdims = pack_corr_pyramid_i8(pyramid)
                pyramid = ("packed_i8", packed, scales, pdims)
                slice_pyr = lambda pyr, mm: ("packed_i8", pyr[1][:mm],
                                             pyr[2][:mm], pyr[3])
            else:
                slice_pyr = lambda pyr, mm: [lvl[:mm] for lvl in pyr]
        net = jnp.tanh(cnet[..., : cfg.hidden_dim])
        inp = nn.relu(cnet[..., cfg.hidden_dim:])
        coords0 = initialize_coords(B, H8, W8)
        coords1 = coords0 if flow_init is None else coords0 + flow_init
        fuse = self._fused_lookup_on(cfg.corr_method)

        outs = [None] * B  # per ORIGINAL pair index
        m = B
        for itr in range(max_iters):
            if counts[itr] < m:
                m = counts[itr]
                pyramid = slice_pyr(pyramid, m)
                net, inp = net[:m], inp[:m]
                coords0, coords1 = coords0[:m], coords1[:m]
            m_next = counts[itr + 1] if itr + 1 < max_iters else 0
            if fuse and m_next == m:
                # no pair exits after this iteration, so corr's only consumer
                # is convc1 — same fused closure as the uniform path
                corr = lambda k, b, _c=coords1, _p=pyramid: (
                    corr_lookup_fused_conv(_p, _c, k, b,
                                           cfg.effective_corr_radius,
                                           method=cfg.corr_method,
                                           tile_p=cfg.corr_tile))
            else:
                corr = corr_lookup(pyramid, coords1, cfg.effective_corr_radius,
                                   method=cfg.corr_method, tile_p=cfg.corr_tile)
            flow = coords1 - coords0
            net, up_mask, delta_flow, motion_features = self.update_block(
                net, inp, corr, flow, need_mask=m_next < m,
                mask_rows=(m_next, m))
            delta_flow = delta_flow.astype(jnp.float32)
            coords1 = coords1 + delta_flow

            if m_next == m:
                continue
            # pairs [m_next:m] exit after this iteration: their OU heads +
            # upsampling run here, exactly as a uniform run's last iteration
            sl = slice(m_next, m)
            fields = [(coords1 - coords0)[sl]]
            coefs = [8.0]
            occl = uncertainty = None
            if cfg.occlusion_estimation:
                occl, uncertainty = self.occlusion_block(
                    net[sl], inp[sl], corr[sl], (coords1 - coords0)[sl],
                    delta_flow[sl], motion_features[sl])
                fields.append(occl.astype(jnp.float32))
                coefs.append(1.0)
                if cfg.uncertainty_estimation:
                    fields.append(uncertainty.astype(jnp.float32))
                    coefs.append(cfg.uncertainty_upsample_mult)
            if up_mask is None:  # small model: plain x8 bilinear
                ups = [upflow8(fields[0])]
                ups += [upsample8(f * c) for f, c in
                        zip(fields[1:], coefs[1:])]
            else:
                ups = convex_upsample_multi(fields,
                                            up_mask.astype(jnp.float32),
                                            coefs)
            fl = ups.pop(0)
            oc = ups.pop(0) if cfg.occlusion_estimation else None
            un = ups.pop(0) if cfg.uncertainty_estimation else None
            if un is not None and cfg.relu_uncertainty:
                un = nn.relu(un)
            low = (coords1 - coords0)[sl]
            for j, row in enumerate(range(m_next, m)):
                outs[order[row]] = (
                    fl[j:j + 1],
                    None if oc is None else oc[j:j + 1],
                    None if un is None else un[j:j + 1],
                    low[j:j + 1])

        outputs = {"flow": jnp.concatenate([o[0] for o in outs], axis=0)}
        if cfg.occlusion_estimation:
            outputs["occlusion"] = jnp.concatenate([o[1] for o in outs],
                                                   axis=0)
        if cfg.uncertainty_estimation:
            outputs["uncertainty"] = jnp.concatenate([o[2] for o in outs],
                                                     axis=0)
        outputs["coords"] = jnp.concatenate([o[3] for o in outs], axis=0)
        return outputs
