"""RAFTFlow: the flow-computation service used by the MFT tracker.

Role parity with the reference RAFTWrapper (MFT/raft.py:15-94): owns the
model weights, handles padding to /8, converts raw head outputs into
(flow, occlusion probability, sigma). TPU-first differences:

- the whole pipeline (pad -> forward -> unpad -> softmax/sqrt-exp postproc)
  is ONE jitted function per input shape — no per-pair host<->device hops;
- a batched entry point ``forward_batch`` runs all of a frame's delta pairs
  in a single forward (the tracker's hot path batches the <=7 deltas);
- images live as (H, W, 3) RGB float32 in [0, 255], channel-last.

Checkpoints: reference .pth files are converted on load (convert.py); native
checkpoints are flax msgpack. Missing checkpoint -> deterministic random init
(the reference's trained .pth is not distributed with the repo either,
.MISSING_LARGE_BLOBS:1).
"""

import logging
from functools import partial
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from mft_tpu.models.raft.raft import RAFT, RAFTParams
from mft_tpu.models.raft.upsample import downsample_flow8

logger = logging.getLogger(__name__)


def pad_to_8(H: int, W: int):
    """Sintel-mode padding amounts: ((top, bottom), (left, right)).

    Reference parity: MFT/RAFT/core/utils/utils.py:7-16 (InputPadder).
    """
    pad_ht = (((H // 8) + 1) * 8 - H) % 8
    pad_wd = (((W // 8) + 1) * 8 - W) % 8
    return ((pad_ht // 2, pad_ht - pad_ht // 2),
            (pad_wd // 2, pad_wd - pad_wd // 2))


def _pow2_tile(v) -> int:
    """Validate a corr_tile override: 0 (auto) or a power of two >= 8.

    The pallas lookup grids are ``P // tile`` with no remainder handling —
    a non-power-of-two tile would silently leave trailing pixels unwritten
    (_tile_p returns min(P & -P, cap), a non-divisor for such caps).
    """
    t = int(v or 0)
    if t and (t < 8 or t & (t - 1)):
        raise ValueError(f"corr_tile must be 0 or a power of two >= 8, got {t}")
    return t


def raft_params_from_config(raft_kwargs) -> RAFTParams:
    """Build RAFTParams from a reference-style raft_params mapping."""
    get = (raft_kwargs.get if hasattr(raft_kwargs, "get")
           else lambda k, d=None: getattr(raft_kwargs, k, d))
    return RAFTParams(
        small=bool(get("small", False)),
        occlusion_module=get("occlusion_module", "separate_with_uncertainty"),
        normalized_features=bool(get("normalized_features", False)),
        relu_uncertainty=bool(get("relu_uncertainty", False)),
        corr_method=str(get("corr_method", "auto")),
        corr_tile=_pow2_tile(get("corr_tile", 0)),
        # 'auto' = bf16 on TPU, f32 elsewhere: the TPU production default —
        # a config omitting compute_dtype gets the MXU-native precision the
        # measured drift bound covers (docs/PERFORMANCE.md), while CPU runs
        # (tests, demo) keep f32. Set 'float32' explicitly for the exact path.
        # Shipped configs set compute_dtype EXPLICITLY (configs/flow/
        # raftou_default.py) so production numerics are a per-config choice;
        # the TPU-side regression gate for the auto/bf16 path is
        # tests/test_tpu_drift.py (tpu-marked, asserts the drift bound).
        compute_dtype=str(get("compute_dtype", "auto")),
        conv_backend=str(get("conv_backend", "auto")),
        fuse_lookup=str(get("fuse_lookup", "auto")),
        ou_last_iter_only=bool(get("OU_last_iter_only", False)),
    )


def load_variables(path, model: RAFT, example_hw=(64, 64)):
    """Load checkpoint variables, falling back to deterministic random init."""
    path = Path(path) if path else None
    if path is not None and path.exists():
        if path.suffix == ".pth":
            from mft_tpu.models.raft.convert import load_torch_checkpoint
            logger.info("converting torch checkpoint %s", path)
            variables = load_torch_checkpoint(path)
            return jax.tree.map(jnp.asarray, variables)
        if path.suffix in (".msgpack", ".bin"):
            from flax import serialization
            target = _random_init(model, example_hw)
            return serialization.from_bytes(target, path.read_bytes())
        raise ValueError(f"unknown checkpoint format: {path}")
    logger.warning("checkpoint %s not found - using random init", path)
    return _random_init(model, example_hw)


def _random_init(model: RAFT, hw):
    H, W = hw
    dummy = jnp.zeros((1, H, W, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(0), dummy, dummy, iters=1)


def save_variables(path, variables):
    from flax import serialization
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_bytes(serialization.to_bytes(variables))


class RAFTFlow:
    """Flow/occlusion/sigma estimator service (reference RAFTWrapper role)."""

    def __init__(self, config):
        self.C = config
        self.cfg = raft_params_from_config(config.raft_params or {})
        self.iters = int(config.flow_iters or 12)
        self.model = RAFT(cfg=self.cfg, train_mode=False)
        self.variables = load_variables(config.model or None, self.model)
        self._jitted = {}

    # ------------------------------------------------------------------ #
    def padded_forward(self, H, W, iters_schedule=None):
        """The UNJITTED padded-forward closure for (·, H, W, 3) inputs.

        Exposed so callers (the tracker's fused per-frame step) can compose
        the whole frame into one jit — per-op dispatch through a remote
        device tunnel costs milliseconds each, so one call per frame beats
        ~30 small ones.

        ``iters_schedule`` (optional tuple, one entry per batch pair): the
        per-pair iteration-count speed mode, as :meth:`features_forward`.
        """
        (pt, pb), (pl, pr) = pad_to_8(H, W)
        model, iters = self.model, self.iters
        if iters_schedule is not None:
            iters = tuple(int(i) for i in iters_schedule)

        def fwd(variables, image1, image2, init_flow=None):
            # replicate-pad to /8 (reference InputPadder, utils.py:18-19)
            pad = ((0, 0), (pt, pb), (pl, pr), (0, 0))
            i1 = jnp.pad(image1, pad, mode="edge")
            i2 = jnp.pad(image2, pad, mode="edge")
            flow_init = None
            if init_flow is not None:
                fi = jnp.pad(init_flow, pad, mode="edge")
                flow_init = downsample_flow8(fi)
            out = model.apply(variables, i1, i2, iters=iters,
                              flow_init=flow_init, test_mode=True)
            Hp, Wp = H + pt + pb, W + pl + pr
            unpad = lambda x: x[:, pt:Hp - pb, pl:Wp - pr]
            flow = unpad(out["flow"])
            occl = unpad(jax.nn.softmax(out["occlusion"], axis=-1)[..., 1])
            sigma = unpad(jnp.sqrt(jnp.exp(out["uncertainty"][..., 0])))
            return flow, occl, sigma

        return fwd

    def padded_encode(self, H, W):
        """Unjitted closure: (variables, (B,H,W,3) [0,255] RGB images) ->
        (fmap, cnet) at padded stride-8 resolution. For feature caching —
        see RAFT.encode."""
        (pt, pb), (pl, pr) = pad_to_8(H, W)
        model = self.model
        # grouped-conv fused fnet+cnet pass (encoder_fuse.py): bit-exact,
        # but feature_group_count=2 lowers ~3ms/frame SLOWER than two
        # separate stacks on the v5e (full-bench 13.6 vs 16.6 FPS) — XLA's
        # grouped-conv lowering is the bottleneck. Disabled; kept for
        # toolchains with native grouped-conv support.
        use_fused = bool(getattr(self.C, "fused_encoder", False)
                         and not self.cfg.small
                         and "batch_stats" in self.variables)
        dtype = self.cfg.dtype

        def enc(variables, images, with_context=True):
            pad = ((0, 0), (pt, pb), (pl, pr), (0, 0))
            x = jnp.pad(images, pad, mode="edge")
            if with_context and use_fused:
                from mft_tpu.models.raft.encoder_fuse import fused_basic_encode
                return fused_basic_encode(variables, x, dtype=dtype)
            return model.apply(
                variables, x,
                method=lambda m, im: m.encode(im, with_context=with_context))

        return enc

    def features_forward(self, H, W, iters_schedule=None, init_slot=None):
        """Unjitted closure: flow/occl/sigma from CACHED encoder features.

        args (to the closure): variables, fmap1, fmap2, cnet1 — features at
        the padded stride-8 resolution from :meth:`padded_encode` — plus an
        optional ``init_flow`` (H, W, 2) full-resolution warm-start flow for
        the single batch pair ``init_slot`` (static; the tracker's
        delta=inf pair). Other pairs start from the zero flow, exactly as
        without warm starting.
        returns: (flow (B,H,W,2), occl (B,H,W), sigma (B,H,W)) unpadded.

        ``iters_schedule`` (optional tuple, one entry per batch pair)
        switches the forward to the per-pair iteration-count speed mode
        (RAFT._flow_scheduled); None keeps the uniform ``flow_iters``.
        """
        (pt, pb), (pl, pr) = pad_to_8(H, W)
        model, iters = self.model, self.iters
        if iters_schedule is not None:
            iters = tuple(int(i) for i in iters_schedule)

        def fwd(variables, fmap1, fmap2, cnet1, init_flow=None):
            flow_init = None
            if init_flow is not None:
                assert init_slot is not None
                # pad + 1/8-downsample ONE map (reference warm start feeds
                # RAFT a low-res init, MFT/raft.py:98-101), then scatter it
                # into the zero init of the full batch
                pad = ((0, 0), (pt, pb), (pl, pr), (0, 0))
                fi = jnp.pad(init_flow[None].astype(jnp.float32), pad,
                             mode="edge")
                fi8 = downsample_flow8(fi)
                B = fmap1.shape[0]
                flow_init = jnp.zeros((B, *fi8.shape[1:]), jnp.float32
                                      ).at[init_slot].set(fi8[0])
            out = model.apply(
                variables, fmap1, fmap2, cnet1,
                method=lambda m, a, b, c: m.flow_from_features(
                    a, b, c, iters=iters, flow_init=flow_init,
                    test_mode=True))
            Hp, Wp = H + pt + pb, W + pl + pr
            unpad = lambda x: x[:, pt:Hp - pb, pl:Wp - pr]
            flow = unpad(out["flow"])
            occl = unpad(jax.nn.softmax(out["occlusion"], axis=-1)[..., 1])
            sigma = unpad(jnp.sqrt(jnp.exp(out["uncertainty"][..., 0])))
            return flow, occl, sigma

        return fwd

    def _forward_fn(self, B, H, W, with_init, iters_schedule=None):
        """Build + cache the jitted padded-forward for a given shape."""
        key = (B, H, W, with_init, iters_schedule)
        if key in self._jitted:
            return self._jitted[key]
        jitted = jax.jit(self.padded_forward(H, W, iters_schedule))
        self._jitted[key] = jitted
        return jitted

    # ------------------------------------------------------------------ #
    def forward_batch(self, images1, images2, init_flow=None,
                      iters_schedule=None):
        """Batched flow: (N, H, W, 3) RGB float [0,255] -> (flow, occl, sigma).

        returns: flow (N, H, W, 2), occlusion (N, H, W), sigma (N, H, W),
        all on-device.
        """
        N, H, W, _ = images1.shape
        if iters_schedule is not None:
            iters_schedule = tuple(int(i) for i in iters_schedule)
        fwd = self._forward_fn(N, H, W, init_flow is not None, iters_schedule)
        if init_flow is not None:
            return fwd(self.variables, images1, images2, init_flow)
        return fwd(self.variables, images1, images2)

    def compute_flow(self, src_img, dst_img, mode="flow", init_flow=None,
                     numpy_out=False, **_):
        """Single-pair API (reference MFT/raft.py:30-94).

        args:
          src_img, dst_img: (H, W, 3) uint8 BGR images (opencv convention).
          mode: 'flow' (dense) or 'TC' (correspondences).
          init_flow: optional (H, W, 2) flow initialization.

        returns (mode='flow'):
          flow (H, W, 2), {'occlusion': (H, W), 'sigma': (H, W)}
        returns (mode='TC'):
          src_coords (H*W, 2), dst_coords (H*W, 2), extra dict
        """
        H, W = src_img.shape[:2]
        img1 = jnp.asarray(src_img[:, :, ::-1], jnp.float32)[None]
        img2 = jnp.asarray(dst_img[:, :, ::-1], jnp.float32)[None]
        fi = init_flow[None] if init_flow is not None else None
        flow, occl, sigma = self.forward_batch(img1, img2, init_flow=fi)
        flow, occl, sigma = flow[0], occl[0], sigma[0]

        if mode == "flow":
            if numpy_out:
                flow, occl, sigma = map(np.asarray, (flow, occl, sigma))
            return flow, {"occlusion": occl, "sigma": sigma}
        if mode == "TC":
            from mft_tpu.core import grid_coords
            src = grid_coords(H, W).reshape(-1, 2)
            dst = src + flow.reshape(-1, 2)
            extra = {"occlusion": occl.reshape(-1), "sigma": sigma.reshape(-1)}
            if numpy_out:
                src, dst = np.asarray(src), np.asarray(dst)
                extra = {k: np.asarray(v) for k, v in extra.items()}
            return src, dst, extra
        raise ValueError(f"unknown mode {mode!r}")
