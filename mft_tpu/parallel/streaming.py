"""Batched multi-clip dense-tracking throughput mode (pod-slice streaming).

The throughput counterpart of the single-clip MFT tracker: C video clips are
tracked in lockstep; all per-frame work — the (C * n_delta)-pair RAFT
forward, chaining, selection, memory update — is one SPMD program sharded
over the mesh ``data`` axis (clips are embarrassingly parallel, so sharding
the clip axis keeps every collective trivial and every chip dense).

This mode has no equivalent in the reference (it tracks batch-1 frame pairs,
MFT/raft.py:41-45) — it exists to saturate TPU pod slices
(BASELINE.json configs[4]).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mft_tpu.config import cfg_value
from mft_tpu.core.flowou import FlowOU
from mft_tpu.tracker.fused import chain_select
from mft_tpu.tracker.mft import MFT


class StreamingTracker:
    """Track ``n_clips`` equally-sized clips in lockstep.

    API: ``init(frames)`` with (C, H, W, 3) uint8 BGR template frames, then
    ``track(frames)`` per timestep -> batched FlowOU (leading clip axis).
    All clips share the tracker config (deltas, occlusion threshold).
    """

    def __init__(self, config, n_clips, mesh=None):
        self.C = config
        self.n_clips = n_clips
        self.mesh = mesh
        self.flower = config.flow_config.of_class(config.flow_config)
        deltas = list(config.deltas)
        self.deltas = sorted(deltas, key=lambda d: 0 if np.isinf(d) else d)
        finite = [int(d) for d in self.deltas if np.isfinite(d)]
        self.ring = max(finite) if finite else 1
        self.template_slot = self.ring
        self._step = None
        self._single = MFT.__new__(MFT)  # host-side candidate math reuse
        self._single.deltas = self.deltas
        self._single.ring = self.ring
        self._single.template_slot = self.template_slot
        self._single._inf_idx = next((i for i, d in enumerate(self.deltas)
                                      if np.isinf(d)), None)
        self._single.C = config
        self._warm = MFT._warm_start(self._single)
        self._pslot_cache = {}

    def _put(self, x):
        if self.mesh is None:
            return x
        return jax.device_put(x, NamedSharding(self.mesh, P("data")))

    def init(self, frames, start_frame_i=0):
        frames = np.asarray(frames)
        assert frames.shape[0] == self.n_clips
        C, H, W, _ = frames.shape
        assert H % 8 == 0 and W % 8 == 0, \
            "streaming mode expects /8 resolutions (no per-clip padding)"
        self.img_H, self.img_W = H, W
        self.start_frame_i = int(start_frame_i)
        self.current_frame_i = self.start_frame_i
        self._single.start_frame_i = self.start_frame_i
        self._single.time_direction = 1
        imgs = self._to_device(frames)
        S = self.ring + 1
        self.mem_imgs = self._put(
            jnp.zeros((C, S, H, W, 3), imgs.dtype).at[:, self.template_slot].set(imgs))
        self.mem_flow = self._put(jnp.zeros((C, S, H, W, 2), jnp.float32))
        self.mem_occl = self._put(jnp.zeros((C, S, H, W), jnp.float32))
        self.mem_sigma = self._put(jnp.zeros((C, S, H, W), jnp.float32))
        # feature-ring memory (see tracker/mft.py): encode templates once
        self.mem_fmap = self.mem_cnet = None
        if self._use_features():
            enc = self._get_encode()
            fm, cn = enc(self.flower.variables, imgs.astype(jnp.float32))
            self.mem_fmap = self._put(
                jnp.zeros((C, S, *fm.shape[1:]), fm.dtype)
                .at[:, self.template_slot].set(fm))
            self.mem_cnet = self._put(
                jnp.zeros((C, S, *cn.shape[1:]), cn.dtype)
                .at[:, self.template_slot].set(cn))
        return FlowOU(jnp.zeros((C, H, W, 2)), jnp.zeros((C, H, W)),
                      jnp.zeros((C, H, W)))

    def track(self, frames, injected=None):
        """One lockstep timestep over all clips.

        ``injected`` optionally maps candidate-pair index -> per-clip hit
        triple ((C,H,W,2) flow, (C,H,W) occl, (C,H,W) sigma) — the streaming
        counterpart of the single-clip tracker's FlowCache injection
        (tracker/mft.py _get_fused_frame_inject, reference MFT.py:189-230):
        hit pairs skip RAFT, only the remaining pairs (typically just
        delta=inf) are computed, and chaining/selection run over the full
        candidate set. Hit rows sharded over the mesh 'data' axis stay
        sharded through the step.
        """
        self.current_frame_i += 1
        t = self.current_frame_i
        imgs = self._put(self._to_device(np.asarray(frames)))  # (C, H, W, 3)
        cands = self._single._candidates(t)
        slots = jnp.asarray([c.slot for c in cands], jnp.int32)
        valid = jnp.asarray([c.valid for c in cands], bool)
        wslot = jnp.int32(t % self.ring)
        pslot = None
        if self._warm:  # warm-start mode only: cached periodic upload
            pv = (t - 1) % self.ring
            if pv not in self._pslot_cache:
                self._pslot_cache[pv] = jnp.int32(pv)
            pslot = self._pslot_cache[pv]
        if injected:
            if not self._use_features():
                raise NotImplementedError(
                    "streaming injection requires the feature-ring step")
            inj_idx = tuple(sorted(injected))
            compute_idx = tuple(i for i, c in enumerate(cands)
                                if c.valid and i not in injected)
            # shard host-provided rows over the clip axis like every other
            # per-clip input (an unsharded numpy row would be replicated to
            # every device by GSPMD — full payload per device per frame)
            inj_rows = tuple(tuple(self._put(jnp.asarray(r)) for r in
                                   injected[i]) for i in inj_idx)
            step = self._get_step_inject(compute_idx, inj_idx)
            (self.mem_imgs, self.mem_flow, self.mem_occl, self.mem_sigma,
             self.mem_fmap, self.mem_cnet,
             result) = step(self.mem_imgs, self.mem_flow, self.mem_occl,
                            self.mem_sigma, self.mem_fmap, self.mem_cnet,
                            imgs, slots, valid, wslot, inj_rows, pslot,
                            self.flower.variables)
        elif self._use_features():
            step = self._get_step()
            (self.mem_imgs, self.mem_flow, self.mem_occl, self.mem_sigma,
             self.mem_fmap, self.mem_cnet,
             result) = step(self.mem_imgs, self.mem_flow, self.mem_occl,
                            self.mem_sigma, self.mem_fmap, self.mem_cnet,
                            imgs, slots, valid, wslot, pslot,
                            self.flower.variables)
        else:
            step = self._get_step_images()
            (self.mem_imgs, self.mem_flow, self.mem_occl, self.mem_sigma,
             result) = step(self.mem_imgs, self.mem_flow, self.mem_occl,
                            self.mem_sigma, imgs, slots, valid, wslot,
                            self.flower.variables)
        return result

    def _use_features(self):
        return hasattr(self.flower.model, "encode")

    @staticmethod
    def _per_clip_chain(occl_thresh):
        """Single-clip chain+select+ring-update body, vmapped over clips."""
        def per_clip(mem_imgs, mem_flow, mem_occl, mem_sigma, img,
                     flows, occls, sigmas, slots, valid, wslot):
            left = FlowOU(jnp.take(mem_flow, slots, axis=0),
                          jnp.take(mem_occl, slots, axis=0),
                          jnp.take(mem_sigma, slots, axis=0))
            right = FlowOU(flows, occls, sigmas)
            result = chain_select(left, right, valid, occl_thresh)
            mem_imgs = mem_imgs.at[wslot].set(img)
            mem_flow = mem_flow.at[wslot].set(result.flow)
            mem_occl = mem_occl.at[wslot].set(result.occlusion)
            mem_sigma = mem_sigma.at[wslot].set(result.sigma)
            return mem_imgs, mem_flow, mem_occl, mem_sigma, result
        return per_clip

    def _get_encode(self):
        if getattr(self, "_enc", None) is None:
            model = self.flower.model
            self._enc = jax.jit(lambda v, x: model.apply(
                v, 2.0 * (x / 255.0) - 1.0,
                method=lambda m, im: m.encode(im, normalise_input=False)))
        return self._enc

    def _get_step(self):
        if self._step is not None:
            return self._step
        occl_thresh = float(cfg_value(self.C.occlusion_threshold, 0.02))
        n_delta = len(self.deltas)
        model = self.flower.model
        iters = self.flower.iters
        # per-delta iteration schedule (C.flow_iters_schedule, documented
        # speed mode — see tracker/mft.py): the flat clip-major pair batch
        # repeats the per-delta counts once per clip
        sched = MFT._iters_schedule(self._single)
        if sched is not None:
            iters = tuple(sched) * self.n_clips
        # template-pair warm start (C.warm_start_inf, documented speed mode
        # — see tracker/mft.py MFT._warm_start): each clip's delta=inf pair
        # starts from that clip's previous selected flow
        warm = self._warm
        inf_idx = self._single._inf_idx
        per_clip = self._per_clip_chain(occl_thresh)

        def step(mem_imgs, mem_flow, mem_occl, mem_sigma, mem_fmap, mem_cnet,
                 imgs, slots, valid, wslot, pslot, variables):
            C = imgs.shape[0]
            # encode only the C new frames; left features come from the ring
            x = 2.0 * (imgs.astype(jnp.float32) / 255.0) - 1.0
            f_new, c_new = model.apply(
                variables, x,
                method=lambda m, im: m.encode(im, normalise_input=False))
            fmap1 = jax.vmap(lambda m: jnp.take(m, slots, axis=0))(mem_fmap)
            cnet1 = jax.vmap(lambda m: jnp.take(m, slots, axis=0))(mem_cnet)
            fmap2 = jnp.broadcast_to(f_new[:, None], fmap1.shape)
            flat = lambda z: z.reshape(C * n_delta, *z.shape[2:])
            flow_init = None
            if warm:
                from mft_tpu.models.raft.upsample import downsample_flow8
                prev8 = downsample_flow8(mem_flow[:, pslot])  # (C, h8, w8, 2)
                flow_init = flat(jnp.zeros((C, n_delta, *prev8.shape[1:]),
                                           jnp.float32
                                           ).at[:, inf_idx].set(prev8))
            out = model.apply(
                variables, flat(fmap1), flat(fmap2), flat(cnet1),
                method=lambda m, a, b, c: m.flow_from_features(
                    a, b, c, iters=iters, flow_init=flow_init,
                    test_mode=True))
            flow = out["flow"].reshape(C, n_delta, *out["flow"].shape[1:])
            occl = jax.nn.softmax(out["occlusion"], axis=-1)[..., 1].reshape(
                C, n_delta, *out["flow"].shape[1:3])
            sigma = jnp.sqrt(jnp.exp(out["uncertainty"][..., 0])).reshape(
                C, n_delta, *out["flow"].shape[1:3])
            (mem_imgs, mem_flow, mem_occl, mem_sigma, result) = jax.vmap(
                per_clip, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None, None, None))(
                mem_imgs, mem_flow, mem_occl, mem_sigma, imgs,
                flow, occl, sigma, slots, valid, wslot)
            mem_fmap = mem_fmap.at[:, wslot].set(f_new)
            mem_cnet = mem_cnet.at[:, wslot].set(c_new)
            return (mem_imgs, mem_flow, mem_occl, mem_sigma,
                    mem_fmap, mem_cnet, result)

        self._step = jax.jit(step, donate_argnums=(0, 1, 2, 3, 4, 5))
        return self._step

    def _get_step_inject(self, compute_idx, inj_idx):
        """Streaming step with cache-hit injection (static index signature).

        Multi-clip analog of MFT._get_fused_frame_inject: pairs in
        ``inj_idx`` arrive as per-clip row triples, pairs in ``compute_idx``
        run through RAFT (K*C-pair batch), everything else is an invalid
        candidate and gets in-graph zeros. One jitted SPMD dispatch per
        frame; injected rows keep their clip-axis sharding.
        """
        key = ("inject", compute_idx, inj_idx)
        cache = getattr(self, "_inject_cache", None)
        if cache is None:
            cache = self._inject_cache = {}
        if key in cache:
            return cache[key]
        occl_thresh = float(cfg_value(self.C.occlusion_threshold, 0.02))
        n_delta = len(self.deltas)
        model = self.flower.model
        iters = self.flower.iters
        sched = MFT._iters_schedule(self._single)
        K = len(compute_idx)
        if sched is not None and K:
            iters = tuple(sched[i] for i in compute_idx) * self.n_clips
        warm = self._warm and self._single._inf_idx in compute_idx
        inf_pos = (compute_idx.index(self._single._inf_idx)
                   if warm else None)
        idx = jnp.asarray(compute_idx, jnp.int32) if K else None
        pos = {j: p for p, j in enumerate(inj_idx)}
        per_clip = self._per_clip_chain(occl_thresh)

        def step(mem_imgs, mem_flow, mem_occl, mem_sigma, mem_fmap, mem_cnet,
                 imgs, slots, valid, wslot, inj_rows, pslot, variables):
            C = imgs.shape[0]
            x = 2.0 * (imgs.astype(jnp.float32) / 255.0) - 1.0
            f_new, c_new = model.apply(
                variables, x,
                method=lambda m, im: m.encode(im, normalise_input=False))
            H, W = mem_flow.shape[2:4]
            zf = jnp.zeros((C, H, W, 2), jnp.float32)
            zs = jnp.zeros((C, H, W), jnp.float32)
            # (N, C, ...) stacks: injected rows pass through, computed rows
            # scatter in below; stacking happens in-graph (one dispatch)
            flows = jnp.stack([jnp.asarray(inj_rows[pos[i]][0], jnp.float32)
                               if i in pos else zf for i in range(n_delta)])
            occls = jnp.stack([jnp.asarray(inj_rows[pos[i]][1], jnp.float32)
                               if i in pos else zs for i in range(n_delta)])
            sigmas = jnp.stack([jnp.asarray(inj_rows[pos[i]][2], jnp.float32)
                                if i in pos else zs for i in range(n_delta)])
            if K:
                csl = jnp.take(slots, idx)
                fmap1 = jax.vmap(lambda m: jnp.take(m, csl, axis=0))(mem_fmap)
                cnet1 = jax.vmap(lambda m: jnp.take(m, csl, axis=0))(mem_cnet)
                fmap2 = jnp.broadcast_to(f_new[:, None], fmap1.shape)
                flat = lambda z: z.reshape(C * K, *z.shape[2:])
                flow_init = None
                if warm:
                    from mft_tpu.models.raft.upsample import downsample_flow8
                    prev8 = downsample_flow8(mem_flow[:, pslot])
                    flow_init = flat(jnp.zeros((C, K, *prev8.shape[1:]),
                                               jnp.float32
                                               ).at[:, inf_pos].set(prev8))
                out = model.apply(
                    variables, flat(fmap1), flat(fmap2), flat(cnet1),
                    method=lambda m, a, b, c: m.flow_from_features(
                        a, b, c, iters=iters, flow_init=flow_init,
                        test_mode=True))
                h, w = out["flow"].shape[1:3]
                cf = out["flow"].reshape(C, K, h, w, 2)
                co = jax.nn.softmax(out["occlusion"], axis=-1)[..., 1
                                                               ].reshape(C, K, h, w)
                cs = jnp.sqrt(jnp.exp(out["uncertainty"][..., 0])).reshape(
                    C, K, h, w)
                flows = flows.at[idx].set(jnp.moveaxis(cf, 0, 1))
                occls = occls.at[idx].set(jnp.moveaxis(co, 0, 1))
                sigmas = sigmas.at[idx].set(jnp.moveaxis(cs, 0, 1))
            (mem_imgs, mem_flow, mem_occl, mem_sigma, result) = jax.vmap(
                per_clip, in_axes=(0, 0, 0, 0, 0, 1, 1, 1, None, None, None))(
                mem_imgs, mem_flow, mem_occl, mem_sigma, imgs,
                flows, occls, sigmas, slots, valid, wslot)
            mem_fmap = mem_fmap.at[:, wslot].set(f_new)
            mem_cnet = mem_cnet.at[:, wslot].set(c_new)
            return (mem_imgs, mem_flow, mem_occl, mem_sigma,
                    mem_fmap, mem_cnet, result)

        cache[key] = jax.jit(step, donate_argnums=(0, 1, 2, 3, 4, 5))
        return cache[key]

    def _get_step_images(self):
        """Image-based step (no feature ring) for flow backends without an
        ``encode`` method (e.g. test fakes): full pair-batched forward."""
        if getattr(self, "_step_img", None) is not None:
            return self._step_img
        if self.C.flow_iters_schedule or self._warm:
            # this path bakes the uniform zero-init iteration count into the
            # jitted step; silently dropping a configured schedule or
            # warm-start mode would measure a mode the config does not
            # describe
            raise NotImplementedError(
                "flow_iters_schedule/warm_start_inf require the feature-ring "
                "streaming step (a flow backend with encode()); this backend "
                "has none")
        occl_thresh = float(cfg_value(self.C.occlusion_threshold, 0.02))
        n_delta = len(self.deltas)
        model = self.flower.model
        iters = self.flower.iters
        per_clip = self._per_clip_chain(occl_thresh)

        def step(mem_imgs, mem_flow, mem_occl, mem_sigma, imgs, slots, valid,
                 wslot, variables):
            C = imgs.shape[0]
            left_imgs = jax.vmap(lambda m: jnp.take(m, slots, axis=0))(mem_imgs)
            right_imgs = jnp.broadcast_to(imgs[:, None], left_imgs.shape)
            flat = lambda x: x.reshape(C * n_delta, *x.shape[2:])
            out = model.apply(variables, flat(left_imgs), flat(right_imgs),
                              iters=iters, test_mode=True)
            flow = out["flow"].reshape(C, n_delta, *out["flow"].shape[1:])
            occl = jax.nn.softmax(out["occlusion"], axis=-1)[..., 1].reshape(
                C, n_delta, *out["flow"].shape[1:3])
            sigma = jnp.sqrt(jnp.exp(out["uncertainty"][..., 0])).reshape(
                C, n_delta, *out["flow"].shape[1:3])
            return jax.vmap(per_clip, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None,
                                               None, None))(
                mem_imgs, mem_flow, mem_occl, mem_sigma, imgs,
                flow, occl, sigma, slots, valid, wslot)

        self._step_img = jax.jit(step, donate_argnums=(0, 1, 2, 3))
        return self._step_img

    @staticmethod
    def _to_device(frames):
        """(C, H, W, 3) uint8 BGR -> uint8 RGB device array (f32 passthrough)."""
        if frames.dtype == np.uint8:
            frames = np.ascontiguousarray(frames[..., ::-1])
        return jnp.asarray(frames)
