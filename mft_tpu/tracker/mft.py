"""The MFT tracker: per-frame delta chaining, selection, and memory.

API parity with the reference tracker (MFT/MFT.py:13-185):
``MFT(config)``, ``init(img, start_frame_i, time_direction, flow_cache)``,
``track(input_img)`` -> meta namespace with a FlowOU in ``meta.result``.
Images are opencv-style (H, W, 3) uint8 BGR numpy arrays.

TPU-first redesign (see package docstring):
- device-resident memory: a (ring+1, H, W, ...) slot array (ring slots for
  the last ``max_finite_delta`` frames + one template slot) replaces the
  Python dict + cleanup_memory logic (reference MFT.py:42-47, 157-181);
- per-frame left-id/dedup/validity logic runs on host over python ints
  (reference MFT.py:77-91) and feeds the device step as slot indices + a
  validity mask — the device graph is static;
- ALL delta candidates are processed in one batched RAFT forward and one
  jitted chain+select+update step with donated memory buffers (no per-pair
  .cuda()/.cpu() hops, reference MFT/raft.py:45, MFT.py:148).

Flow caching (reference get_flowou_with_cache, MFT.py:189-230): pairwise
flows are keyed (left_id, right_id) and so reusable across start-frames and
query modes in TAP-Vid runs. We read per-pair; if every finite-delta pair
hits, only the non-cacheable pairs (delta=inf unless C.cache_delta_infinity)
are recomputed; any finite miss triggers one full-batch forward + cache write.
"""

import dataclasses
import logging
from functools import partial
from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp

from mft_tpu.config import cfg_value
from mft_tpu.core.flowou import FlowOU, identity_flowou
from mft_tpu.tracker.fused import chain_select, chain_select_ref

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class _Candidate:
    delta: float
    left_id: int
    slot: int
    valid: bool
    cacheable: bool


class MFT:
    """Multi-Flow dense Tracker (TPU-native)."""

    def __init__(self, config):
        self.C = config  # must be named self.C, may be monkeypatched by runners
        deltas = list(config.deltas)
        self.deltas = sorted(deltas, key=lambda d: 0 if np.isinf(d) else d)
        finite = [int(d) for d in self.deltas if np.isfinite(d)]
        self.ring = max(finite) if finite else 1
        self.template_slot = self.ring  # memory slot layout: [0..ring-1] + template
        self._inf_idx = next((i for i, d in enumerate(self.deltas)
                              if np.isinf(d)), None)
        self._step_fn = None
        # validate the pure-config invariant BEFORE the expensive model
        # construction below
        if self._warm_start() and bool(self.C.cache_delta_infinity):
            raise ValueError(
                "warm_start_inf and cache_delta_infinity cannot be combined: "
                "warm-started template flows depend on the tracking history "
                "that produced them, so they are not reusable cache entries")
        self.flower = config.flow_config.of_class(config.flow_config)
        # C.exact_chain: force the exact jnp chain+select implementation
        # (chain_select_ref) instead of the TPU Pallas path — the oracle
        # side of the TPU-path drift measurement (tools/tpu_drift.py)
        self._chain_fn = (chain_select_ref if bool(self.C.exact_chain)
                          else chain_select)

    def _warm_start(self):
        """Documented non-default speed/accuracy mode (``C.warm_start_inf``):
        initialize the template (delta=inf) pair's RAFT iterations from the
        previous frame's selected flow instead of zero — the reference's own
        video warm-start mechanism (MFT/RAFT/core/raft.py flow_init +
        MFT/raft.py:98-101) applied to the one pair whose left frame never
        changes. flow(template->t-1) is within one frame of motion of
        flow(template->t), so the pair converges in far fewer GRU iterations
        — and on long sequences a large-displacement template pair gets an
        init that 12 zero-start iterations may never reach. Default configs
        keep the reference's zero init.
        """
        return bool(self.C.warm_start_inf) and self._inf_idx is not None

    def _prev_slot(self, t):
        """Ring slot holding the previous frame's selected flow, cached.

        Frame ``t - time_direction`` was written at slot ``(t - td) % ring``
        one step ago; on the first tracked frame that slot is still the
        zero init — exactly the identity flow of the template frame.
        """
        key = ("pslot", (t - self.time_direction) % self.ring)
        cache = getattr(self, "_idx_cache", None)
        if cache is None:
            cache = self._idx_cache = {}
        if key not in cache:
            cache[key] = jnp.int32(key[1])
        return cache[key]

    # ------------------------------------------------------------------ #
    def init(self, img, start_frame_i=0, time_direction=1, flow_cache=None, **kwargs):
        """Initialize tracking on the template frame.

        Reference parity: MFT/MFT.py:22-53.
        """
        assert time_direction in (+1, -1)
        self.img_H, self.img_W = img.shape[:2]
        self.start_frame_i = int(start_frame_i)
        self.current_frame_i = self.start_frame_i
        self.time_direction = int(time_direction)
        self.flow_cache = flow_cache

        H, W, S = self.img_H, self.img_W, self.ring + 1
        img_d = self._to_device(img)
        self.mem_imgs = jnp.zeros((S, H, W, 3), img_d.dtype).at[self.template_slot].set(img_d)
        self.mem_flow = jnp.zeros((S, H, W, 2), jnp.float32)
        self.mem_occl = jnp.zeros((S, H, W), jnp.float32)
        self.mem_sigma = jnp.zeros((S, H, W), jnp.float32)
        self.mem_fmap = self.mem_cnet = None

        if self._use_fused():
            # feature-ring memory: encode the template once; later frames
            # encode only themselves (see _get_fused_frame)
            enc = self._get_encode()
            fm, cn = enc(self.flower.variables,
                         img_d[None].astype(jnp.float32))
            self.mem_fmap = jnp.zeros((S, *fm.shape[1:]), fm.dtype
                                      ).at[self.template_slot].set(fm[0])
            self.mem_cnet = jnp.zeros((S, *cn.shape[1:]), cn.dtype
                                      ).at[self.template_slot].set(cn[0])

        meta = SimpleNamespace()
        meta.result = identity_flowou((H, W))
        return meta

    def _use_fused(self):
        # the fused fast path also runs under a FlowCache (cache reads are
        # injected as device arrays, computed pairs written back — see
        # _track_fused_cached); only the phase-timer mode needs the
        # unfused path's per-phase sync points
        return (not bool(self.C.timers_enabled)
                and hasattr(self.flower, "features_forward"))

    def _iters_schedule(self):
        """Per-pair GRU iteration counts from ``C.flow_iters_schedule``.

        None (the default) keeps the reference-parity uniform iteration
        count. A config may set a mapping {delta: iters} (``float('inf')``
        or ``'inf'`` keys the template pair; missing deltas fall back to
        ``flow_config.flow_iters``) or a sequence aligned with the sorted
        delta order. Returns a tuple aligned with ``self.deltas`` — the
        batch order of the fused frame step. Documented speed mode: see
        RAFT._flow_scheduled.
        """
        sched = self.C.flow_iters_schedule
        if not sched:
            return None
        default = int(self.C.flow_config.flow_iters or 12)
        if hasattr(sched, "items"):
            def match(d):
                for k, it in sched.items():
                    if isinstance(k, str):
                        if k == "inf" and np.isinf(d):
                            return int(it)
                    elif np.isinf(k) and np.isinf(d):
                        return int(it)
                    elif np.isfinite(k) and np.isfinite(d) and float(k) == float(d):
                        return int(it)
                return default
            return tuple(match(d) for d in self.deltas)
        out = tuple(int(i) for i in sched)
        if len(out) != len(self.deltas):
            raise ValueError(
                f"flow_iters_schedule len {len(out)} != {len(self.deltas)} deltas")
        return out

    def _features_fwd(self, compute_idx=None):
        """Build the flower's features->flow closure for the configured mode.

        Collects the non-default kwargs (iteration schedule, warm-start init
        slot) in ONE place for the frame/chunk/inject builders; fake/test
        flow backends implement only the plain ``features_forward(H, W)``
        signature, so defaults are never passed explicitly.

        ``compute_idx`` (inject variant): the static candidate subset that
        runs through RAFT — the schedule is sliced to it and the init slot
        indexes the SUBSET batch. Returns ``(fwd, warm)`` where ``warm``
        says whether the closure takes a warm-start init argument.
        """
        sched = self._iters_schedule()
        warm = self._warm_start()
        kw = {}
        if compute_idx is None:
            if sched is not None:
                kw["iters_schedule"] = sched
            if warm:
                kw["init_slot"] = self._inf_idx
        else:
            warm = warm and self._inf_idx in compute_idx
            if sched is not None:
                kw["iters_schedule"] = tuple(sched[i] for i in compute_idx)
            if warm:
                kw["init_slot"] = compute_idx.index(self._inf_idx)
        return (self.flower.features_forward(self.img_H, self.img_W, **kw),
                warm)

    def _get_encode(self):
        key = ("enc", self.img_H, self.img_W)
        cache = getattr(self, "_fused_frame_fns", None)
        if cache is None:
            cache = self._fused_frame_fns = {}
        if key not in cache:
            cache[key] = jax.jit(
                self.flower.padded_encode(self.img_H, self.img_W))
        return cache[key]

    # ------------------------------------------------------------------ #
    def track(self, input_img, **kwargs):
        """Track one frame; returns meta.result = FlowOU template->current.

        Reference parity: MFT/MFT.py:55-154.
        """
        from mft_tpu.utils.timing import general_time_measurer
        timers_on = bool(self.C.timers_enabled)
        sync = (lambda: jax.block_until_ready(self.mem_flow)) if timers_on else None

        self.current_frame_i += self.time_direction
        t = self.current_frame_i
        img = self._to_device(input_img)

        cands = self._candidates(t)
        if self._use_fused() and self.mem_fmap is not None:
            # fast path: the WHOLE frame (one-image encode into the
            # feature ring + batched flow-from-features + chain/select +
            # memory update) is ONE jitted call — per-op dispatch through a
            # remote device tunnel costs milliseconds, and cached features
            # mean 1 fnet + 1 cnet pass per frame instead of 14 + 7
            if self.flow_cache is not None:
                return self._track_fused_cached(img, cands, t)
            slots, valid, wslot = self._step_indices(cands, t)
            pslot = self._prev_slot(t) if self._warm_start() else None
            step = self._get_fused_frame()
            (self.mem_imgs, self.mem_flow, self.mem_occl, self.mem_sigma,
             self.mem_fmap, self.mem_cnet,
             result) = step(self.flower.variables, self.mem_imgs,
                            self.mem_flow, self.mem_occl, self.mem_sigma,
                            self.mem_fmap, self.mem_cnet,
                            img, slots, valid, wslot, pslot)
            meta = SimpleNamespace()
            meta.result = result
            return meta
        flow_timer = general_time_measurer("flow+chain", active=timers_on,
                                           device_sync_fn=sync, start_now=True)
        flows, occls, sigmas = self._acquire_flows(img, cands, t)
        if timers_on:
            jax.block_until_ready(flows)
        flow_timer.stop()

        slots, valid, wslot = self._step_indices(cands, t)

        sel_timer = general_time_measurer("selection", active=timers_on,
                                          start_now=True)
        step = self._get_step()
        (self.mem_imgs, self.mem_flow, self.mem_occl, self.mem_sigma,
         result) = step(self.mem_imgs, self.mem_flow, self.mem_occl,
                        self.mem_sigma, img, flows, occls, sigmas,
                        slots, valid, wslot,
                        )
        if timers_on:
            jax.block_until_ready(result.flow)
        sel_timer.stop()
        flow_timer.report("sum")
        sel_timer.report("sum")

        meta = SimpleNamespace()
        meta.result = result
        return meta

    def _step_indices(self, cands, t):
        """Device arrays (slots, valid, wslot) for the frame step, cached.

        The pattern is periodic in t (period = ring size in steady state),
        so after the first cycle no host->device index uploads happen —
        through a remote device tunnel each tiny upload costs real latency.
        """
        key = (tuple(c.slot for c in cands), tuple(c.valid for c in cands),
               t % self.ring)
        cache = getattr(self, "_idx_cache", None)
        if cache is None:
            cache = self._idx_cache = {}
        if key not in cache:
            cache[key] = (jnp.asarray(key[0], jnp.int32),
                          jnp.asarray(key[1], bool),
                          jnp.int32(key[2]))
        return cache[key]

    # ------------------------------------------------------------------ #
    def is_before_start(self, frame_i):
        return ((self.time_direction > 0 and frame_i < self.start_frame_i)
                or (self.time_direction < 0 and frame_i > self.start_frame_i))

    def _candidates(self, t):
        """Host-side per-delta slot/validity computation (MFT.py:74-102)."""
        out = []
        cache_inf = bool(self.C.cache_delta_infinity)
        for delta in self.deltas:
            if np.isinf(delta):
                out.append(_Candidate(delta, self.start_frame_i,
                                      self.template_slot, True, cache_inf))
                continue
            li = t - int(delta) * self.time_direction
            if self.is_before_start(li):
                out.append(_Candidate(delta, li, self.template_slot, False, False))
            elif li == self.start_frame_i:
                out.append(_Candidate(delta, li, self.template_slot, True, True))
            else:
                out.append(_Candidate(delta, li, li % self.ring, True, True))
        return out

    def _read_cache_hits(self, cands, t):
        """One cache policy for both tracking paths: read every valid
        cacheable candidate; report whether ALL valid finite-delta pairs hit
        (the condition for skipping the full-batch forward)."""
        cache = self.flow_cache
        cached = {}
        if cache is not None:
            for i, c in enumerate(cands):
                if c.valid and c.cacheable:
                    hit = cache.read(c.left_id, t)
                    if hit is not None:
                        cached[i] = hit
        finite_valid = [i for i, c in enumerate(cands)
                        if c.valid and np.isfinite(c.delta)]
        all_finite_hit = (cache is not None
                          and all(i in cached for i in finite_valid))
        return cached, all_finite_hit

    def _acquire_flows(self, img, cands, t):
        """Pairwise flows for all candidates: cache reads + batched compute."""
        N = len(cands)
        cache = self.flow_cache
        cached, all_finite_hit = self._read_cache_hits(cands, t)

        if all_finite_hit:
            compute_idx = [i for i, c in enumerate(cands)
                           if c.valid and i not in cached]
        else:
            # compute the FULL candidate batch, invalid slots included (they
            # read the template slot and are masked in selection) — a single
            # static batch shape means ONE compiled RAFT forward, instead of
            # one recompilation per distinct frame-age validity pattern
            compute_idx = list(range(N))

        comp = {}
        if compute_idx:
            slots = jnp.asarray([cands[i].slot for i in compute_idx], jnp.int32)
            left = jnp.take(self.mem_imgs, slots, axis=0)
            right = jnp.broadcast_to(img, (len(compute_idx), *img.shape))
            # honor the per-delta iteration schedule and the warm-start mode
            # on this (unfused) path too — the profile/timer mode must
            # measure the configured mode, and cached flows must match the
            # flow setup that keys them (eval/runner.py _flow_identity)
            sched = self._iters_schedule()
            init_flow = None
            if self._warm_start() and self._inf_idx in compute_idx:
                H, W = self.img_H, self.img_W
                prev = self.mem_flow[(t - self.time_direction) % self.ring]
                pos = compute_idx.index(self._inf_idx)
                init_flow = jnp.zeros((len(compute_idx), H, W, 2),
                                      jnp.float32).at[pos].set(prev)
            kwargs = {}
            if sched is not None:
                kwargs["iters_schedule"] = tuple(sched[i] for i in compute_idx)
            if init_flow is not None:
                kwargs["init_flow"] = init_flow
            if kwargs:
                f, o, s = self.flower.forward_batch(left, right, **kwargs)
            else:  # plain call: fake/test flow backends need no kwarg
                f, o, s = self.flower.forward_batch(left, right)
            for k, i in enumerate(compute_idx):
                comp[i] = (f[k], o[k], s[k])
                c = cands[i]
                if (cache is not None and c.valid and c.cacheable
                        and i not in cached):
                    cache.write(c.left_id, t, f[k], o[k], s[k])

        H, W = self.img_H, self.img_W
        zero = (jnp.zeros((H, W, 2), jnp.float32), jnp.zeros((H, W), jnp.float32),
                jnp.zeros((H, W), jnp.float32))
        per = [comp.get(i, None) or cached.get(i, None) or zero for i in range(N)]
        flows = jnp.stack([jnp.asarray(p[0]) for p in per])
        occls = jnp.stack([jnp.asarray(p[1]) for p in per])
        sigmas = jnp.stack([jnp.asarray(p[2]) for p in per])
        return flows, occls, sigmas

    def _track_fused_cached(self, img, cands, t):
        """Fused frame step honoring a FlowCache (reference MFT.py:189-230).

        Cache reads happen host-side; hits are injected into the jitted step
        as device arrays. If every valid finite-delta pair hits, only the
        non-hit pairs (typically just delta=inf) run through RAFT — via a
        statically-shaped injection variant. Any finite miss triggers the
        full-batch variant (one static shape, same policy as the unfused
        path), and computed cacheable pairs are written back.
        """
        cache = self.flow_cache
        N = len(cands)
        cached, all_finite_hit = self._read_cache_hits(cands, t)

        slots, valid, wslot = self._step_indices(cands, t)
        pslot = self._prev_slot(t) if self._warm_start() else None

        if not all_finite_hit:
            # full-batch compute (computed values win over stale hits, same
            # as the unfused path); write back every cacheable miss
            step = self._get_fused_frame(pairwise_out=True)
            (self.mem_imgs, self.mem_flow, self.mem_occl, self.mem_sigma,
             self.mem_fmap, self.mem_cnet, result, rows) = step(
                self.flower.variables, self.mem_imgs, self.mem_flow,
                self.mem_occl, self.mem_sigma, self.mem_fmap, self.mem_cnet,
                img, slots, valid, wslot, pslot)
            for i, c in enumerate(cands):
                if c.valid and c.cacheable and i not in cached:
                    # pre-split device rows: the cache's device tier keeps
                    # them in HBM (spilling to RAM/disk converts then) — a
                    # np.asarray here would fetch ~4 MB/pair to host per frame
                    cache.write(c.left_id, t, *rows[i])
        else:
            compute_idx = tuple(i for i, c in enumerate(cands)
                                if c.valid and i not in cached)
            inj_idx = tuple(sorted(cached))
            # hit triples go in as a pytree: device-tier rows pass through
            # untouched, RAM/disk-tier hits upload as call args; the zero
            # rows for invalid candidates and ALL stacking happen in-graph
            # (host-side zeros + stacks used to cost 5 dispatches per frame)
            inj_rows = tuple(cached[i] for i in inj_idx)
            step = self._get_fused_frame_inject(compute_idx, inj_idx)
            (self.mem_imgs, self.mem_flow, self.mem_occl, self.mem_sigma,
             self.mem_fmap, self.mem_cnet, result, comp_rows) = step(
                self.flower.variables, self.mem_imgs, self.mem_flow,
                self.mem_occl, self.mem_sigma, self.mem_fmap, self.mem_cnet,
                img, slots, valid, wslot, inj_rows, pslot)
            for p, i in enumerate(compute_idx):
                c = cands[i]
                if c.cacheable:
                    cache.write(c.left_id, t, *comp_rows[p])

        meta = SimpleNamespace()
        meta.result = result
        return meta

    # ------------------------------------------------------------------ #
    def _frame_fn_cache(self):
        cache = getattr(self, "_fused_frame_fns", None)
        if cache is None:
            cache = self._fused_frame_fns = {}
        return cache

    def _fused_frame_body(self, enc, fwd, occl_thresh, variables, mems,
                          img, slots, valid, wslot, pslot=None):
        """One fused frame: encode-new + batched forward + chain/select +
        ring update. Shared by the single-frame, chunked, and cache-write
        jitted entry points — pure function of (mems, img, indices).

        ``pslot`` (warm-start mode only): ring slot of the previous frame's
        selected flow, fed as the template pair's RAFT init (_warm_start).
        """
        mem_imgs, mem_flow, mem_occl, mem_sigma, mem_fmap, mem_cnet = mems
        N = len(self.deltas)
        # encode ONLY the new frame; every left frame's features are
        # already in the ring (they were the current frame once)
        f_new, c_new = enc(variables, img[None].astype(jnp.float32))
        fmap1 = jnp.take(mem_fmap, slots, axis=0)
        cnet1 = jnp.take(mem_cnet, slots, axis=0)
        fmap2 = jnp.broadcast_to(f_new, (N, *f_new.shape[1:]))
        if pslot is not None:
            flows, occls, sigmas = fwd(variables, fmap1, fmap2, cnet1,
                                       mem_flow[pslot])
        else:
            flows, occls, sigmas = fwd(variables, fmap1, fmap2, cnet1)
        left = FlowOU(flow=jnp.take(mem_flow, slots, axis=0),
                      occlusion=jnp.take(mem_occl, slots, axis=0),
                      sigma=jnp.take(mem_sigma, slots, axis=0))
        right = FlowOU(flow=flows, occlusion=occls, sigma=sigmas)
        result = self._chain_fn(left, right, valid, occl_thresh)
        mem_imgs = mem_imgs.at[wslot].set(img)
        mem_flow = mem_flow.at[wslot].set(result.flow)
        mem_occl = mem_occl.at[wslot].set(result.occlusion)
        mem_sigma = mem_sigma.at[wslot].set(result.sigma)
        mem_fmap = mem_fmap.at[wslot].set(f_new[0])
        mem_cnet = mem_cnet.at[wslot].set(c_new[0])
        mems = (mem_imgs, mem_flow, mem_occl, mem_sigma, mem_fmap, mem_cnet)
        return mems, result, (flows, occls, sigmas)

    def _get_fused_frame(self, pairwise_out=False):
        """One jitted function for a full fused frame (see track()).

        ``pairwise_out=True`` additionally returns the per-candidate pairwise
        (flow, occl, sigma) as N per-row triples so cacheable pairs can be
        written back to a FlowCache. The rows are split INSIDE the jitted
        call: slicing the stacked output host-side would dispatch 3N extra
        device ops per frame, and through a remote device tunnel each
        dispatch costs ~10 ms — that overhead alone held the cold-cache
        runner at 3 FPS (tools/runner_throughput.py, round 3).
        """
        sched = self._iters_schedule()
        warm = self._warm_start()
        key = (self.img_H, self.img_W, pairwise_out, sched, warm)
        cache = self._frame_fn_cache()
        if key in cache:
            return cache[key]
        occl_thresh = float(cfg_value(self.C.occlusion_threshold, 0.02))
        enc = self.flower.padded_encode(self.img_H, self.img_W)
        fwd, warm = self._features_fwd()

        @partial(jax.jit, donate_argnums=(1, 2, 3, 4, 5, 6))
        def frame(variables, mem_imgs, mem_flow, mem_occl, mem_sigma,
                  mem_fmap, mem_cnet, img, slots, valid, wslot, pslot=None):
            mems = (mem_imgs, mem_flow, mem_occl, mem_sigma,
                    mem_fmap, mem_cnet)
            mems, result, pairwise = self._fused_frame_body(
                enc, fwd, occl_thresh, variables, mems, img, slots, valid,
                wslot, pslot=pslot if warm else None)
            out = mems + (result,)
            if pairwise_out:
                fl, oc, si = pairwise
                out = out + (tuple((fl[i], oc[i], si[i])
                                   for i in range(len(self.deltas))),)
            return out

        cache[key] = frame
        return frame

    def _get_fused_chunk(self, K, pairwise_out=False):
        """Jitted K-frame step: K fused frames unrolled into ONE dispatch.

        Through a remote device tunnel every jitted dispatch costs
        milliseconds of host-side latency (arg flattening + transport);
        amortizing it over K frames is free throughput. Math is identical
        to K sequential _get_fused_frame calls (same body, chained memory).

        ``pairwise_out=True`` additionally returns, per frame, the N
        per-candidate (flow, occl, sigma) row triples — pre-split in-graph —
        so a cold-cache pass can write every pairwise flow back to a
        FlowCache without per-row host-side slice dispatches.
        """
        sched = self._iters_schedule()
        warm = self._warm_start()
        key = (self.img_H, self.img_W, "chunk", K, sched, warm, pairwise_out)
        cache = self._frame_fn_cache()
        if key in cache:
            return cache[key]
        occl_thresh = float(cfg_value(self.C.occlusion_threshold, 0.02))
        enc = self.flower.padded_encode(self.img_H, self.img_W)
        fwd, warm = self._features_fwd()
        N = len(self.deltas)

        @partial(jax.jit, donate_argnums=(1, 2, 3, 4, 5, 6))
        def chunk(variables, mem_imgs, mem_flow, mem_occl, mem_sigma,
                  mem_fmap, mem_cnet, imgs, slots, valid, wslots,
                  pslots=None):
            mems = (mem_imgs, mem_flow, mem_occl, mem_sigma,
                    mem_fmap, mem_cnet)
            results = []
            rows_k = []
            for k in range(K):
                mems, result, pairwise = self._fused_frame_body(
                    enc, fwd, occl_thresh, variables, mems, imgs[k],
                    slots[k], valid[k], wslots[k],
                    pslot=pslots[k] if warm else None)
                results.append(result)
                if pairwise_out:
                    fl, oc, si = pairwise
                    rows_k.append(tuple((fl[i], oc[i], si[i])
                                        for i in range(N)))
            stacked = FlowOU(
                flow=jnp.stack([r.flow for r in results]),
                occlusion=jnp.stack([r.occlusion for r in results]),
                sigma=jnp.stack([r.sigma for r in results]))
            out = mems + (stacked,)
            if pairwise_out:
                out = out + (tuple(rows_k),)
            return out

        cache[key] = chunk
        return chunk

    def track_chunk(self, imgs, **kwargs):
        """Track ``len(imgs)`` frames in one jitted dispatch.

        Semantically identical to calling :meth:`track` once per frame (the
        device graph is the same frame body unrolled); returns a list of
        per-frame metas whose ``result`` views lazily slice the stacked
        device output. Falls back to per-frame tracking when the fused path
        is unavailable, or when an attached FlowCache holds a hit for any
        pair in the chunk (a cold cache chunks fine — every pairwise flow is
        computed from ring memory exactly as per-frame tracking would — and
        the computed rows are written back; mixed hit/miss frames need the
        per-frame injection machinery).
        """
        stacked_in = None
        if isinstance(imgs, jnp.ndarray) and imgs.ndim == 4:
            stacked_in = imgs          # pre-staged (K, H, W, 3) device batch
            imgs = [imgs[k] for k in range(imgs.shape[0])]
        else:
            imgs = list(imgs)
        if (not self._use_fused() or self.mem_fmap is None
                or len(imgs) == 0):
            return [self.track(im, **kwargs) for im in imgs]
        K = len(imgs)
        td = self.time_direction
        t0 = self.current_frame_i
        ts = [t0 + (k + 1) * td for k in range(K)]
        cands_k = [self._candidates(t) for t in ts]
        write_cache = self.flow_cache is not None
        if write_cache:
            # existence-only probe: a real read here would decompress and
            # promote RAM/disk hits whose payloads the per-frame fallback
            # then re-reads anyway (every warm-pass entry paid twice)
            if any(self.flow_cache.contains(c.left_id, t)
                   for ck, t in zip(cands_k, ts)
                   for c in ck if c.valid and c.cacheable):
                return [self.track(im, **kwargs) for im in imgs]
        key = tuple((tuple(c.slot for c in ck), tuple(c.valid for c in ck),
                     t % self.ring) for ck, t in zip(cands_k, ts))
        cache = getattr(self, "_idx_cache", None)
        if cache is None:
            cache = self._idx_cache = {}
        if key not in cache:
            cache[key] = (
                jnp.asarray([k[0] for k in key], jnp.int32),
                jnp.asarray([k[1] for k in key], bool),
                jnp.asarray([k[2] for k in key], jnp.int32))
        slots, valid, wslots = cache[key]

        if stacked_in is not None:
            imgs_d = stacked_in
        elif isinstance(imgs[0], jnp.ndarray):
            imgs_d = jnp.stack(imgs)
        else:
            imgs_d = jnp.asarray(np.stack([
                np.ascontiguousarray(im[:, :, ::-1]) if im.dtype == np.uint8
                else im for im in imgs]))

        pslots = None
        if self._warm_start():
            # periodic in t like slots/valid/wslots: cache the upload
            pkey = ("pslots",) + key
            if pkey not in cache:
                cache[pkey] = jnp.asarray(
                    [(t - self.time_direction) % self.ring for t in ts],
                    jnp.int32)
            pslots = cache[pkey]
        step = self._get_fused_chunk(K, pairwise_out=write_cache)
        out = step(
            self.flower.variables, self.mem_imgs, self.mem_flow,
            self.mem_occl, self.mem_sigma, self.mem_fmap, self.mem_cnet,
            imgs_d, slots, valid, wslots, pslots)
        (self.mem_imgs, self.mem_flow, self.mem_occl, self.mem_sigma,
         self.mem_fmap, self.mem_cnet, stacked) = out[:7]
        if write_cache:
            for k, (ck, t) in enumerate(zip(cands_k, ts)):
                for i, c in enumerate(ck):
                    if c.valid and c.cacheable:
                        self.flow_cache.write(c.left_id, t, *out[7][k][i])
        self.current_frame_i = ts[-1]
        metas = []
        for k in range(K):
            meta = SimpleNamespace()
            meta.result = FlowOU(flow=stacked.flow[k],
                                 occlusion=stacked.occlusion[k],
                                 sigma=stacked.sigma[k])
            metas.append(meta)
        return metas

    def _get_fused_frame_inject(self, compute_idx, inj_idx):
        """Fused frame variant with host-injected pairwise flows.

        ``compute_idx`` (static tuple) lists the candidate indices that must
        run through RAFT; ``inj_idx`` (static tuple) the indices whose
        pairwise flow arrives as a cache-hit row triple. Indices in neither
        set are invalid candidates and get in-graph zeros. Typically
        compute_idx is (0,) — just the non-cacheable delta=inf pair — or ()
        when everything hit, making a warm-cache frame RAFT-free.

        The injected rows are stacked and the computed rows split INSIDE the
        jitted call (one dispatch per frame total; host-side zeros/stack/
        slice ops each cost a ~10 ms dispatch through a remote tunnel).
        """
        sched = self._iters_schedule()
        warm = self._warm_start() and self._inf_idx in compute_idx
        key = (self.img_H, self.img_W, "inject", compute_idx, inj_idx,
               sched, warm)
        cache = self._frame_fn_cache()
        if key in cache:
            return cache[key]
        occl_thresh = float(cfg_value(self.C.occlusion_threshold, 0.02))
        enc = self.flower.padded_encode(self.img_H, self.img_W)
        fwd, warm = self._features_fwd(compute_idx)
        idx = jnp.asarray(compute_idx, jnp.int32)
        K = len(compute_idx)
        N = len(self.deltas)
        pos = {j: p for p, j in enumerate(inj_idx)}

        @partial(jax.jit, donate_argnums=(1, 2, 3, 4, 5, 6))
        def frame(variables, mem_imgs, mem_flow, mem_occl, mem_sigma,
                  mem_fmap, mem_cnet, img, slots, valid, wslot,
                  inj_rows, pslot=None):
            f_new, c_new = enc(variables, img[None].astype(jnp.float32))
            H, W = mem_flow.shape[1:3]
            zf = jnp.zeros((H, W, 2), jnp.float32)
            zs = jnp.zeros((H, W), jnp.float32)
            flows = jnp.stack([
                jnp.asarray(inj_rows[pos[i]][0], jnp.float32)
                if i in pos else zf for i in range(N)])
            occls = jnp.stack([
                jnp.asarray(inj_rows[pos[i]][1], jnp.float32)
                if i in pos else zs for i in range(N)])
            sigmas = jnp.stack([
                jnp.asarray(inj_rows[pos[i]][2], jnp.float32)
                if i in pos else zs for i in range(N)])
            comp_rows = ()
            if K:
                fmap1 = jnp.take(mem_fmap, jnp.take(slots, idx), axis=0)
                cnet1 = jnp.take(mem_cnet, jnp.take(slots, idx), axis=0)
                fmap2 = jnp.broadcast_to(f_new, (K, *f_new.shape[1:]))
                if warm:
                    cf, co, cs = fwd(variables, fmap1, fmap2, cnet1,
                                     mem_flow[pslot])
                else:
                    cf, co, cs = fwd(variables, fmap1, fmap2, cnet1)
                flows = flows.at[idx].set(cf)
                occls = occls.at[idx].set(co)
                sigmas = sigmas.at[idx].set(cs)
                comp_rows = tuple((cf[p], co[p], cs[p]) for p in range(K))
            left = FlowOU(flow=jnp.take(mem_flow, slots, axis=0),
                          occlusion=jnp.take(mem_occl, slots, axis=0),
                          sigma=jnp.take(mem_sigma, slots, axis=0))
            right = FlowOU(flow=flows, occlusion=occls, sigma=sigmas)
            result = self._chain_fn(left, right, valid, occl_thresh)
            mem_imgs = mem_imgs.at[wslot].set(img)
            mem_flow = mem_flow.at[wslot].set(result.flow)
            mem_occl = mem_occl.at[wslot].set(result.occlusion)
            mem_sigma = mem_sigma.at[wslot].set(result.sigma)
            mem_fmap = mem_fmap.at[wslot].set(f_new[0])
            mem_cnet = mem_cnet.at[wslot].set(c_new[0])
            return (mem_imgs, mem_flow, mem_occl, mem_sigma,
                    mem_fmap, mem_cnet, result, comp_rows)

        cache[key] = frame
        return frame

    def _get_step(self):
        if self._step_fn is not None:
            return self._step_fn
        occl_thresh = float(cfg_value(self.C.occlusion_threshold, 0.02))

        @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def step(mem_imgs, mem_flow, mem_occl, mem_sigma, img,
                 flows, occls, sigmas, slots, valid, wslot):
            left = FlowOU(flow=jnp.take(mem_flow, slots, axis=0),
                          occlusion=jnp.take(mem_occl, slots, axis=0),
                          sigma=jnp.take(mem_sigma, slots, axis=0))
            right = FlowOU(flow=flows, occlusion=occls, sigma=sigmas)
            # fused select-late path: chain occl/sigma for all candidates,
            # chain flow only for the per-pixel winner (fewer gathers)
            result = self._chain_fn(left, right, valid, occl_thresh)
            mem_imgs = mem_imgs.at[wslot].set(img)
            mem_flow = mem_flow.at[wslot].set(result.flow)
            mem_occl = mem_occl.at[wslot].set(result.occlusion)
            mem_sigma = mem_sigma.at[wslot].set(result.sigma)
            return mem_imgs, mem_flow, mem_occl, mem_sigma, result

        self._step_fn = step
        return step

    @staticmethod
    def _to_device(img):
        """(H, W, 3) uint8 BGR host image -> (H, W, 3) uint8 RGB device.

        The frame is shipped as uint8 (4x less tunnel/PCIe traffic than f32)
        and converted to float inside the jitted forward; pre-transferred
        device arrays pass through untouched (prefetch pipelines).
        """
        if isinstance(img, jnp.ndarray):
            return img
        if img.dtype == np.uint8:
            img = np.ascontiguousarray(img[:, :, ::-1])
        return jnp.asarray(img)
