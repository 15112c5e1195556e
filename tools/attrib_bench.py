#!/usr/bin/env python
"""Frame-phase attribution for the 512px dense-tracking step.

Compiles ABLATED variants of the full tracker frame (a stub is traced in
place of one phase while everything else stays identical) and interleaves
their chunk timings in one process — cross-process chip drift on the remote
tunnel is ±0.6 FPS, which corrupts separate-run comparisons.

Stubs must not be constant-foldable: each one injects real input data
(broadcast, not multiplied by zero) so XLA cannot fold the downstream
consumers away and mis-attribute their cost to the ablated phase.

usage: python tools/attrib_bench.py [variant ...]
  variants: full nolookup nochain noupsample noencode noraft noou
            (suffix '6' runs 6 GRU iterations, e.g. full6 nolookup6)
  default: full nolookup full6 nolookup6 noencode noraft
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from mft_tpu.config import Config
    from mft_tpu.models.raft import RAFTFlow
    from mft_tpu.tracker import MFT
    import mft_tpu.models.raft.raft as raftmod
    import mft_tpu.tracker.fused as fusedmod
    import mft_tpu.models.raft.upsample as upsmod
    import mft_tpu.models.raft.update as updmod

    def make_tracker(iters):
        flow_cfg = Config()
        flow_cfg.of_class = RAFTFlow
        flow_cfg.raft_params = {"occlusion_module": "separate_with_uncertainty",
                                "compute_dtype": "bfloat16"}
        flow_cfg.model = None
        flow_cfg.flow_iters = iters
        cfg = Config()
        cfg.flow_config = flow_cfg
        cfg.deltas = [np.inf, 1, 2, 4, 8, 16, 32]
        cfg.occlusion_threshold = 0.02
        return MFT(cfg)

    orig = {
        "lookup": raftmod.corr_lookup,
        "chain": fusedmod.chain_select,
        "ups_raft": raftmod.convex_upsample_multi,
        "ups": upsmod.convex_upsample_multi,
        "ou": updmod.OcclusionAndUncertaintyBlock.__call__,
    }

    # --- fold-proof stubs: broadcast REAL data into the consumer shapes ---
    def no_lookup(pyramid, coords, radius=4, method="auto", out_dtype=None,
                  tile_p=0):
        B, H, W, _ = coords.shape
        n = 2 * radius + 1
        return jnp.broadcast_to(coords[..., :1].astype(jnp.bfloat16),
                                (B, H, W, 4 * n * n))

    def no_lookup2(pyramid, coords, radius=4, method="auto", out_dtype=None,
                   tile_p=0):
        # channel-VARYING cheap stub: a broadcast output lets XLA's algebraic
        # simplifier collapse the motion encoder's first convs (a 1x1 conv of
        # a channel-constant input is a scalar multiply), so 'nolookup'
        # OVERSTATES the lookup. iota channels keep the consumers honest.
        B, H, W, _ = coords.shape
        n = 2 * radius + 1
        chan = jax.lax.broadcasted_iota(
            jnp.bfloat16, (1, 1, 1, 4 * n * n), 3) * 0.01
        return coords[..., :1].astype(jnp.bfloat16) * chan

    def noop_pallas_lookup(pyramid, coords, radius=4, method="auto",
                           out_dtype=None, tile_p=0):
        # a MINIMAL pallas call in the GRU loop: reads only coords, no
        # volume blocks, trivial compute. Separates the volume-read DMA
        # from the pallas-call-boundary cost (lost XLA fusion/overlap):
        # if this variant is as slow as the real lookup, the boundary is
        # the cost; if it matches nolookup2, the DMA is.
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from mft_tpu.ops.corr_lookup_pallas import _tile_p
        B, H, W, _ = coords.shape
        P = H * W
        n = 2 * radius + 1
        tp = _tile_p(P, 512)
        c = coords.reshape(B, P, 2)

        def kernel(c_ref, o_ref):
            cc = c_ref[0]
            o_ref[0] = ((cc[:, :1] * 0.01).astype(jnp.bfloat16)
                        * jax.lax.broadcasted_iota(
                            jnp.int32, (tp, 4 * n * n), 1
                        ).astype(jnp.bfloat16))

        out = pl.pallas_call(
            kernel, grid=(B, P // tp),
            in_specs=[pl.BlockSpec((1, tp, 2), lambda b, p: (b, p, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, tp, 4 * n * n),
                                   lambda b, p: (b, p, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, P, 4 * n * n), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(c.astype(jnp.float32))
        return out.reshape(B, H, W, 4 * n * n)

    def no_chain(left, right, valid, occl_thresh=0.02):
        from mft_tpu.core.flowou import FlowOU
        return FlowOU(flow=right.flow[0] + left.flow[0],
                      occlusion=jnp.maximum(right.occlusion[0],
                                            left.occlusion[0]),
                      sigma=right.sigma[0] + left.sigma[0])

    def no_ups(fields, mask, mult_coefs):
        m0 = mask[..., :1]
        outs = []
        for f, c in zip(fields, mult_coefs):
            B, h, w, C = f.shape
            o = jnp.broadcast_to((f * c + m0)[:, :, None, :, None, :],
                                 (B, h, 8, w, 8, C))
            outs.append(o.reshape(B, 8 * h, 8 * w, C))
        return outs

    def no_ou(self, net, inp, corr, flow, delta_flow, motion_features):
        z = net[..., :1] + corr[..., :1].astype(net.dtype)
        return jnp.concatenate([z, z], -1), z

    def wrap_no_encode(flower):
        base = flower.padded_encode
        def padded_encode(H, W):
            enc = base(H, W)
            def stub(variables, images, with_context=True):
                fm, cn = jax.eval_shape(lambda v, im: enc(v, im),
                                        variables, images)
                pool = images[:, ::8, ::8, :1].astype(fm.dtype)
                zf = jnp.broadcast_to(pool[:, :fm.shape[1], :fm.shape[2]],
                                      fm.shape)
                zc = jnp.broadcast_to(pool[:, :cn.shape[1], :cn.shape[2]],
                                      cn.shape).astype(cn.dtype)
                return zf, zc
            return stub
        flower.padded_encode = padded_encode

    def wrap_no_raft(flower):
        def features_forward(H, W):
            def stub(variables, fmap1, fmap2, cnet1):
                N = fmap1.shape[0]
                t = fmap1[:, :1, :1, 0].astype(jnp.float32)   # (N,1,1)
                flow = jnp.broadcast_to(t[..., None], (N, H, W, 2))
                occl = jnp.broadcast_to(t, (N, H, W))
                return flow, occl, occl
            return stub
        flower.features_forward = features_forward

    variants_all = {
        "full": {},
        "nolookup": {"lookup": no_lookup},
        "nolookup2": {"lookup": no_lookup2},
        "nooppl": {"lookup": noop_pallas_lookup},
        "cheapw": {"fakew": True},   # same dots+DMA, no tent-weight build
        "nochain": {"chain": no_chain},
        "noupsample": {"ups": no_ups},
        "noou": {"oublock": no_ou},
        "noencode": {"wrap": wrap_no_encode},
        "noraft": {"wrap": wrap_no_raft},
        # everything stubbed: the residual is the per-frame dispatch +
        # ring gather/update + result fetch floor, nothing else
        "nothing": {"wrap": lambda fl: (wrap_no_encode(fl),
                                        wrap_no_raft(fl)) and None,
                    "chain": no_chain, "ups": no_ups, "oublock": no_ou},
    }
    names = sys.argv[1:] or ["full", "nolookup", "full6", "nolookup6",
                             "noencode", "noraft"]

    import os
    H = W = int(os.environ.get("ATTRIB_SIZE", 512))
    rng = np.random.default_rng(0)
    chunk = int(os.environ.get("ATTRIB_CHUNK", 16))
    rounds = 2
    n_frames = 1 + 4 + chunk * rounds
    frames = [rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
              for _ in range(n_frames)]
    to_dev = lambda f: jnp.asarray(np.ascontiguousarray(f[:, :, ::-1]))
    staged = bool(int(os.environ.get("ATTRIB_STAGED", "0")))
    if staged:
        # pre-upload every frame: isolates the host->device frame feed from
        # the device compute + dispatch cost
        frames = [to_dev(f) for f in frames]
        jax.block_until_ready(frames[-1])
        to_dev = lambda f: f

    import mft_tpu.ops.corr_lookup_pallas as clp

    trackers = {}
    for name in names:
        base = name[:-1] if name.endswith("6") else name
        iters = 6 if name.endswith("6") else 12
        patch = variants_all[base]
        clp._DIAG_FAKE_WEIGHTS = patch.get("fakew", False)
        raftmod.corr_lookup = patch.get("lookup", orig["lookup"])
        fusedmod.chain_select = patch.get("chain", orig["chain"])
        raftmod.convex_upsample_multi = patch.get("ups", orig["ups_raft"])
        upsmod.convex_upsample_multi = patch.get("ups", orig["ups"])
        updmod.OcclusionAndUncertaintyBlock.__call__ = patch.get(
            "oublock", orig["ou"])
        tr = make_tracker(iters)
        if "wrap" in patch:
            patch["wrap"](tr.flower)
        tr.init(frames[0])
        for f in frames[1:5]:
            meta = tr.track(f)       # traces + compiles under the patch
        np.asarray(meta.result.occlusion[:1, :1])
        trackers[name] = tr
        print("warmed", name, flush=True)
    clp._DIAG_FAKE_WEIGHTS = False
    raftmod.corr_lookup = orig["lookup"]
    fusedmod.chain_select = orig["chain"]
    raftmod.convex_upsample_multi = orig["ups_raft"]
    upsmod.convex_upsample_multi = orig["ups"]
    updmod.OcclusionAndUncertaintyBlock.__call__ = orig["ou"]

    ms = {k: [] for k in trackers}
    for r in range(rounds):
        for name, tr in trackers.items():
            pos = 5 + r * chunk
            nxt = to_dev(frames[pos])
            t0 = time.perf_counter()
            for k in range(chunk):
                cur = nxt
                if k + 1 < chunk:
                    nxt = to_dev(frames[pos + k + 1])
                meta = tr.track(cur)
            np.asarray(meta.result.occlusion[:1, :1])
            ms[name].append((time.perf_counter() - t0) / chunk * 1000)
            print(f"round {r} {name}: {ms[name][-1]:.2f} ms", flush=True)

    med = {k: round(float(np.median(v)), 2) for k, v in ms.items()}
    out = {k: {"ms": v} for k, v in med.items()}
    if "full" in med:
        for k in out:
            out[k]["delta_vs_full"] = round(med["full"] - med[k], 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    # NOT via PYTHONPATH from an interactive shell: with /root/repo on
    # PYTHONPATH the remote-TPU backend can fail to register (observed
    # repeatedly from shell launches; python-subprocess launches with the
    # same value initialize fine — mechanism unresolved). A late
    # in-process sys.path insert avoids the question entirely.
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
    sys.exit(main())
