"""Template-pair warm starting (``C.warm_start_inf``).

Documented non-default speed/accuracy mode (see MFT._warm_start): the
delta=inf pair's RAFT iterations start from the previous frame's selected
flow — the reference's own video warm-start mechanism
(MFT/RAFT/core/raft.py flow_init; downsampling MFT/raft.py:98-101) applied
to the one pair whose left frame never changes.

Contracts pinned here:
- the wrapper's ``features_forward(init_slot=...)`` closure is exactly
  ``flow_from_features`` with a zero init batch scattered at that slot,
  with and without a per-pair iteration schedule;
- a warm tracker's FIRST tracked frame equals a plain tracker's (the
  previous-result memory is zero, and zero init IS the default init);
- the fused one-jitted-call path and the unfused (timer-mode) path
  implement the same warm-start semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mft_tpu.config import Config
from mft_tpu.models.raft import RAFTFlow
from mft_tpu.tracker import MFT

H, W = 48, 64


def _flower():
    cfg = Config()
    cfg.raft_params = {"occlusion_module": "separate_with_uncertainty"}
    cfg.model = None
    cfg.flow_iters = 2
    return RAFTFlow(cfg)


@pytest.fixture(scope="module")
def flower():
    return _flower()


def _feats(flower, B, seed=3):
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 255, (2 * B, H, W, 3)).astype(np.float32)
    enc = flower.padded_encode(H, W)
    fmap, cnet = enc(flower.variables, jnp.asarray(imgs))
    return fmap[:B], fmap[B:], cnet[:B]


def _direct(flower, f1, f2, cn, iters, flow_init):
    from mft_tpu.models.raft.upsample import downsample_flow8
    out = flower.model.apply(
        flower.variables, f1, f2, cn,
        method=lambda m, a, b, c: m.flow_from_features(
            a, b, c, iters=iters, flow_init=flow_init, test_mode=True))
    return out["flow"]


def test_features_forward_init_slot_matches_explicit_flow_init(flower):
    from mft_tpu.models.raft.upsample import downsample_flow8
    B = 3
    f1, f2, cn = _feats(flower, B)
    rng = np.random.default_rng(7)
    init = jnp.asarray(rng.normal(0, 3, (H, W, 2)).astype(np.float32))

    fwd = flower.features_forward(H, W, init_slot=1)
    flow_w, occl_w, sigma_w = fwd(flower.variables, f1, f2, cn, init)

    # explicit batch init: zeros except slot 1, padded+downsampled the same
    fi8 = downsample_flow8(init[None])
    flow_init = jnp.zeros((B, *fi8.shape[1:]), jnp.float32).at[1].set(fi8[0])
    ref = _direct(flower, f1, f2, cn, 2, flow_init)
    np.testing.assert_allclose(np.asarray(flow_w), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # non-init pairs are untouched: equal to the plain (no-init) forward
    plain = flower.features_forward(H, W)
    flow_p, _, _ = plain(flower.variables, f1, f2, cn)
    np.testing.assert_allclose(np.asarray(flow_w[0]), np.asarray(flow_p[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(flow_w[2]), np.asarray(flow_p[2]),
                               rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(flow_w[1]), np.asarray(flow_p[1]))


def test_features_forward_init_slot_under_schedule(flower):
    from mft_tpu.models.raft.upsample import downsample_flow8
    B = 3
    f1, f2, cn = _feats(flower, B, seed=5)
    rng = np.random.default_rng(11)
    init = jnp.asarray(rng.normal(0, 3, (H, W, 2)).astype(np.float32))
    sched = (2, 3, 1)  # unsorted: exercises the permutation with flow_init

    fwd = flower.features_forward(H, W, iters_schedule=sched, init_slot=0)
    flow_w, _, _ = fwd(flower.variables, f1, f2, cn, init)

    fi8 = downsample_flow8(init[None])
    flow_init = jnp.zeros((B, *fi8.shape[1:]), jnp.float32).at[0].set(fi8[0])
    ref = _direct(flower, f1, f2, cn, sched, flow_init)
    np.testing.assert_allclose(np.asarray(flow_w), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _tracker(warm, timers=False):
    flow_cfg = Config()
    flow_cfg.of_class = RAFTFlow
    flow_cfg.raft_params = {"occlusion_module": "separate_with_uncertainty"}
    flow_cfg.model = None
    flow_cfg.flow_iters = 2
    cfg = Config()
    cfg.flow_config = flow_cfg
    cfg.deltas = [np.inf, 1, 2]
    cfg.occlusion_threshold = 0.02
    cfg.warm_start_inf = warm
    cfg.timers_enabled = timers
    return MFT(cfg)


def _clip(n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(40, 200, (H, W, 3))
    return [np.clip(base + rng.integers(-30, 30, (H, W, 3)), 0, 255
                    ).astype(np.uint8) for _ in range(n)]


def test_first_frame_matches_plain_tracker():
    frames = _clip(2)
    res = {}
    for warm in (False, True):
        tr = _tracker(warm)
        tr.init(frames[0])
        res[warm] = tr.track(frames[1]).result
    np.testing.assert_allclose(np.asarray(res[True].flow),
                               np.asarray(res[False].flow),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res[True].occlusion),
                               np.asarray(res[False].occlusion),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_warm_start_changes_later_frames():
    frames = _clip(4, seed=2)
    res = {}
    for warm in (False, True):
        tr = _tracker(warm)
        tr.init(frames[0])
        for f in frames[1:]:
            res[warm] = tr.track(f).result
    assert not np.allclose(np.asarray(res[True].flow),
                           np.asarray(res[False].flow))


def test_fused_and_unfused_warm_paths_agree():
    frames = _clip(4, seed=4)
    res = {}
    for timers in (False, True):
        tr = _tracker(warm=True, timers=timers)
        fused = tr._use_fused()
        assert fused == (not timers)
        tr.init(frames[0])
        outs = [tr.track(f).result for f in frames[1:]]
        res[timers] = outs
    for a, b in zip(res[False], res[True]):
        np.testing.assert_allclose(np.asarray(a.flow), np.asarray(b.flow),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(a.sigma), np.asarray(b.sigma),
                                   rtol=1e-4, atol=1e-4)


def test_warm_start_rejects_cached_inf():
    flow_cfg = Config()
    flow_cfg.of_class = RAFTFlow
    flow_cfg.raft_params = {}
    flow_cfg.model = None
    cfg = Config()
    cfg.flow_config = flow_cfg
    cfg.deltas = [np.inf, 1]
    cfg.warm_start_inf = True
    cfg.cache_delta_infinity = True
    with pytest.raises(ValueError, match="warm_start_inf"):
        MFT(cfg)


@pytest.mark.slow
def test_backward_tracking_warm_fused_vs_unfused():
    """time_direction=-1: _prev_slot must point at frame t+1's result."""
    frames = _clip(4, seed=9)
    res = {}
    for timers in (False, True):
        tr = _tracker(warm=True, timers=timers)
        tr.init(frames[-1], start_frame_i=3, time_direction=-1)
        outs = [tr.track(f).result for f in frames[2::-1]]
        res[timers] = outs
    for a, b in zip(res[False], res[True]):
        np.testing.assert_allclose(np.asarray(a.flow), np.asarray(b.flow),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_flow_cache_path_matches_uncached_warm(tmp_path):
    """The TAP-Vid runner path (FlowCache attached) under warm start:
    cold pass (full-batch + write-back) and warm-cache pass (inject
    variant computing only the inf pair) must both equal the uncached
    warm tracker."""
    from mft_tpu.io.cache import FlowCache

    frames = _clip(4, seed=12)

    def run(cache):
        tr = _tracker(warm=True)
        tr.init(frames[0], flow_cache=cache)
        return [tr.track(f).result for f in frames[1:]]

    ref = run(None)
    cache = FlowCache(tmp_path / "wc")
    cold = run(cache)   # all finite pairs miss -> full-batch variant
    hot = run(cache)    # all finite pairs hit -> inject variant (inf only)
    for name, outs in (("cold", cold), ("hot", hot)):
        for a, b in zip(ref, outs):
            np.testing.assert_allclose(np.asarray(a.flow), np.asarray(b.flow),
                                       rtol=1e-4, atol=1e-4, err_msg=name)
            np.testing.assert_allclose(np.asarray(a.sigma),
                                       np.asarray(b.sigma),
                                       rtol=1e-4, atol=1e-4, err_msg=name)
