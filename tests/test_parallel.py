"""Multi-chip sharding on the virtual 8-device CPU mesh + graft entry points."""

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow  # multichip dryrun + sharded streaming (~2-4 min)

from mft_tpu.parallel.mesh import make_mesh, batch_sharding, replicated


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8, "conftest should force 8 CPU devices"


def test_dryrun_multichip_runs():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    flow = np.asarray(out[0])
    assert flow.shape == (1, 256, 256, 2)
    assert np.isfinite(flow).all()


def test_streaming_tracker_sharded(rng):
    """Multi-clip streaming over the mesh with the fake flower."""
    from mft_tpu.config import Config
    from mft_tpu.parallel.streaming import StreamingTracker
    from tests.test_tracker import frame, SHIFT

    class BatchedFakeFlower:
        def __init__(self, config):
            self.variables = {}
            self.iters = 1
            self.model = self

        def apply(self, variables, imgs1, imgs2, iters=1, test_mode=True):
            import jax.numpy as jnp
            imgs1 = imgs1.astype(jnp.float32)
            imgs2 = imgs2.astype(jnp.float32)
            dt = imgs2[:, 0, 0, 0] - imgs1[:, 0, 0, 0]
            N, H, W, _ = imgs1.shape
            flow = jnp.broadcast_to(dt[:, None, None, None] * jnp.asarray(SHIFT),
                                    (N, H, W, 2))
            # raw head outputs: occlusion logits (favor channel 0 = visible),
            # uncertainty log-variance
            occl_logits = jnp.stack([jnp.ones((N, H, W)) * 5.0,
                                     jnp.ones((N, H, W)) * -5.0], axis=-1)
            unc = jnp.zeros((N, H, W, 1))
            return {"flow": flow, "occlusion": occl_logits, "uncertainty": unc}

    mesh = make_mesh()
    cfg = Config()
    fc = Config()
    fc.of_class = BatchedFakeFlower
    cfg.flow_config = fc
    cfg.deltas = [np.inf, 1, 2]
    cfg.occlusion_threshold = 0.02

    C = 8
    st = StreamingTracker(cfg, n_clips=C, mesh=mesh)
    frames0 = np.stack([frame(0, H=32, W=40) for _ in range(C)])
    st.init(frames0)
    for t in range(1, 5):
        res = st.track(np.stack([frame(t, H=32, W=40) for _ in range(C)]))
    flow = np.asarray(res.flow)
    assert flow.shape == (C, 32, 40, 2)
    interior = flow[:, 8:-8, 8:-8]
    want = np.broadcast_to(SHIFT * 4, interior.shape)
    np.testing.assert_allclose(interior, want, atol=1e-3)
    # memory buffers actually sharded over the mesh
    assert len(st.mem_flow.sharding.device_set) == 8


def test_streaming_feature_path_matches_single_tracker():
    """Streaming mode with the real RAFT (feature-ring path) must produce
    the same per-clip results as the single-clip tracker."""
    import jax.numpy as jnp
    from mft_tpu.config import Config
    from mft_tpu.models.raft import RAFTFlow
    from mft_tpu.parallel.streaming import StreamingTracker
    from mft_tpu.tracker import MFT

    fc = Config()
    fc.of_class = RAFTFlow
    fc.raft_params = {"occlusion_module": "separate_with_uncertainty"}
    fc.model = None
    fc.flow_iters = 1
    cfg = Config()
    cfg.flow_config = fc
    cfg.deltas = [np.inf, 1]
    cfg.occlusion_threshold = 0.02

    rng = np.random.default_rng(0)
    T, C, H, W = 3, 2, 64, 64
    clips = rng.integers(0, 255, (T, C, H, W, 3), dtype=np.uint8)

    st = StreamingTracker(cfg, n_clips=C)
    assert st._use_features()
    st.init(clips[0])
    for t in range(1, T):
        res = st.track(clips[t])

    single = MFT(cfg)
    single.init(clips[0, 0])
    for t in range(1, T):
        meta = single.track(clips[t, 0])

    np.testing.assert_allclose(np.asarray(res.flow[0]),
                               np.asarray(meta.result.flow), atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.sigma[0]),
                               np.asarray(meta.result.sigma), atol=1e-3)


def test_streaming_schedule_matches_single_tracker():
    """The per-delta iteration schedule (speed mode) in streaming mode must
    produce the same per-clip results as the single-clip tracker with the
    same schedule (the flat clip-major pair batch repeats the schedule)."""
    from mft_tpu.config import Config
    from mft_tpu.models.raft import RAFTFlow
    from mft_tpu.parallel.streaming import StreamingTracker
    from mft_tpu.tracker import MFT

    fc = Config()
    fc.of_class = RAFTFlow
    fc.raft_params = {"occlusion_module": "separate_with_uncertainty"}
    fc.model = None
    fc.flow_iters = 2
    cfg = Config()
    cfg.flow_config = fc
    cfg.deltas = [np.inf, 1]
    cfg.occlusion_threshold = 0.02
    cfg.flow_iters_schedule = {float("inf"): 2, 1: 1}

    rng = np.random.default_rng(1)
    T, C, H, W = 3, 2, 64, 64
    clips = rng.integers(0, 255, (T, C, H, W, 3), dtype=np.uint8)

    st = StreamingTracker(cfg, n_clips=C)
    st.init(clips[0])
    for t in range(1, T):
        res = st.track(clips[t])

    single = MFT(cfg)
    assert single._iters_schedule() == (2, 1)
    single.init(clips[0, 1])
    for t in range(1, T):
        meta = single.track(clips[t, 1])

    np.testing.assert_allclose(np.asarray(res.flow[1]),
                               np.asarray(meta.result.flow), atol=1e-3)


def test_streaming_inject_matches_single_tracker_cache_path(tmp_path):
    """Streaming injection (cache-hit rows, RAFT only for misses) must match
    the single-clip tracker's FlowCache steady state: per clip, a second
    pass over a warm cache routes finite-delta pairs through injection and
    both trackers must produce identical chained results."""
    from mft_tpu.config import Config
    from mft_tpu.io.cache import FlowCache
    from mft_tpu.models.raft import RAFTFlow
    from mft_tpu.parallel.streaming import StreamingTracker
    from mft_tpu.tracker import MFT

    fc = Config()
    fc.of_class = RAFTFlow
    fc.raft_params = {"occlusion_module": "separate_with_uncertainty"}
    fc.model = None
    fc.flow_iters = 1
    cfg = Config()
    cfg.flow_config = fc
    cfg.deltas = [np.inf, 1]
    cfg.occlusion_threshold = 0.02

    rng = np.random.default_rng(3)
    T, C, H, W = 3, 2, 64, 64
    clips = rng.integers(0, 255, (T, C, H, W, 3), dtype=np.uint8)

    # pass 1 per clip: single tracker computes + fills its cache; pass 2
    # replays over the warm cache (the MFT inject path) -> reference metas
    caches, metas2 = [], []
    for c in range(C):
        cache = FlowCache(tmp_path / f"c{c}", max_ram_mb=500, max_device_mb=0)
        single = MFT(cfg)
        single.init(clips[0, c], flow_cache=cache)
        for t in range(1, T):
            single.track(clips[t, c])
        # pass 2: every finite pair hits -> MFT inject path
        single.init(clips[0, c], flow_cache=cache)
        mm = [single.track(clips[t, c]) for t in range(1, T)]
        metas2.append(mm)
        caches.append(cache)

    st = StreamingTracker(cfg, n_clips=C)
    st.init(clips[0])
    delta1 = st.deltas.index(1)
    for t in range(1, T):
        rows = [caches[c].read(t - 1, t) for c in range(C)]
        assert all(r is not None for r in rows)
        injected = {delta1: tuple(
            np.stack([np.asarray(rows[c][k]) for c in range(C)])
            for k in range(3))}
        res = st.track(clips[t], injected=injected)

    for c in range(C):
        np.testing.assert_allclose(np.asarray(res.flow[c]),
                                   np.asarray(metas2[c][-1].result.flow),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.sigma[c]),
                                   np.asarray(metas2[c][-1].result.sigma),
                                   atol=1e-3)


def test_streaming_warm_start_matches_single_tracker():
    """Template-pair warm starting (C.warm_start_inf) in streaming mode must
    produce the same per-clip results as the single-clip warm tracker: each
    clip's delta=inf pair starts from that clip's previous selected flow."""
    from mft_tpu.config import Config
    from mft_tpu.models.raft import RAFTFlow
    from mft_tpu.parallel.streaming import StreamingTracker
    from mft_tpu.tracker import MFT

    fc = Config()
    fc.of_class = RAFTFlow
    fc.raft_params = {"occlusion_module": "separate_with_uncertainty"}
    fc.model = None
    fc.flow_iters = 2
    cfg = Config()
    cfg.flow_config = fc
    cfg.deltas = [np.inf, 1]
    cfg.occlusion_threshold = 0.02
    cfg.warm_start_inf = True

    rng = np.random.default_rng(6)
    T, C, H, W = 4, 2, 64, 64
    clips = rng.integers(0, 255, (T, C, H, W, 3), dtype=np.uint8)

    st = StreamingTracker(cfg, n_clips=C)
    st.init(clips[0])
    for t in range(1, T):
        res = st.track(clips[t])

    single = MFT(cfg)
    single.init(clips[0, 1])
    for t in range(1, T):
        meta = single.track(clips[t, 1])

    np.testing.assert_allclose(np.asarray(res.flow[1]),
                               np.asarray(meta.result.flow), atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.sigma[1]),
                               np.asarray(meta.result.sigma), atol=1e-3)
