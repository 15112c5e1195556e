"""MFT tracker logic against a fake flow backend (no network needed).

The fake flower encodes the frame index into pixel [0, 0] of each frame, so
pairwise "flow" between frames t1 -> t2 is an exact constant shift
s * (t2 - t1). Long-term chaining must then recover s * (t - start) for
interior pixels, whatever deltas/selection path is taken — this exercises the
ring memory, validity masking, chaining and selection end-to-end.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mft_tpu.config import Config
from mft_tpu.tracker import MFT, select_best
from mft_tpu.tracker.point_tracking import convert_to_point_tracking


SHIFT = np.array([0.5, 0.25], np.float32)  # px per frame step


class FakeFlower:
    """Flow oracle: reads frame indices from pixel [0,0,0] of the images."""

    def __init__(self, config):
        self.sigma_scale = float(config.sigma_scale or 0.0)
        self.shift = np.asarray(config.shift or SHIFT, np.float32)

    def forward_batch(self, imgs1, imgs2):
        # cast first (frames may arrive as uint8, like for the real model)
        imgs1 = imgs1.astype(jnp.float32)
        imgs2 = imgs2.astype(jnp.float32)
        dt = (imgs2[:, 0, 0, 0] - imgs1[:, 0, 0, 0])  # (N,)
        N, H, W, _ = imgs1.shape
        flow = jnp.broadcast_to(
            dt[:, None, None, None] * jnp.asarray(self.shift), (N, H, W, 2))
        occl = jnp.zeros((N, H, W), jnp.float32)
        sigma = jnp.broadcast_to(jnp.abs(dt)[:, None, None, None] * self.sigma_scale,
                                 (N, H, W, 1))[..., 0]
        return flow, occl, sigma


def frame(t, H=32, W=40):
    """uint8 BGR frame with the index stamped into the blue channel of [0,0].

    MFT._to_device flips BGR->RGB, so channel 0 on device = red channel =
    BGR channel 2: stamp index into channel 2.
    """
    img = np.full((H, W, 3), 100, np.uint8)
    img[0, 0, 2] = t
    return img


def make_tracker(deltas, sigma_scale=0.0, occlusion_threshold=0.02):
    cfg = Config()
    flow_cfg = Config()
    flow_cfg.of_class = FakeFlower
    flow_cfg.sigma_scale = sigma_scale
    cfg.flow_config = flow_cfg
    cfg.deltas = deltas
    cfg.occlusion_threshold = occlusion_threshold
    return MFT(cfg)


def interior(arr2d_or3d, margin=12):
    return arr2d_or3d[margin:-margin, margin:-margin]


def assert_shift(got, k, atol=1e-3, msg=""):
    want = np.broadcast_to(SHIFT * k, got.shape)
    np.testing.assert_allclose(got, want, atol=atol, err_msg=msg)


def test_tracking_recovers_cumulative_shift():
    tracker = make_tracker([np.inf, 1, 2, 4], sigma_scale=0.1)
    tracker.init(frame(0))
    for t in range(1, 10):
        meta = tracker.track(frame(t))
        got = np.asarray(meta.result.flow)
        assert_shift(interior(got), t, msg=f"frame {t}")
        # fake flow is never occluded in the interior
        assert np.all(interior(np.asarray(meta.result.occlusion)) < 0.02)


def test_ring_memory_long_sequence():
    """Sequence much longer than the ring: memory recycling must be sound."""
    tracker = make_tracker([np.inf, 1, 2, 4], sigma_scale=0.1)
    tracker.init(frame(0))
    for t in range(1, 20):
        meta = tracker.track(frame(t))
    got = interior(np.asarray(meta.result.flow))
    assert_shift(got, 19)


def test_backward_tracking():
    tracker = make_tracker([np.inf, 1, 2], sigma_scale=0.1)
    tracker.init(frame(30), start_frame_i=30, time_direction=-1)
    for t in range(29, 24, -1):
        meta = tracker.track(frame(t))
    got = interior(np.asarray(meta.result.flow))
    assert_shift(got, 25 - 30)


def test_select_best_matches_reference_rule(rng):
    """select_best vs a plain-numpy transcription of MFT.py:114-142."""
    N, H, W = 4, 6, 7
    flows = rng.standard_normal((N, H, W, 2)).astype(np.float32) * 0.5
    occl = rng.uniform(0, 0.1, (N, H, W)).astype(np.float32)
    occl[1, :3] = 0.5  # force candidate 1 unselectable in some rows
    sigma = rng.uniform(0.1, 2.0, (N, H, W)).astype(np.float32)
    valid = np.array([True, True, False, True])

    got = select_best(jnp.asarray(flows), jnp.asarray(occl), jnp.asarray(sigma),
                      jnp.asarray(valid), occlusion_threshold=0.02)

    scores = -sigma.copy()
    scores[occl > 0.02] = -np.inf
    scores[~valid] = -np.inf
    best = scores.argmax(axis=0)
    ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    want_flow = flows[best, ii, jj]
    want_occl = occl[best, ii, jj]
    want_sigma = sigma[best, ii, jj]
    # out-of-image endpoints -> occluded
    xs, ys = np.meshgrid(np.arange(W), np.arange(H))
    ex, ey = xs + want_flow[..., 0], ys + want_flow[..., 1]
    inval = (ex < 0) | (ey < 0) | (ex >= W) | (ey >= H)
    want_occl = np.where(inval, 1.0, want_occl)

    np.testing.assert_allclose(np.asarray(got.flow), want_flow, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.occlusion), want_occl, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.sigma), want_sigma, atol=1e-6)


def test_selection_prefers_lowest_sigma():
    """Per-pixel selection must pick the lowest-sigma candidate: with
    per-step sigma 0.3, the delta-1 chain accumulates RSS 0.3*sqrt(t), which
    beats the direct (inf) candidate's 0.3*t — so the selected sigma must
    follow the chained candidate."""
    tracker = make_tracker([np.inf, 1], sigma_scale=0.3)
    tracker.init(frame(0))
    for t in range(1, 4):
        meta = tracker.track(frame(t))
        sig = interior(np.asarray(meta.result.sigma))
        np.testing.assert_allclose(
            sig, np.full_like(sig, 0.3 * np.sqrt(t)), atol=1e-3)


class DictCache:
    def __init__(self):
        self.store = {}
        self.reads = self.hits = self.writes = 0

    def read(self, li, ri):
        self.reads += 1
        v = self.store.get((li, ri))
        if v is not None:
            self.hits += 1
        return v

    def write(self, li, ri, flow, occl, sigma):
        self.writes += 1
        self.store[(li, ri)] = (flow, occl, sigma)


def test_flow_cache_roundtrip():
    deltas = [np.inf, 1, 2]
    cache = DictCache()

    t1 = make_tracker(deltas, sigma_scale=0.1)
    t1.init(frame(0), flow_cache=cache)
    for t in range(1, 6):
        t1.track(frame(t))
    writes_first = cache.writes
    assert writes_first > 0

    t2 = make_tracker(deltas, sigma_scale=0.1)
    t2.init(frame(0), flow_cache=cache)
    for t in range(1, 6):
        meta = t2.track(frame(t))
    assert cache.writes == writes_first  # all finite pairs were cache hits
    assert_shift(interior(np.asarray(meta.result.flow)), 5)


def test_flow_cache_keeps_writes_on_device():
    """Tracker cache writes must store jax arrays in the device tier — a
    numpy round trip would force a device->host fetch of every pairwise
    flow per frame (through the remote-TPU tunnel, milliseconds per pair)."""
    from mft_tpu.io.cache import FlowCache, _is_device

    cache = FlowCache(None, max_ram_mb=100, max_device_mb=100)
    tracker = make_tracker([np.inf, 1, 2], sigma_scale=0.1)
    tracker.init(frame(0), flow_cache=cache)
    for t in range(1, 5):
        meta = tracker.track(frame(t))
    assert len(cache.device_cache) > 0
    for flow, occl, sigma in cache.device_cache.values():
        assert _is_device(flow) and _is_device(occl) and _is_device(sigma)
    # warm re-track serves hits from the device tier
    hits_before = cache.hits
    tracker2 = make_tracker([np.inf, 1, 2], sigma_scale=0.1)
    tracker2.init(frame(0), flow_cache=cache)
    for t in range(1, 5):
        meta = tracker2.track(frame(t))
    assert cache.hits > hits_before
    assert_shift(interior(np.asarray(meta.result.flow)), 4)


def test_point_tracking_adapter():
    tracker = make_tracker([np.inf, 1], sigma_scale=0.1)
    tracker.init(frame(0))
    for t in range(1, 5):
        meta = tracker.track(frame(t))
    queries = np.array([[20.0, 16.0], [15.5, 14.25]], np.float32)
    coords, occl = convert_to_point_tracking(meta.result, queries)
    np.testing.assert_allclose(coords, queries + SHIFT * 4, atol=1e-3)
    assert occl.shape == (2,)
    assert np.all(occl < 0.02)


@pytest.mark.slow
def test_fused_frame_path_matches_split():
    """The one-jit-per-frame fast path (no flow cache) must produce the same
    results as the split acquire/step path, using the real RAFT model."""
    from mft_tpu.models.raft import RAFTFlow

    flow_cfg = Config()
    flow_cfg.of_class = RAFTFlow
    flow_cfg.raft_params = {"occlusion_module": "separate_with_uncertainty"}
    flow_cfg.model = None      # deterministic random init
    flow_cfg.flow_iters = 2
    cfg = Config()
    cfg.flow_config = flow_cfg
    cfg.deltas = [np.inf, 1, 2]
    cfg.occlusion_threshold = 0.02

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (64, 72, 3), dtype=np.uint8)
              for _ in range(4)]

    tracker = MFT(cfg)
    tracker.init(frames[0])
    assert hasattr(tracker.flower, "padded_forward")
    for f in frames[1:]:
        meta = tracker.track(f)          # fused path (flow_cache is None)
    fused = meta.result

    tracker2 = MFT(cfg)
    tracker2.init(frames[0])
    tracker2.C.timers_enabled = True     # forces the split path
    for f in frames[1:]:
        meta2 = tracker2.track(f)
    split = meta2.result

    np.testing.assert_allclose(np.asarray(fused.flow),
                               np.asarray(split.flow), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fused.occlusion),
                               np.asarray(split.occlusion), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fused.sigma),
                               np.asarray(split.sigma), atol=1e-4)


class FusedFakeFlower(FakeFlower):
    """FakeFlower exposing the fused-path surface (padded_encode /
    features_forward / variables): 'features' are just the input image's
    first channel, which carries the frame-index stamp at [0, 0]."""

    variables = {}

    def padded_encode(self, H, W):
        def enc(variables, imgs):
            f = imgs[..., :1]
            return f, f
        return enc

    def features_forward(self, H, W):
        shift = jnp.asarray(self.shift)
        sigma_scale = self.sigma_scale

        def fwd(variables, fmap1, fmap2, cnet1):
            dt = fmap2[:, 0, 0, 0] - fmap1[:, 0, 0, 0]      # (N,)
            N = fmap1.shape[0]
            flow = jnp.broadcast_to(
                dt[:, None, None, None] * shift, (N, H, W, 2))
            occl = jnp.zeros((N, H, W), jnp.float32)
            sigma = jnp.broadcast_to(
                (jnp.abs(dt) * sigma_scale)[:, None, None], (N, H, W))
            return flow, occl, sigma
        return fwd


def _make_fused_tracker(deltas, sigma_scale=0.1):
    cfg = Config()
    flow_cfg = Config()
    flow_cfg.of_class = FusedFakeFlower
    flow_cfg.sigma_scale = sigma_scale
    cfg.flow_config = flow_cfg
    cfg.deltas = deltas
    cfg.occlusion_threshold = 0.02
    return cfg


def test_track_chunk_matches_per_frame():
    """track_chunk (K frames in one jitted dispatch) must equal K track()
    calls exactly — same frame body, chained memory."""
    deltas = [np.inf, 1, 2, 4]
    cfg = _make_fused_tracker(deltas)

    ta = MFT(cfg)
    ta.init(frame(0))
    assert ta._use_fused()
    seq = [ta.track(frame(t)) for t in range(1, 9)]

    tb = MFT(cfg)
    tb.init(frame(0))
    metas = (tb.track_chunk([frame(t) for t in range(1, 4)])       # K=3
             + tb.track_chunk([frame(t) for t in range(4, 9)]))    # K=5
    assert tb.current_frame_i == ta.current_frame_i

    for i, (a, b) in enumerate(zip(seq, metas)):
        np.testing.assert_array_equal(
            np.asarray(a.result.flow), np.asarray(b.result.flow),
            err_msg=f"frame {i + 1} flow")
        np.testing.assert_array_equal(
            np.asarray(a.result.occlusion), np.asarray(b.result.occlusion),
            err_msg=f"frame {i + 1} occlusion")
        np.testing.assert_array_equal(
            np.asarray(a.result.sigma), np.asarray(b.result.sigma),
            err_msg=f"frame {i + 1} sigma")
    # and the tracked motion is still the cumulative shift
    assert_shift(interior(np.asarray(metas[-1].result.flow)), 8)


def test_track_chunk_falls_back_without_fused_path():
    """FakeFlower has no fused surface -> track_chunk must fall back to
    per-frame tracking and still produce correct chained results."""
    tracker = make_tracker([np.inf, 1, 2], sigma_scale=0.1)
    tracker.init(frame(0))
    metas = tracker.track_chunk([frame(1), frame(2), frame(3)])
    assert len(metas) == 3
    assert_shift(interior(np.asarray(metas[-1].result.flow)), 3)
