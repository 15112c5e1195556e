"""Cross-cutting utils: timers, sparse logging, vis, rand, repro."""

import logging

import numpy as np

from mft_tpu.utils.timing import general_time_measurer, time_measurer
from mft_tpu.utils.various import SparseExceptionLogger
from mft_tpu.utils.rand_utils import tmp_np_seed
from mft_tpu.utils import vis


def test_general_time_measurer():
    t = general_time_measurer("test", active=True)
    for _ in range(3):
        t.start()
        t.stop()
    assert t.report("mean") is not None
    assert t.report("sum") >= t.report("mean")
    inactive = general_time_measurer("off", active=False)
    inactive.start()
    inactive.stop()
    assert inactive.report() is None


def test_time_measurer_context():
    with time_measurer("ms", "unit-test"):
        pass


def test_sparse_exception_logger(caplog):
    log = logging.getLogger("sparse-test")
    sel = SparseExceptionLogger(log)
    with caplog.at_level(logging.ERROR, "sparse-test"):
        for _ in range(5):
            sel("CUDA out of memory blah")
        sel("different problem")
    assert len(caplog.records) == 2
    assert sel.summary()["CUDA out of memory blah"] == 5


def test_tmp_np_seed():
    with tmp_np_seed(123):
        a = np.random.rand(3)
    with tmp_np_seed(123):
        b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    outside1 = np.random.rand()
    outside2 = np.random.rand()
    assert outside1 != outside2  # global stream restored, not stuck


def test_flow_to_color(rng):
    flow = rng.standard_normal((20, 30, 2)).astype(np.float32) * 5
    img = vis.flow_to_color(flow)
    assert img.shape == (20, 30, 3) and img.dtype == np.uint8
    zero = vis.flow_to_color(np.zeros((5, 5, 2), np.float32))
    assert zero.min() > 240  # zero flow is ~white


def test_vis_overlays(rng):
    img = rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)
    flow = rng.standard_normal((32, 40, 2)).astype(np.float32)
    assert vis.vis_flow(flow, img).shape == img.shape
    assert vis.vis_flow_dots(flow, img).shape == img.shape
    coords = np.array([[5.0, 5.0], [100.0, 100.0]])  # second out of bounds
    assert vis.draw_tracks(img, coords, np.array([0.0, 1.0])).shape == img.shape
    grid = vis.image_grid([img] * 5)
    assert grid.ndim == 3
    cb = vis.checkerboard(16, 16, 4)
    assert set(np.unique(cb)) == {120, 200}
    hm = vis.vis_scalar_map(rng.uniform(size=(8, 8)))
    assert hm.shape == (8, 8, 3)


def test_code_export(tmp_path):
    from mft_tpu.utils.repro import code_export
    code_export(tmp_path / "snap")
    assert (tmp_path / "snap" / "mft_tpu" / "tracker" / "mft.py").exists()
    assert (tmp_path / "snap" / "GIT_STATE").exists()


def test_notifications_noop():
    from mft_tpu.utils.notifications import send_notification, with_notification
    assert send_notification("test message") in (True, False)

    @with_notification
    def f():
        return 42

    assert f() == 42


def test_lookahead_iter():
    from mft_tpu.io.video import LookaheadIter
    it = LookaheadIter(iter([1, 2, 3]))
    assert it.peek() == 1
    assert next(it) == 1          # peek did not consume
    assert list(it.lookahead()) == [2, 3]
    assert next(it) == 2          # lookahead did not consume
    assert next(it) == 3
    assert it.peek("end") == "end"


def test_forward_interpolate_constant_flow():
    import numpy as np
    from mft_tpu.models.raft.upsample import forward_interpolate
    flow = np.full((16, 20, 2), 2.0, np.float32)
    out = forward_interpolate(flow)
    assert out.shape == (16, 20, 2)
    # constant flow advected forward stays (nearly) constant in the interior
    assert np.allclose(out[4:-4, 4:-4], 2.0, atol=1e-5)


def test_input_crop_and_resize_roundtrip():
    import numpy as np
    import jax.numpy as jnp
    from mft_tpu.models.raft.upsample import InputCropAndResize
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 48, 3)),
                    jnp.float32)
    car = InputCropAndResize(0.5)
    (cropped,) = car.crop(x)
    assert cropped.shape == (1, 16, 24, 3)
    (up,) = car.upsize(cropped)
    assert up.shape == x.shape
    flow = jnp.ones((1, 32, 48, 2), jnp.float32) * 8.0
    (down_flow,) = car.downsize_flow(flow)
    assert down_flow.shape == (1, 16, 24, 2)
    # values scaled by the size ratio (0.5)
    assert np.allclose(np.asarray(down_flow), 4.0, atol=1e-4)


def test_small_raft_parity_shapes():
    """Small-model update path: ConvGRU + no up-mask (upflow8)."""
    import jax
    import jax.numpy as jnp
    from mft_tpu.models.raft.raft import RAFT, RAFTParams
    cfg = RAFTParams(small=True, occlusion_module=None)
    model = RAFT(cfg=cfg, train_mode=False)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), img, img, iters=1)
    out = model.apply(v, img, img, iters=2, test_mode=True)
    assert out["flow"].shape == (1, 64, 96, 2)
    n_params = sum(x.size for x in jax.tree.leaves(v))
    assert 0.9e6 < n_params < 1.1e6  # reference small RAFT ~1.0M params
