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
