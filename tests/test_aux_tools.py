"""FT3D occlusion generation + submission writers on synthetic data."""

import numpy as np
import pytest

from mft_tpu.train.generate_occlusions_ft3d import (occlusion_from_fb,
                                                    process_pair_dir)
from mft_tpu.train.flow_readers import write_pfm, read_flo, read_kitti_flow


def test_occlusion_from_fb_consistent_flow():
    """Perfectly consistent flow: only out-of-frame pixels are occluded."""
    H, W = 24, 32
    flow_f = np.full((H, W, 2), 3.0, np.float32)
    flow_b = np.full((H, W, 2), -3.0, np.float32)
    occ = occlusion_from_fb(flow_f, flow_b)
    assert occ[:H - 3, :W - 3].sum() == 0          # interior consistent
    assert occ[:, W - 3:].min() == 1.0             # endpoints out of frame


def test_occlusion_from_fb_inconsistent_region():
    H, W = 16, 16
    flow_f = np.zeros((H, W, 2), np.float32)
    flow_b = np.zeros((H, W, 2), np.float32)
    flow_b[4:8, 4:8] = 5.0  # roundtrip breaks here
    occ = occlusion_from_fb(flow_f, flow_b)
    assert occ[5, 5] == 1.0
    assert occ[0, 0] == 0.0


def test_process_pair_dir(tmp_path, rng):
    fwd = tmp_path / "into_future"
    bwd = tmp_path / "into_past"
    fwd.mkdir()
    bwdd = bwd
    bwdd.mkdir()
    H, W = 16, 20
    for i in range(3):
        f = rng.standard_normal((H, W, 3)).astype(np.float32)
        write_pfm(fwd / f"{i:07d}.pfm", f)
        write_pfm(bwd / f"{i:07d}.pfm", -f)
    n = process_pair_dir(fwd, bwd, tmp_path / "of", tmp_path / "ob")
    assert n == 2
    assert len(list((tmp_path / "of").glob("*.png"))) == 2
    assert len(list((tmp_path / "ob").glob("*.png"))) == 2


class ConstFlower:
    """compute_flow stub returning a constant flow."""

    def __init__(self, value=(2.0, -1.0)):
        self.value = np.asarray(value, np.float32)
        self.calls = 0

    def compute_flow(self, img1, img2, mode="flow", init_flow=None,
                     numpy_out=False, **_):
        self.calls += 1
        H, W = img1.shape[:2]
        flow = np.broadcast_to(self.value, (H, W, 2)).copy()
        return flow, {"occlusion": np.zeros((H, W), np.float32),
                      "sigma": np.zeros((H, W), np.float32)}


def test_sintel_submission_writer(tmp_path, rng):
    import cv2
    from mft_tpu.eval.submissions import create_sintel_submission
    scene = tmp_path / "sintel" / "test" / "final" / "scene_1"
    scene.mkdir(parents=True)
    for i in range(1, 4):
        cv2.imwrite(str(scene / f"frame_{i:04d}.png"),
                    rng.integers(0, 255, (32, 48, 3), dtype=np.uint8))
    flower = ConstFlower()
    n = create_sintel_submission(flower, tmp_path / "sintel",
                                 tmp_path / "sub", warm_start=False)
    assert n == 2
    flo = read_flo(tmp_path / "sub" / "final" / "scene_1" / "frame_0001.flo")
    np.testing.assert_allclose(flo, np.broadcast_to([2.0, -1.0], flo.shape))


def test_kitti_submission_writer(tmp_path, rng):
    import cv2
    from mft_tpu.eval.submissions import create_kitti_submission
    img_dir = tmp_path / "kitti" / "testing" / "image_2"
    img_dir.mkdir(parents=True)
    for i in range(2):
        for suf in ("10", "11"):
            cv2.imwrite(str(img_dir / f"{i:06d}_{suf}.png"),
                        rng.integers(0, 255, (24, 40, 3), dtype=np.uint8))
    n = create_kitti_submission(ConstFlower(), tmp_path / "kitti",
                                tmp_path / "ksub")
    assert n == 2
    flow, valid = read_kitti_flow(tmp_path / "ksub" / "flow" / "000000_10.png")
    np.testing.assert_allclose(flow, np.broadcast_to([2.0, -1.0], flow.shape),
                               atol=1 / 64)
    assert valid.min() == 1.0
