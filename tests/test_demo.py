"""End-to-end demo app smoke test (reference demo.py:47-103 role parity)."""

import numpy as np
import cv2
import pytest


@pytest.mark.slow
def test_demo_end_to_end(tmp_path, rng):
    """demo.run on a tiny synthetic image-dir video writes both output
    videos (point dots + propagated first-frame edit) without error."""
    from mft_tpu.apps import demo

    frames_dir = tmp_path / "clip"
    frames_dir.mkdir()
    H = W = 64
    base = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
    for i in range(4):
        # simple global translation so tracks actually move
        M = np.float32([[1, 0, 2 * i], [0, 1, i]])
        frame = cv2.warpAffine(base, M, (W, H))
        cv2.imwrite(str(frames_dir / f"{i:04d}.png"), frame)

    out_dir = tmp_path / "out"
    args = demo.get_parser().parse_args([
        "--video", str(frames_dir),
        "--config", "configs/MFT_demo_cpu_cfg.py",
        "--out", str(out_dir),
        "--grid_spacing", "16",
        "--max_frames", "3",
    ])
    n = demo.run(args)
    assert n == 3
    pts = out_dir / "clip_points.mp4"
    edit = out_dir / "clip_edit.mp4"
    assert pts.exists() and pts.stat().st_size > 0
    assert edit.exists() and edit.stat().st_size > 0


@pytest.mark.slow
def test_flow_demo_end_to_end(tmp_path, rng):
    """flow_demo.run writes one frame-over-flow(-over-OU) panel per
    consecutive pair (reference MFT/RAFT/demo.py:42-75 headless parity)."""
    from mft_tpu.apps import flow_demo

    frames_dir = tmp_path / "clip"
    frames_dir.mkdir()
    H = W = 64
    base = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
    for i in range(3):
        M = np.float32([[1, 0, 2 * i], [0, 1, i]])
        cv2.imwrite(str(frames_dir / f"{i:04d}.png"),
                    cv2.warpAffine(base, M, (W, H)))

    out_dir = tmp_path / "fout"
    args = flow_demo.get_parser().parse_args([
        "--video", str(frames_dir),
        "--config", "configs/MFT_demo_cpu_cfg.py",
        "--out", str(out_dir), "--mp4", "--show_ou",
    ])
    n = flow_demo.run(args)
    assert n == 2
    panel = cv2.imread(str(out_dir / "flow_0000.png"))
    assert panel.shape == (3 * H, W, 3)  # frame + flow + OU rows
    assert (out_dir / "flow.mp4").stat().st_size > 0
