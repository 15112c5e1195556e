"""TAP-Vid eval stack: metric parity vs reference, query sampling, e2e runner."""

import pickle
import sys
import types

import numpy as np
import pytest

from mft_tpu.eval.metrics import compute_tapvid_metrics
from mft_tpu.eval.tapvid import (sample_queries_first, sample_queries_strided,
                                 create_tapvid_dataset, resize_video)


def _reference_tves():
    """Import the reference evaluation module (oracle), stubbing mediapy."""
    if "mediapy" not in sys.modules:
        stub = types.ModuleType("mediapy")
        stub.resize_video = lambda v, size: v  # not used by the metric fn
        sys.modules["mediapy"] = stub
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        from MFT.evaluation import tapvid_eval_stuff as tves
        return tves
    except Exception:
        return None


def synth_tracks(rng, N=12, T=20, noise=1.0):
    gt_tracks = rng.uniform(20, 230, (1, N, 1, 2)) + \
        np.cumsum(rng.normal(0, 2, (1, N, T, 2)), axis=2)
    gt_occluded = rng.uniform(size=(1, N, T)) < 0.2
    gt_occluded[:, :, 0] = False  # queries visible at t=0
    pred_tracks = gt_tracks + rng.normal(0, noise, gt_tracks.shape)
    pred_occluded = gt_occluded ^ (rng.uniform(size=gt_occluded.shape) < 0.1)
    q = np.stack([np.zeros(N), gt_tracks[0, :, 0, 1], gt_tracks[0, :, 0, 0]],
                 axis=-1)[None]
    return q, gt_occluded, gt_tracks, pred_occluded, pred_tracks


@pytest.mark.parametrize("query_mode", ["first", "strided"])
def test_metrics_match_reference(rng, query_mode):
    tves = _reference_tves()
    if tves is None:
        pytest.skip("reference eval module not importable")
    q, gt_o, gt_t, pr_o, pr_t = synth_tracks(rng)
    ours = compute_tapvid_metrics(q, gt_o, gt_t, pr_o, pr_t, query_mode)
    want = tves.compute_tapvid_metrics(q, gt_o, gt_t, pr_o, pr_t, query_mode)
    assert set(ours) == set(want)
    for k in want:
        np.testing.assert_allclose(ours[k], want[k], atol=1e-9, err_msg=k)


def test_metrics_perfect_prediction(rng):
    q, gt_o, gt_t, _, _ = synth_tracks(rng)
    m = compute_tapvid_metrics(q, gt_o, gt_t, gt_o, gt_t, "strided")
    assert m["occlusion_accuracy"][0] == 1.0
    assert m["average_jaccard"][0] == 1.0
    assert m["average_pts_within_thresh"][0] == 1.0


def test_query_sampling(rng):
    N, T = 6, 13
    occl = rng.uniform(size=(N, T)) < 0.3
    occl[0] = True  # fully occluded track -> dropped in 'first'
    occl[1, :4] = True
    occl[1, 4] = False
    pts = rng.uniform(0, 256, (N, T, 2))
    frames = np.zeros((T, 8, 8, 3), np.uint8)

    first = sample_queries_first(occl, pts, frames)
    n_valid = int(np.sum(np.any(~occl, axis=1)))
    assert first["query_points"].shape == (1, n_valid, 3)
    # track 1's query must be at its first visible frame (t=4), [t, y, x]
    i1 = list(np.where(np.any(~occl, axis=1))[0]).index(1)
    assert first["query_points"][0, i1, 0] == 4
    np.testing.assert_allclose(first["query_points"][0, i1, 1:],
                               pts[1, 4][::-1])

    strided = sample_queries_strided(occl, pts, frames, query_stride=5)
    expect = sum(int(np.sum(~occl[:, i])) for i in range(0, T, 5))
    assert strided["query_points"].shape == (1, expect, 3)
    assert set(np.unique(strided["query_points"][0, :, 0])) <= {0.0, 5.0, 10.0}


def make_synthetic_pickle(path, rng, n_seq=1, T=8, H=64, W=64, n_tracks=5,
                          shift=(1.0, 0.5)):
    """A DAVIS-format pickle with constant ``shift`` px/frame global motion."""
    data = {}
    for s in range(n_seq):
        video = np.zeros((T, H, W, 3), np.uint8)
        for t in range(T):
            video[t] = 100
            video[t, 0, 0, 0] = t  # frame-index marker for the fake flower
        # frame-0 points on integer pixels: the protocol runner truncates
        # query coords to int (as the reference does, run_MFT_tapvid.py:142),
        # which this small test resolution would otherwise amplify
        base = np.stack([rng.integers(8, int(0.6 * W), (n_tracks,)) / W,
                         rng.integers(8, int(0.6 * H), (n_tracks,)) / H],
                        axis=-1)[:, None, :]
        steps = np.arange(T).reshape(1, T, 1)
        motion = steps * np.array([shift[0] / W, shift[1] / H]).reshape(1, 1, 2)
        points = base + motion  # in 0..1 coords
        occluded = np.zeros((n_tracks, T), bool)
        data[f"seq{s}"] = {"video": video, "points": points.astype(np.float64),
                           "occluded": occluded}
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return path


def test_dataset_scaling_stages(tmp_path, rng):
    p = make_synthetic_pickle(tmp_path / "synth.pkl", rng, H=64, W=64)
    seqs = list(create_tapvid_dataset(p, ["first"], scaling="32x32_48x48"))
    assert len(seqs) == 1
    rec = seqs[0]["data"]["first"]
    assert rec["video"].shape[2:4] == (48, 48)
    # target points scaled to FINAL resolution
    assert rec["target_points"].max() <= 48.0


def test_runner_end_to_end(tmp_path, rng):
    """Full runner -> evaluator -> report round trip with the fake flower."""
    # integer per-frame shift + power-of-two resolution: queries at every
    # stride frame stay on EXACT integer pixels (1/64 is binary-exact), so the
    # protocol's int-truncation of query coords is lossless here
    pkl = make_synthetic_pickle(tmp_path / "synth.pkl", rng, T=6, H=64, W=64,
                                shift=(1.0, 1.0))

    tracker_cfg = tmp_path / "tracker_cfg.py"
    tracker_cfg.write_text(f"""
import numpy as np
from mft_tpu.config import Config
from mft_tpu.tracker import MFT
from tests.test_tracker import FakeFlower

def get_config():
    c = Config()
    c.tracker_class = MFT
    flow = Config()
    flow.of_class = FakeFlower
    flow.sigma_scale = 0.1
    flow.shift = (1.0, 1.0)
    flow.name = 'fake_flow'
    c.flow_config = flow
    c.deltas = [np.inf, 1, 2]
    c.occlusion_threshold = 0.02
    c.name = 'fake_tracker'
    return c
""")
    dataset_cfg = tmp_path / "dataset_cfg.py"
    dataset_cfg.write_text(f"""
from mft_tpu.config import Config

def get_config():
    c = Config()
    c.pickles = [r"{pkl}"]
    c.scaling = 'fullres'
    c.name = 'synth'
    return c
""")

    from mft_tpu.eval import runner, evaluate
    args = runner.get_parser().parse_args([
        "--trackers", str(tracker_cfg), "--dataset", str(dataset_cfg),
        "--export", str(tmp_path / "export"), "--cache", str(tmp_path / "cache"),
        "--mode", "both"])
    assert runner.run(args) == 0

    eargs = evaluate.get_parser().parse_args([
        "--trackers", str(tracker_cfg), "--dataset", str(dataset_cfg),
        "--export", str(tmp_path / "export"), "--mode", "both"])
    evaluate.run(eargs)

    import pandas as pd
    df = pd.read_pickle(tmp_path / "export/fake_tracker/eval/tapvid-eval.pklz")
    # fake flow exactly matches the synthetic GT motion -> (near-)perfect AJ
    assert df["average_jaccard"].mean() > 0.95, df
    df_s = pd.read_pickle(tmp_path / "export/fake_tracker/eval/tapvid-eval-strided.pklz")
    assert df_s["average_jaccard"].mean() > 0.95, df_s

    from mft_tpu.eval.report import report
    text = report(["fake_tracker"], tmp_path / "export")
    assert "fake_tracker (ours)" in text
    assert "CoTracker" in text


def test_rgb_stacking_dataset(tmp_path, rng):
    import pickle
    from mft_tpu.eval.tapvid import create_rgb_stacking_dataset

    N, H, W, P = 8, 32, 32, 5
    examples = [{
        "video": rng.integers(0, 255, (N, H, W, 3)).astype(np.uint8),
        "points": rng.uniform(0.1, 0.9, (P, N, 2)).astype(np.float32),
        "occluded": np.zeros((P, N), bool),
    }]
    pkl = tmp_path / "robotics.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(examples, f)

    recs = list(create_rgb_stacking_dataset(pkl, query_mode="first"))
    assert len(recs) == 1
    r = recs[0]["robotics"]
    assert r["video"].min() >= -1.0 and r["video"].max() <= 1.0
    assert r["target_points"].max() <= 256.0


def test_jhmdb_dataset(tmp_path, rng):
    import cv2
    from scipy import io as scipy_io
    from mft_tpu.eval.tapvid import create_jhmdb_dataset

    root = tmp_path
    (root / "splits").mkdir()
    video = "clap/vid001"
    (root / "splits" / "clap_test_split1.txt").write_text(
        "vid001.avi 2\nvid002.avi 1\n")
    (root / "joint_positions" / video).mkdir(parents=True)
    n_frames, n_joints, H, W = 6, 15, 40, 48
    pos = rng.uniform(5, 35, (2, n_joints, n_frames)).astype(np.float64)
    scipy_io.savemat(root / "joint_positions" / video / "joint_positions.mat",
                     {"pos_img": pos})
    (root / "Rename_Images" / video).mkdir(parents=True)
    for i in range(n_frames):
        cv2.imwrite(str(root / "Rename_Images" / video / f"{i:05d}.png"),
                    rng.integers(0, 255, (H, W, 3)).astype(np.uint8))

    recs = list(create_jhmdb_dataset(root))
    assert len(recs) == 1
    r = recs[0]["jhmdb"]
    assert r["video"].shape == (1, n_frames, 256, 256, 3)
    # reference layout: (n_joints, n_frames, 2) — TAP-Vid (P, N, 2) convention
    assert r["target_points"].shape == (1, n_joints, n_frames, 2)
    assert r["query_points"].shape == (1, n_joints, 3)
    # scaling: x scaled by 256/W
    np.testing.assert_allclose(r["gt_pose"][0, 0, 0, 0],
                               pos[0, 0, 0] * 256.0 / W, rtol=1e-6)
    assert (r["im_size"] == [H, W]).all()


def test_compute_pck(rng):
    """PCK: perfect prediction -> 1.0 at all alphas; a keypoint offset by
    0.15 * bbox-diagonal counts at alpha >= 0.2 but not at alpha 0.1."""
    from mft_tpu.eval.metrics import compute_pck

    T, J = 4, 5
    gt = rng.uniform(10, 90, (T, J, 2))
    res = compute_pck(gt, gt.copy())
    assert set(res) == {"PCK@0.1", "PCK@0.2", "PCK@0.3", "PCK@0.4", "PCK@0.5"}
    assert all(v == 1.0 for v in res.values())

    # one keypoint in one frame moved by 0.15 * that frame's bbox diagonal
    pred = gt.copy()
    bbox = gt[0].max(axis=0) - gt[0].min(axis=0)
    scale = np.hypot(*bbox)
    pred[0, 0, 0] += 0.15 * scale
    res = compute_pck(gt, pred)
    n = T * J
    assert res["PCK@0.1"] == pytest.approx((n - 1) / n)
    assert res["PCK@0.2"] == 1.0

    # valid mask excludes the bad keypoint entirely
    valid = np.ones((T, J), bool)
    valid[0, 0] = False
    res = compute_pck(gt, pred, valid=valid)
    assert res["PCK@0.1"] == 1.0


def test_latex_table():
    """Header/field-order parity with reference tapvid_eval_stuff.py:240-272."""
    from mft_tpu.eval.metrics import latex_table

    scalars = {"average_jaccard": 0.5, "average_pts_within_thresh": 0.7,
               "occlusion_accuracy": 0.9}
    for t in (1, 2, 4, 8, 16):
        scalars[f"jaccard_{t}"] = 0.4
        scalars[f"pts_within_{t}"] = 0.6
    out = latex_table(scalars)
    header, body = out.split("\n")
    assert header.startswith("AJ & $<\\delta^{x}_{avg}$ & OA")
    cells = body.split(" & ")
    assert len(cells) == 13
    assert cells[0] == "50.0" and cells[1] == "70.0" and cells[2] == "90.0"
    assert cells[3] == "40.0" and cells[-1] == "60.0"

    pck = {f"PCK@{a}": 0.25 for a in (0.1, 0.2, 0.3, 0.4, 0.5)}
    out = latex_table(pck)
    header, body = out.split("\n")
    assert header == "PCK@0.1 & PCK@0.2 & PCK@0.3 & PCK@0.4 & PCK@0.5"
    assert body.split(" & ") == ["25.0"] * 5


def test_jhmdb_pck_smoke(tmp_path, rng):
    """End-to-end: JHMDB reader fields -> PCK on a synthetic sequence."""
    from mft_tpu.eval.metrics import compute_pck

    T, J = 6, 15
    gt_pose_orig = rng.uniform(20, 200, (J, T, 2)).transpose(1, 0, 2)  # (T,J,2)
    # a tracker that is right except for small noise
    pred = gt_pose_orig + rng.normal(0, 1.0, gt_pose_orig.shape)
    res = compute_pck(gt_pose_orig, pred)
    assert res["PCK@0.5"] >= res["PCK@0.1"]
    assert res["PCK@0.1"] > 0.5  # 1px noise vs ~25px threshold
