"""TAP-Vid dataset reading and query sampling.

Role parity with reference MFT/evaluation/tapvid_eval_stuff.py (Apache-2.0
DeepMind protocol code): pickle readers for DAVIS-style dicts and
Kinetics-style jpeg-shard lists, multi-stage resolution scaling strings
('256x256_512x512'), first/strided query sampling, and fake/lazy video modes
for metric-only runs.

All protocol-critical conventions are preserved: points in the pickles are
[x, y] scaled 0..1; query points are [t, y, x] in FINAL-resolution raster
coordinates; strided queries are sampled every 5 frames at visible positions.
"""

import io as python_io
import pickle
from pathlib import Path

import numpy as np

from mft_tpu.utils.misc import parse_scale_WH


def resize_video(video, output_size, fake_video=False, lazy_video=False):
    """Resize (N, H, W, 3) uint8 video to output_size=(H', W').

    fake_video returns zeros (metric-only runs never look at pixels,
    reference tapvid_eval_stuff.py:70-75); lazy_video returns per-frame
    thunks. Uses cv2 INTER_AREA for downscaling / INTER_LINEAR otherwise
    (the reference uses mediapy, unavailable here; resampling choice only
    affects tracker inputs, not the protocol).
    """
    import cv2

    N, H, W, C = video.shape
    Ho, Wo = output_size
    if fake_video:
        return np.zeros((N, Ho, Wo, C), dtype=video.dtype)

    interp = cv2.INTER_AREA if (Ho <= H and Wo <= W) else cv2.INTER_LINEAR

    def one(frame):
        return cv2.resize(frame, (Wo, Ho), interpolation=interp)

    if lazy_video:
        return [(lambda f=video[i]: one(f)) for i in range(N)]
    return np.stack([one(video[i]) for i in range(N)])


def sample_queries_first(target_occluded, target_points, frames):
    """One query per track at its first visible frame.

    args: target_occluded (N, T) bool; target_points (N, T, 2) [x, y] in
    raster coords; frames (T, H, W, 3).
    returns dict with video (1,T,H,W,3), query_points (1,N,3) [t,y,x],
    target_points (1,N,T,2), occluded (1,N,T), trackgroup (1,N).
    Reference parity: tapvid_eval_stuff.py:339-386.
    """
    valid = np.sum(~target_occluded, axis=1) > 0
    target_points = target_points[valid]
    target_occluded = target_occluded[valid]
    trackgroup = np.arange(target_occluded.shape[0])

    first_visible = np.argmax(~target_occluded, axis=1)  # (N,)
    q = np.stack([
        first_visible.astype(np.float64),
        target_points[np.arange(len(first_visible)), first_visible, 1],
        target_points[np.arange(len(first_visible)), first_visible, 0],
    ], axis=-1)
    return {
        "video": frames[None],
        "query_points": q[None],
        "target_points": target_points[None],
        "occluded": target_occluded[None],
        "trackgroup": trackgroup[None],
    }


def sample_queries_strided(target_occluded, target_points, frames,
                           query_stride=5):
    """Queries at every ``query_stride``-th frame where the track is visible.

    Tracks appear once per valid query frame (trackgroup records the source
    track). Reference parity: tapvid_eval_stuff.py:275-336.
    """
    queries, tracks, occs, groups = [], [], [], []
    trackgroup = np.arange(target_occluded.shape[0])
    for i in range(0, target_occluded.shape[1], query_stride):
        mask = ~target_occluded[:, i]
        q = np.stack([
            np.full(target_occluded.shape[0], i, np.float64),
            target_points[:, i, 1],
            target_points[:, i, 0],
        ], axis=-1)
        queries.append(q[mask])
        tracks.append(target_points[mask])
        occs.append(target_occluded[mask])
        groups.append(trackgroup[mask])
    return {
        "video": frames[None],
        "query_points": np.concatenate(queries)[None],
        "target_points": np.concatenate(tracks)[None],
        "occluded": np.concatenate(occs)[None],
        "trackgroup": np.concatenate(groups)[None],
    }


def _load_kinetics_video(data):
    """Decode a list of jpeg byte strings into (N, H, W, 3) uint8 RGB."""
    from PIL import Image

    frames = [np.asarray(Image.open(python_io.BytesIO(b))) for b in data["video"]]
    data["video"] = np.stack(frames)
    return data


def load_pickle_sequences(pickle_path):
    """Load a TAP-Vid pickle into an ordered {name: record} dict.

    Supports DAVIS-style dicts and Kinetics-style shard lists (jpeg frames),
    reference tapvid_eval_stuff.py:552-579.
    """
    with open(pickle_path, "rb") as f:
        data = pickle.load(f)
    if isinstance(data, list):  # kinetics shard
        shard = Path(pickle_path).stem
        data = {f"kin-{shard}-{i:04d}": _load_kinetics_video(rec)
                for i, rec in enumerate(data)}
    return data


def create_tapvid_dataset(pickle_path, query_modes, scaling=None,
                          fake_video=False, lazy_video=False):
    """Yield per-sequence evaluation records.

    args:
      pickle_path: TAP-Vid pickle (DAVIS dict or Kinetics shard list).
      query_modes: iterable of 'first' / 'strided'.
      scaling: resolution string ('256x256', '256x256_512x512', 'fullres', ...)
        — the video passes through ALL stages in order; query/target points
        are scaled to the FINAL stage resolution.
      fake_video/lazy_video: skip or defer pixel decoding (metric-only runs).

    yields: {'video_name': str, 'data': {mode: sampled record}}.
    Reference parity: tapvid_eval_stuff.py:552-672.
    """
    if isinstance(query_modes, str):
        query_modes = [query_modes]
    sequences = load_pickle_sequences(pickle_path)
    for name, record in sequences.items():
        frames = record["video"]
        N, H, W, C = frames.shape
        shape = {"W": W, "H": H}
        stages = parse_scale_WH(scaling or "fullres", shape)
        for stage in stages:
            frames = resize_video(frames, (stage["H"], stage["W"]),
                                  fake_video=fake_video, lazy_video=lazy_video)
            if lazy_video and not isinstance(frames, np.ndarray):
                break  # lazy mode: single stage only
        final = stages[-1]

        points = record["points"] * np.array([final["W"], final["H"]])
        occluded = record["occluded"]

        data = {}
        for mode in query_modes:
            if mode == "first":
                data[mode] = sample_queries_first(occluded, points, frames)
            elif mode == "strided":
                data[mode] = sample_queries_strided(occluded, points, frames)
            else:
                raise ValueError(f"unknown query mode {mode}")
        yield {"video_name": name, "data": data}


def create_rgb_stacking_dataset(pickle_path, query_mode="strided",
                                train_size=(256, 256)):
    """TAP-Vid RGB-stacking (robotics) sequences.

    Reference parity: tapvid_eval_stuff.py:675-702 — a pickle holding a LIST
    of examples with decoded video arrays; frames are normalized to [-1, 1]
    and the point coordinates scaled to the fixed 256x256 protocol size.

    yields: {'robotics': sampled record}.
    """
    with open(pickle_path, "rb") as f:
        examples = pickle.load(f)
    H, W = train_size
    for example in examples:
        frames = example["video"]
        if frames.shape[1:3] != (H, W):  # native RGB-stacking is 256x256
            frames = resize_video(frames, (H, W))
        frames = frames.astype(np.float32) / 255.0 * 2.0 - 1.0
        points = example["points"] * np.array([W, H])
        occluded = example["occluded"]
        if query_mode == "strided":
            converted = sample_queries_strided(occluded, points, frames)
        elif query_mode == "first":
            converted = sample_queries_first(occluded, points, frames)
        else:
            raise ValueError(f"unknown query mode {query_mode!r}")
        yield {"robotics": converted}


def create_jhmdb_dataset(jhmdb_path, train_size=(256, 256)):
    """JHMDB pose-tracking sequences (split1 test videos) for PCK eval.

    Reference parity: tapvid_eval_stuff.py:389-485, without the TF I/O and
    without the convergence-display shuffle (videos come in sorted order —
    the per-video records are identical). Layout expected under
    ``jhmdb_path``: ``splits/*_test_split1.txt`` (``<video>.avi 2`` marks
    test videos), ``joint_positions/<video>/joint_positions.mat`` (field
    ``pos_img`` (2, n_joints, n_frames)), ``Rename_Images/<video>/*.png``.

    yields: {'jhmdb': record} with video/query/target points scaled to
    ``train_size``, invalid first-frame joints set to -1, frames in [-1, 1].
    """
    from PIL import Image
    from scipy import io as scipy_io

    root = Path(jhmdb_path)
    videos = []
    for split_file in sorted((root / "splits").glob("*split1.txt")):
        video_folder = "_".join(split_file.name.split("_")[:-2])
        for line in split_file.read_text().splitlines():
            if not line.strip():
                continue
            video, traintest = line.split()
            video = video.rsplit(".", 1)[0]
            if int(traintest) == 2:
                videos.append(f"{video_folder}/{video}")
    if not videos:
        raise ValueError(f"No JHMDB videos found in directory {jhmdb_path}")

    Ht, Wt = train_size
    for video in videos:
        joints = root / "joint_positions" / video / "joint_positions.mat"
        if not joints.exists():
            continue
        gt_pose = scipy_io.loadmat(str(joints))["pos_img"]
        gt_pose = np.transpose(gt_pose, [1, 2, 0])  # (n_joints, n_frames, 2)

        frame_files = sorted((root / "Rename_Images" / video).glob("*.png"))
        frames = np.stack([np.asarray(Image.open(f).convert("RGB"), np.uint8)
                           for f in frame_files])
        height, width = frames.shape[1:3]

        invalid = np.logical_or(
            np.logical_or(gt_pose[:, 0:1, 0] < 0, gt_pose[:, 0:1, 0] >= width),
            np.logical_or(gt_pose[:, 0:1, 1] < 0, gt_pose[:, 0:1, 1] >= height))
        invalid = np.tile(invalid, [1, gt_pose.shape[1]])[..., None].astype(np.float32)

        gt_pose_orig = gt_pose
        gt_pose = gt_pose * np.array([Wt / width, Ht / height])
        gt_pose = (1.0 - invalid) * gt_pose + invalid * (-1.0)

        frames = resize_video(frames, (Ht, Wt))
        frames = frames / (255.0 / 2.0) - 1.0
        queries = gt_pose[:, 0]
        queries = np.concatenate([queries[..., 0:1] * 0, queries[..., ::-1]],
                                 axis=-1)
        if gt_pose.shape[1] < frames.shape[0]:
            frames = frames[: gt_pose.shape[1]]  # pose shorter than video

        yield {"jhmdb": {
            "video": frames[np.newaxis],
            "query_points": queries[np.newaxis],
            "target_points": gt_pose[np.newaxis],
            "gt_pose": gt_pose[np.newaxis],
            "gt_pose_orig": gt_pose_orig[np.newaxis],
            "occluded": gt_pose[np.newaxis, ..., 0] * 0,
            "fname": video,
            "im_size": np.array([height, width]),
        }}
