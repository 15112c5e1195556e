"""Kubric 'MOVi-E longterm' ground-truth generator: dense template->frame
flow + occlusion for every pixel of frame 0 of a Kubric scene.

Role parity with reference MFT/RAFT/multiflow_from_kubric.py (1.4k LoC of
TF1-era code): for each frame-0 pixel, unproject with the depth map and
camera pose, attach the 3D point to its object (or the static background),
move it with the object's rigid pose to every other frame, reproject with
that frame's camera, and test occlusion by depth comparison. Results are
written as ``0000_to_XXXX.flowou.png`` files consumed by
``mft_tpu.train.datasets.KubricLongTerm``; the 0000_to_0000 file is an
all-zero flow — these flows are exact, so the correct_flow compensation the
reference data needs (datasets.py:358-369, removing its +0.5 px object
raster offset) reduces to a no-op (see save_scene_flowous).

Conventions (Kubric/Blender): camera looks along -Z with +X right and +Y up
in camera space; quaternions are (w, x, y, z); 'depth' is range along the
optical axis (z-depth). Scene dict layout matches the MOVi-E tfds record:

  scene = {
    'depth': (T, H, W) float32,
    'segmentation': (T, H, W) int32  (0 = background, k = instance k),
    'camera': {'focal_length': f, 'sensor_width': s,
               'positions': (T, 3), 'quaternions': (T, 4)},
    'instances': {'positions': (K, T, 3), 'quaternions': (K, T, 4)},
  }
"""

import argparse
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

DEPTH_OCCLUSION_RTOL = 0.01   # relative depth slack for the occlusion test
DEPTH_OCCLUSION_ATOL = 0.05


# -- quaternion algebra (w, x, y, z) ---------------------------------------- #

def quat_rotate(q, v):
    """Rotate vectors v (..., 3) by quaternions q (..., 4)."""
    q = np.asarray(q, np.float64)
    v = np.asarray(v, np.float64)
    w, x, y, z = q[..., 0:1], q[..., 1:2], q[..., 2:3], q[..., 3:4]
    u = np.concatenate([x, y, z], axis=-1)
    uv = np.cross(u, v)
    uuv = np.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def quat_conjugate(q):
    return np.concatenate([q[..., 0:1], -q[..., 1:4]], axis=-1)


def quat_rotate_inverse(q, v):
    return quat_rotate(quat_conjugate(np.asarray(q, np.float64)), v)


# -- camera model ------------------------------------------------------------ #

def intrinsics(camera, H, W):
    """Pixel focal lengths + principal point from Kubric camera params."""
    f = float(np.asarray(camera["focal_length"]))
    sw = float(np.asarray(camera["sensor_width"]))
    fx = f / sw * W
    fy = fx  # Kubric sensor height = sensor_width * H / W -> square pixels
    return fx, fy, W / 2.0, H / 2.0


def unproject(depth, camera, frame, H, W):
    """Frame pixels + z-depth -> world points (H, W, 3)."""
    fx, fy, cx, cy = intrinsics(camera, H, W)
    us, vs = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    d = np.asarray(depth, np.float64)
    x = (us - cx) / fx * d
    y = -(vs - cy) / fy * d
    z = -d
    p_cam = np.stack([x, y, z], axis=-1)
    q = np.asarray(camera["quaternions"])[frame]
    t = np.asarray(camera["positions"])[frame]
    return quat_rotate(q[None, None], p_cam) + t


def project(p_world, camera, frame, H, W):
    """World points (..., 3) -> (u, v) pixel coords + z-depth."""
    fx, fy, cx, cy = intrinsics(camera, H, W)
    q = np.asarray(camera["quaternions"])[frame]
    t = np.asarray(camera["positions"])[frame]
    p_cam = quat_rotate_inverse(q[None, None], p_world - t)
    z = -p_cam[..., 2]
    z_safe = np.where(np.abs(z) < 1e-9, 1e-9, z)
    u = cx + fx * p_cam[..., 0] / z_safe
    v = cy - fy * p_cam[..., 1] / z_safe
    return u, v, z


# -- tracking ----------------------------------------------------------------- #

def _bilinear(data, u, v):
    """Bilinear sample (H, W) float data at (u, v) pixel-center coords."""
    H, W = data.shape
    x = np.clip(u - 0.5, 0, W - 1)
    y = np.clip(v - 0.5, 0, H - 1)
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    x1 = np.minimum(x0 + 1, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    wx = x - x0
    wy = y - y0
    return (data[y0, x0] * (1 - wx) * (1 - wy) + data[y0, x1] * wx * (1 - wy)
            + data[y1, x0] * (1 - wx) * wy + data[y1, x1] * wx * wy)


def track_scene(scene):
    """Generate template->frame flow + occlusion for every frame.

    returns: flows (T, H, W, 2) float32, occlusions (T, H, W) float32,
    object_marker (H, W) bool (frame-0 instance mask, for the 0.5-marker).
    """
    depth = np.asarray(scene["depth"])
    seg = np.asarray(scene["segmentation"])
    camera = scene["camera"]
    inst_pos = np.asarray(scene["instances"]["positions"])  # (K, T, 3)
    inst_quat = np.asarray(scene["instances"]["quaternions"])  # (K, T, 4)
    T, H, W = depth.shape

    # frame-0 pixel -> world point + owning instance
    p_world0 = unproject(depth[0], camera, 0, H, W)  # (H, W, 3)
    seg0 = seg[0]
    us0, vs0 = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)

    # precompute object-local coordinates for instance-attached pixels
    K = inst_pos.shape[0]
    local = np.zeros_like(p_world0)
    for k in range(K):
        mask = seg0 == (k + 1)
        if not mask.any():
            continue
        local[mask] = quat_rotate_inverse(inst_quat[k, 0][None],
                                          p_world0[mask] - inst_pos[k, 0])

    flows = np.zeros((T, H, W, 2), np.float32)
    occlusions = np.zeros((T, H, W), np.float32)
    for t in range(T):
        p_world_t = p_world0.copy()
        for k in range(K):
            mask = seg0 == (k + 1)
            if not mask.any():
                continue
            p_world_t[mask] = (quat_rotate(inst_quat[k, t][None], local[mask])
                               + inst_pos[k, t])
        u, v, z = project(p_world_t, camera, t, H, W)
        flows[t, ..., 0] = u - us0
        flows[t, ..., 1] = v - vs0

        in_view = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (z > 0)
        depth_at = _bilinear(depth[t].astype(np.float64), u, v)
        behind = z > depth_at * (1 + DEPTH_OCCLUSION_RTOL) + DEPTH_OCCLUSION_ATOL
        occlusions[t] = (~in_view | behind).astype(np.float32)

    return flows, occlusions, seg0 > 0


def save_scene_flowous(out_dir, flows, occlusions, object_marker=None):
    """Write 0000_to_XXXX.flowou.png files (+ a ZERO frame-0 flow).

    The reference pipeline's data carries a +0.5 px raster offset on object
    pixels (multiflow_from_kubric.py pixel_to_raster) which KubricDataset's
    ``correct_flow`` removes by subtracting the 0000_to_0000 marker and
    back-warping. THIS generator computes exact flows with one consistent
    pixel-center convention for all pixels, so it writes an all-zero frame-0
    flow: correct_flow then reduces to a no-op and the exact flows pass
    through unbiased (writing the 0.5 marker here would make correct_flow
    inject a spurious -0.5 px bias + half-pixel resample on every object
    pixel). ``object_marker`` is accepted for API compatibility but not
    encoded.
    """
    from mft_tpu.io.flowou_codecs import write_flowou

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    T, H, W = occlusions.shape
    sigma = np.zeros((H, W), np.float32)
    write_flowou(out_dir / "0000_to_0000.flowou.png",
                 np.zeros((H, W, 2), np.float32),
                 np.zeros((H, W), np.float32), sigma)
    for t in range(1, T):
        write_flowou(out_dir / f"0000_to_{t:04d}.flowou.png",
                     flows[t], occlusions[t], sigma)


def load_movi_scene(record):
    """Convert one tfds MOVi-E record into the scene dict layout."""
    def arr(x):
        return np.asarray(x)

    depth = arr(record["depth"])
    if depth.ndim == 4:  # (T, H, W, 1)
        depth = depth[..., 0]
    # tfds movi stores depth min/max-quantized in uint16 when not decoded;
    # assume float here (tfds decodes to float via depth_range features)
    return {
        "depth": depth,
        "segmentation": arr(record["segmentations"])[..., 0]
        if arr(record["segmentations"]).ndim == 4 else arr(record["segmentations"]),
        "video": arr(record["video"]),
        "camera": {
            "focal_length": arr(record["camera"]["focal_length"]),
            "sensor_width": arr(record["camera"]["sensor_width"]),
            "positions": arr(record["camera"]["positions"]),
            "quaternions": arr(record["camera"]["quaternions"]),
        },
        "instances": {
            "positions": arr(record["instances"]["positions"]),
            "quaternions": arr(record["instances"]["quaternions"]),
        },
    }


def generate_dataset(tfds_name, data_dir, out_root, split="train",
                     max_scenes=None):
    """Stream a MOVi tfds dataset and write the longterm flow ground truth."""
    import tensorflow_datasets as tfds  # optional heavy dep
    import cv2

    out_root = Path(out_root) / split
    ds = tfds.load(tfds_name, data_dir=data_dir, split=split)
    for i, record in enumerate(tfds.as_numpy(ds)):
        if max_scenes is not None and i >= max_scenes:
            break
        scene = load_movi_scene(record)
        scene_dir = out_root / f"{i:05d}"
        flows, occl, marker = track_scene(scene)
        save_scene_flowous(scene_dir / "flowou", flows, occl, marker)
        img_dir = scene_dir / "images"
        img_dir.mkdir(parents=True, exist_ok=True)
        for t, frame in enumerate(scene["video"]):
            cv2.imwrite(str(img_dir / f"{t:04d}.png"), frame[:, :, ::-1])
        logger.info("scene %05d done (%d frames)", i, len(scene["video"]))


def main():
    parser = argparse.ArgumentParser(description="Kubric longterm flow GT generator")
    parser.add_argument("--tfds_name", default="movi_e/256x256")
    parser.add_argument("--data_dir", default=None)
    parser.add_argument("--out", default="datasets/kubric_movi_e_longterm")
    parser.add_argument("--split", default="train")
    parser.add_argument("--max_scenes", type=int, default=None)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    generate_dataset(args.tfds_name, args.data_dir, args.out, args.split,
                     args.max_scenes)


if __name__ == "__main__":
    main()
