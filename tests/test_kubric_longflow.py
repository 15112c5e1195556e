"""Kubric longterm-flow generator vs analytic scene geometry."""

import numpy as np

from mft_tpu.train.kubric_longflow import (quat_rotate, quat_rotate_inverse,
                                           track_scene, save_scene_flowous,
                                           intrinsics)


def test_quaternion_rotation():
    # 90deg about z: (w, x, y, z) = (cos45, 0, 0, sin45); x axis -> y axis
    q = np.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
    v = np.array([[1.0, 0.0, 0.0]])
    np.testing.assert_allclose(quat_rotate(q[None], v), [[0, 1, 0]], atol=1e-12)
    np.testing.assert_allclose(quat_rotate_inverse(q[None], quat_rotate(q[None], v)),
                               v, atol=1e-12)


def make_plane_scene(T=4, H=32, W=32, cam_z=5.0, cam_dx=0.2, obj_dy=0.3):
    """Static plane at z=0 viewed top-down; camera slides +x; a square object
    (instance 1) on the plane translates +y in world space."""
    depth = np.full((T, H, W), cam_z, np.float64)
    seg = np.zeros((T, H, W), np.int32)
    # object square occupying a block of frame-0 pixels (y 8..16, x 8..16)
    seg[0, 8:16, 8:16] = 1
    cam_pos = np.stack([np.arange(T) * cam_dx,
                        np.zeros(T), np.full(T, cam_z)], axis=1)
    cam_quat = np.tile(np.array([1.0, 0, 0, 0]), (T, 1))  # identity: looks -z
    obj_pos = np.stack([np.zeros(T), np.arange(T) * obj_dy, np.zeros(T)], axis=1)
    obj_quat = np.tile(np.array([1.0, 0, 0, 0]), (T, 1))
    return {
        "depth": depth,
        "segmentation": seg,
        "camera": {"focal_length": 35.0, "sensor_width": 32.0,
                   "positions": cam_pos, "quaternions": cam_quat},
        "instances": {"positions": obj_pos[None], "quaternions": obj_quat[None]},
    }


def test_track_scene_analytic():
    T, H, W, cam_z, cam_dx, obj_dy = 4, 32, 32, 5.0, 0.2, 0.3
    scene = make_plane_scene(T, H, W, cam_z, cam_dx, obj_dy)
    flows, occl, marker = track_scene(scene)
    fx, fy, _, _ = intrinsics(scene["camera"], H, W)

    # background: pure camera translation +x -> flow_u = -fx*dx*t/z, flow_v = 0
    bg = scene["segmentation"][0] == 0
    for t in range(T):
        want_u = -fx * cam_dx * t / cam_z
        np.testing.assert_allclose(flows[t, ..., 0][bg], want_u, atol=1e-6)
        np.testing.assert_allclose(flows[t, ..., 1][bg], 0.0, atol=1e-6)

    # object: world +y motion -> image -v motion (y up in cam, v down in img),
    # plus the camera-translation component
    ob = scene["segmentation"][0] == 1
    for t in range(T):
        want_u = -fx * cam_dx * t / cam_z
        want_v = -fy * obj_dy * t / cam_z
        np.testing.assert_allclose(flows[t, ..., 0][ob], want_u, atol=1e-6)
        np.testing.assert_allclose(flows[t, ..., 1][ob], want_v, atol=1e-6)

    # nothing leaves view or goes behind geometry in this gentle scene except
    # pixels pushed out of frame by the camera motion
    assert occl[0].sum() == 0
    assert marker.sum() == 8 * 8


def test_track_scene_occlusion_out_of_view():
    scene = make_plane_scene(T=3, H=16, W=16, cam_dx=10.0)  # huge camera jump
    flows, occl, _ = track_scene(scene)
    assert occl[2].mean() > 0.9  # almost everything left the view


def test_save_scene_flowous_roundtrip(tmp_path):
    from mft_tpu.io.flowou_codecs import read_flowou
    scene = make_plane_scene()
    flows, occl, marker = track_scene(scene)
    save_scene_flowous(tmp_path, flows, occl, marker)
    files = sorted(tmp_path.glob("*.flowou.png"))
    assert len(files) == 4
    f0, _, _ = read_flowou(files[0])
    # frame 0 stores an all-zero flow: these flows are exact, so the
    # correct_flow compensation must be a no-op (the reference's 0.5 object
    # marker compensates a raster offset its upstream data carries and this
    # generator does not inject)
    np.testing.assert_allclose(f0, 0.0, atol=1 / 16)
    f2, o2, _ = read_flowou(files[2])
    np.testing.assert_allclose(f2, flows[2], atol=1 / 16)


def test_roundtrip_into_kubric_dataset(tmp_path):
    """Generated files load through KubricLongTerm with correct_flow."""
    import cv2
    from mft_tpu.train.datasets import KubricLongTerm

    scene = make_plane_scene(T=3)
    flows, occl, marker = track_scene(scene)
    scene_dir = tmp_path / "train" / "00000"
    save_scene_flowous(scene_dir / "flowou", flows, occl, marker)
    (scene_dir / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for t in range(3):
        cv2.imwrite(str(scene_dir / "images" / f"{t:04d}.png"),
                    rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))

    ds = KubricLongTerm(None, split="train", root=tmp_path, correct_flow=True)
    assert len(ds) == 2
    img1, img2, flow, valid, occl_out = ds[0]
    assert flow.shape == (32, 32, 2)
    assert valid.min() >= 0 and valid.max() <= 1
    # the zero frame-0 flow makes correct_flow a no-op: the exact generated
    # flows pass through unbiased EVERYWHERE — object pixels included (a 0.5
    # marker here used to inject a -0.5 px object bias, see
    # save_scene_flowous)
    np.testing.assert_allclose(flow, flows[1], atol=0.1)
    np.testing.assert_allclose(valid, 1.0)
