"""Vis toolbox smoke + semantics tests (pure-numpy/cv2, no device)."""

import numpy as np

from mft_tpu.utils import vis


def _img(H=48, W=64):
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, (H, W, 3), dtype=np.uint8)


def test_flow_to_color_shapes_and_zero_flow_white():
    flow = np.zeros((16, 20, 2), np.float32)
    out = vis.flow_to_color(flow)
    assert out.shape == (16, 20, 3) and out.dtype == np.uint8
    assert (out > 250).all()  # zero flow renders (near-)white


def test_flow_to_color_distinct_directions():
    f = np.zeros((2, 2, 2), np.float32)
    f[0, 0] = [10, 0]; f[0, 1] = [-10, 0]
    f[1, 0] = [0, 10]; f[1, 1] = [0, -10]
    out = vis.flow_to_color(f).astype(int)
    dists = [np.abs(out[0, 0] - out[0, 1]).sum(),
             np.abs(out[1, 0] - out[1, 1]).sum()]
    assert min(dists) > 100  # opposite directions get very different colors


def test_overlays_run():
    img = _img()
    flow = np.ones((48, 64, 2), np.float32) * 3
    assert vis.vis_flow(flow, img).shape == img.shape
    assert vis.vis_flow_dots(flow, img).shape == img.shape
    occl = np.zeros((48, 64), np.float32)
    assert vis.vis_flow_dots(flow, img, occlusion=occl).shape == img.shape
    pts = np.array([[5.0, 5.0], [100.0, 5.0]])  # second out of bounds
    assert vis.draw_tracks(img, pts, occlusions=np.array([0.0, 1.0])).shape == img.shape


def test_blend_modes():
    a = np.full((8, 8, 3), 100, np.uint8)
    b = np.full((8, 8, 3), 200, np.uint8)
    assert (vis.blend(a, b, 0.5) == 150).all()
    alpha = np.ones((8, 8), np.float32)
    assert (vis.blend_with_alpha(a, b, alpha) == 100).all()
    premult = (a.astype(np.float32) * 0.5).astype(np.uint8)
    out = vis.blend_with_alpha_premult(premult, b, np.full((8, 8), 0.5))
    assert np.abs(out.astype(int) - 150).max() <= 1
    m = np.zeros((8, 8), bool); m[:4] = True
    tinted = vis.blend_mask(a, m, color=(0, 0, 255), alpha=1.0)
    assert (tinted[:4, :, 2] == 255).all() and (tinted[4:] == 100).all()


def test_hatching():
    pat = vis.hatch_pattern((32, 32), spacing=8)
    assert pat.dtype == bool and 0 < pat.mean() < 1
    img = _img(32, 32)
    mask = np.zeros((32, 32), bool); mask[8:24, 8:24] = True
    out = vis.hatch_overlay(img, mask, color=(255, 0, 0))
    changed = (out != img).any(axis=2)
    assert changed.any() and not changed[~mask].any()


def test_boards_grids_text():
    assert vis.checkerboard(16, 16, 4).shape == (16, 16)
    assert vis.color_checkerboard(16, 16, 4).shape == (16, 16, 3)
    assert vis.color_dotboard(32, 32, spacing=8).shape == (32, 32, 3)
    imgs = [_img(16, 16) for _ in range(5)]
    g = vis.image_grid(imgs, cols=3, pad=2)
    assert g.shape == (2 * 16 + 2, 3 * 16 + 2 * 2, 3)
    t = vis.tile_images([imgs[:2], imgs[2:4]], h_space=3)
    assert t.shape == (16 * 2 + 3, 16 * 2 + 3, 3)
    named = vis.name_images(imgs[:2], ["a", "b"])
    assert len(named) == 2 and named[0].shape == imgs[0].shape


def test_subpixel_drawing():
    img = np.zeros((32, 32, 3), np.uint8)
    vis.line(img, (2.5, 2.5), (29.5, 29.5), (255, 255, 255))
    vis.circle(img, (16.25, 16.25), 5.5, (0, 255, 0))
    vis.polylines(img, [(2.0, 29.0), (16.0, 2.0), (29.0, 29.0)], True,
                  (0, 0, 255))
    assert img.any()


def test_alignment_and_zoom():
    img = _img()
    flow = np.zeros((48, 64, 2), np.float32)
    out = vis.vis_flow_align(flow, img, img)
    assert out.shape == img.shape
    side = vis.vis_correspondences(flow, img, img, spacing=16)
    assert side.shape == (48, 128, 3)
    crops = vis.zoomins(img, (32, 24), zooms=(2, 4), win=32)
    assert len(crops) == 2 and crops[0].shape == (32, 32, 3)


def test_resize_align_corners():
    src = np.arange(16, dtype=np.uint8).reshape(4, 4)
    up = vis.resize(src, (7, 7), align_corners=True)
    # corner centers must map exactly
    assert up[0, 0] == src[0, 0] and up[-1, -1] == src[-1, -1]


def test_scalar_map_and_colorbar():
    data = np.linspace(0, 1, 64).reshape(8, 8)
    hm = vis.vis_scalar_map(data)
    assert hm.shape == (8, 8, 3)
    assert vis.colorbar((0, 1)).shape == (200, 30, 3)


def test_flow_gui_render_headless():
    img = _img(32, 40)
    flow = np.full((32, 40, 2), 2.0, np.float32)
    occl = np.zeros((32, 40), np.float32)
    sigma = np.ones((32, 40), np.float32)
    gui = vis.FlowGUI(flow, img, img, occlusion=occl, sigma=sigma)
    frame = gui.render((10, 10))
    assert frame.shape == (32, 80, 3)


def test_flow_to_color_matlab():
    flow = np.random.default_rng(0).normal(size=(16, 16, 2)).astype(np.float32) * 5
    out = vis.flow_to_color_matlab(flow, max_flow=3.0)
    assert out.shape == (16, 16, 3) and out.dtype == np.uint8


def test_extended_vis_helpers(rng):
    from mft_tpu.utils import vis

    img = rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)
    a = vis.vis_alignment_plain(img, np.roll(img, 3, axis=1))
    assert a.shape == img.shape and a.dtype == np.uint8

    corners = np.array([[5.0, 50, 50, 5], [5, 5, 30, 30]])
    assert vis.draw_corners(img, corners, (0, 255, 0)).shape == img.shape
    assert vis.vis_vector_in_center(img, (8, -4)).shape == img.shape
    assert vis.draw_box_with_margins(img, (5, 5), (50, 30), 3).shape == img.shape

    canvas = np.zeros((40, 60, 3), np.uint8)
    vis.place_img_at(np.full((10, 10, 3), 7, np.uint8), canvas, 2, 3)
    assert (canvas[2:12, 3:13] == 7).all() and canvas[0, 0, 0] == 0

    assert vis.shorten_text("short", 10) == "short"
    assert len(vis.shorten_text("averylongtexthere", 10)) == 10
    assert vis.shorten_text("averylongtexthere", 10).startswith("...")
    assert vis.shorten_text("averylongtexthere", 10, keep="left").endswith("...")

    pts = np.stack([rng.uniform(0, 59, 20), rng.uniform(0, 39, 20)])
    assert vis.vis_prosac_scores(pts, img).shape == img.shape

    ob = vis.OverlayBackground(img)
    drawn = img.copy()
    drawn[:] = 255
    out, = ob.overlay(drawn, alpha=0.5)
    assert out.shape == img.shape and out.mean() > img.mean()

    interp = vis.make_knn_interp(np.array([[0.0, 0], [2, 0], [0, 2]]),
                                 np.array([1.0, 5.0, 9.0]))
    v = interp(np.array([[0.1, 0.1]]), K=2)
    assert np.isfinite(v).all()
