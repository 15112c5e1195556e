"""Visualization toolbox: flow colorwheel, dot/track overlays, blending, grids.

Role parity with the reference's vis utilities (MFT/utils/vis_utils.py and
MFT/RAFT/core/utils/flow_viz.py): the Baker et al. optical-flow colorwheel,
flow field rendering (dense color + sparse dot styles), alpha blending,
checkerboards, image grids, and simple text/shape drawing via cv2.
"""

import numpy as np
import cv2


# -- Baker et al. colorwheel ------------------------------------------------ #

def _make_colorwheel():
    """55-color wheel (RY/YG/GC/CB/BM/MR ramps), rows = colors, cols = RGB."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    wheel = np.zeros((RY + YG + GC + CB + BM + MR, 3))
    col = 0
    ramps = [
        (RY, 0, 1, False), (YG, 1, 0, True), (GC, 1, 2, False),
        (CB, 2, 1, True), (BM, 2, 0, False), (MR, 0, 2, True),
    ]
    for n, c_full, c_ramp, down in ramps:
        wheel[col:col + n, c_full] = 255
        ramp = np.floor(255 * np.arange(n) / n)
        wheel[col:col + n, c_ramp] = 255 - ramp if down else ramp
        col += n
    return wheel


_COLORWHEEL = _make_colorwheel()


def flow_to_color(flow, clip_flow=None, convert_to_bgr=False, rad_max=None):
    """(H, W, 2) flow -> (H, W, 3) uint8 colorwheel visualization.

    Reference parity: flow_viz.py flow_to_color (magnitude-normalized hue
    encoding; unnormalized radius saturates toward white).
    """
    flow = np.asarray(flow, np.float32)
    if clip_flow is not None:
        flow = np.clip(flow, -clip_flow, clip_flow)
    u, v = flow[..., 0], flow[..., 1]
    rad = np.sqrt(u ** 2 + v ** 2)
    if rad_max is None:
        rad_max = max(float(rad.max()), 1e-5)
    u, v = u / rad_max, v / rad_max
    rad = rad / rad_max

    ncols = _COLORWHEEL.shape[0]
    a = np.arctan2(-v, -u) / np.pi  # [-1, 1]
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(np.int32)
    k1 = (k0 + 1) % ncols
    f = fk - k0

    img = np.zeros((*u.shape, 3), np.uint8)
    for c in range(3):
        col0 = _COLORWHEEL[k0, c] / 255.0
        col1 = _COLORWHEEL[k1, c] / 255.0
        col = (1 - f) * col0 + f * col1
        col = 1 - rad * (1 - col)  # saturate small flows toward white
        ch = 2 - c if convert_to_bgr else c
        img[..., ch] = np.floor(255 * col)
    return img


# -- overlays ---------------------------------------------------------------- #

def vis_flow(flow, img=None, alpha=0.6, rad_max=None):
    """Dense flow color overlaid on an optional BGR image."""
    color = flow_to_color(flow, convert_to_bgr=True, rad_max=rad_max)
    if img is None:
        return color
    return blend(img, color, alpha)


def vis_flow_dots(flow, img, spacing=16, occlusion=None, scale=1.0):
    """Sparse arrows/dots visualization of a dense flow on a BGR image."""
    canvas = img.copy()
    H, W = flow.shape[:2]
    for y in range(spacing // 2, H, spacing):
        for x in range(spacing // 2, W, spacing):
            dx, dy = flow[y, x] * scale
            occluded = occlusion is not None and occlusion[y, x] > 0.5
            color = (0, 0, 255) if occluded else (0, 255, 0)
            cv2.arrowedLine(canvas, (x, y), (int(round(x + dx)), int(round(y + dy))),
                            color, 1, tipLength=0.3)
    return canvas


def draw_tracks(img, coords, occlusions=None, radius=3):
    """Point-track dots: green visible, red occluded (demo-style)."""
    canvas = img.copy()
    H, W = img.shape[:2]
    for i, (x, y) in enumerate(np.asarray(coords)):
        xi, yi = int(round(float(x))), int(round(float(y)))
        if not (0 <= xi < W and 0 <= yi < H):
            continue
        occl = occlusions is not None and occlusions[i] > 0.5
        cv2.circle(canvas, (xi, yi), radius,
                   (0, 0, 255) if occl else (0, 255, 0), -1)
    return canvas


# -- compositing -------------------------------------------------------------- #

def blend(img_a, img_b, alpha):
    """alpha*b + (1-alpha)*a; alpha scalar or (H, W)/(H, W, 1) map."""
    a = np.asarray(img_a, np.float32)
    b = np.asarray(img_b, np.float32)
    if np.ndim(alpha) == 2:
        alpha = alpha[..., None]
    out = a * (1 - alpha) + b * alpha
    return np.clip(out, 0, 255).astype(np.uint8)


def checkerboard(H, W, square=8, colors=(200, 120)):
    """(H, W) uint8 checkerboard (background for alpha visualization)."""
    ys, xs = np.mgrid[0:H, 0:W]
    cells = ((ys // square) + (xs // square)) % 2
    return np.where(cells == 0, colors[0], colors[1]).astype(np.uint8)


def image_grid(images, cols=None, pad=2, pad_value=0):
    """Tile equally-sized (H, W, 3) images into a grid canvas."""
    n = len(images)
    cols = cols or int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    H, W = images[0].shape[:2]
    canvas = np.full((rows * (H + pad) - pad, cols * (W + pad) - pad, 3),
                     pad_value, np.uint8)
    for i, img in enumerate(images):
        r, c = divmod(i, cols)
        canvas[r * (H + pad):r * (H + pad) + H,
               c * (W + pad):c * (W + pad) + W] = img
    return canvas


def draw_text(img, text, pos=(5, 20), scale=0.5, color=(255, 255, 255),
              thickness=1):
    canvas = img.copy()
    cv2.putText(canvas, text, pos, cv2.FONT_HERSHEY_SIMPLEX, scale, (0, 0, 0),
                thickness + 2, cv2.LINE_AA)
    cv2.putText(canvas, text, pos, cv2.FONT_HERSHEY_SIMPLEX, scale, color,
                thickness, cv2.LINE_AA)
    return canvas


def colorbar(values_range, height=200, width=30, cmap=cv2.COLORMAP_VIRIDIS):
    """Vertical colorbar image for scalar-map visualizations."""
    ramp = np.linspace(255, 0, height).astype(np.uint8)[:, None]
    bar = cv2.applyColorMap(np.repeat(ramp, width, axis=1), cmap)
    return bar


def vis_scalar_map(data, vmin=None, vmax=None, cmap=cv2.COLORMAP_VIRIDIS):
    """(H, W) scalar map -> BGR heatmap."""
    data = np.asarray(data, np.float32)
    vmin = float(data.min()) if vmin is None else vmin
    vmax = float(data.max()) if vmax is None else vmax
    norm = (data - vmin) / max(vmax - vmin, 1e-9)
    return cv2.applyColorMap((np.clip(norm, 0, 1) * 255).astype(np.uint8), cmap)


# -- sub-pixel drawing (reference vis_utils.py line/circle/polylines,
#    fixed-point shift=4 wrappers) -------------------------------------------- #

_SHIFT = 4
_FIX = 1 << _SHIFT


def _fx(pt):
    return (int(round(float(pt[0]) * _FIX)), int(round(float(pt[1]) * _FIX)))


def line(img, pt1, pt2, color, thickness=1, line_type=cv2.LINE_AA):
    """Sub-pixel accurate line (float endpoints)."""
    cv2.line(img, _fx(pt1), _fx(pt2), color, thickness, line_type,
             shift=_SHIFT)
    return img


def circle(img, center, radius, color, thickness=1, line_type=cv2.LINE_AA):
    """Sub-pixel accurate circle (float center/radius)."""
    cv2.circle(img, _fx(center), int(round(radius * _FIX)), color, thickness,
               line_type, shift=_SHIFT)
    return img


def polylines(img, pts, is_closed, color, thickness=1,
              line_type=cv2.LINE_AA):
    """Sub-pixel accurate polyline; pts (N, 2) float."""
    p = (np.asarray(pts, np.float64) * _FIX).round().astype(np.int32)
    cv2.polylines(img, [p.reshape(-1, 1, 2)], is_closed, color, thickness,
                  line_type, shift=_SHIFT)
    return img


# -- hatching (reference cv2_hatch / hatch_pattern) --------------------------- #

def hatch_pattern(shape, normal=(2, 1), spacing=10):
    """Boolean diagonal-stripe pattern; ``normal`` is the stripe normal."""
    H, W = shape[:2]
    ys, xs = np.mgrid[0:H, 0:W]
    proj = xs * normal[0] + ys * normal[1]
    period = spacing * float(np.hypot(*normal))
    return (proj % period) < max(np.hypot(*normal), 1.0)


def hatch_overlay(img, mask, color=(0, 0, 0), alpha=1.0, spacing=10,
                  normal=(2, 1)):
    """Draw diagonal hatching over the masked region of a BGR image."""
    stripes = hatch_pattern(img.shape, normal=normal, spacing=spacing)
    sel = np.logical_and(np.asarray(mask, bool), stripes)
    out = img.astype(np.float32).copy()
    out[sel] = (1 - alpha) * out[sel] + alpha * np.asarray(color, np.float32)
    return np.clip(out, 0, 255).astype(np.uint8)


# -- mask / alpha compositing (reference blend_mask / blend_with_alpha) ------- #

def blend_mask(img, mask, color=(0, 255, 0), alpha=0.5):
    """Tint the masked region with a color."""
    out = img.astype(np.float32).copy()
    m = np.asarray(mask, bool)
    out[m] = (1 - alpha) * out[m] + alpha * np.asarray(color, np.float32)
    return np.clip(out, 0, 255).astype(np.uint8)


def blend_with_alpha(img1, img2, img1_alpha):
    """Per-pixel alpha composite: img1 over img2 with (H, W) alpha."""
    a = np.asarray(img1_alpha, np.float32)
    if a.ndim == 2:
        a = a[..., None]
    out = img1.astype(np.float32) * a + img2.astype(np.float32) * (1 - a)
    return np.clip(out, 0, 255).astype(np.uint8)


def blend_with_alpha_premult(img1_premult, img2, img1_alpha):
    """Premultiplied-alpha composite (img1 already multiplied by alpha)."""
    a = np.asarray(img1_alpha, np.float32)
    if a.ndim == 2:
        a = a[..., None]
    out = img1_premult.astype(np.float32) + img2.astype(np.float32) * (1 - a)
    return np.clip(out, 0, 255).astype(np.uint8)


def to_gray_3ch(img):
    """BGR -> 3-channel grayscale (for alignment overlays)."""
    g = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    return np.repeat(g[..., None], 3, axis=2)


# -- checkerboards / dotboards (reference color_checkerboard/color_dotboard) -- #

def color_checkerboard(H, W, square=8):
    """BGR checkerboard with a distinct hue per cell (warp debugging)."""
    ys, xs = np.mgrid[0:H, 0:W]
    cy, cx = ys // square, xs // square
    hue = ((cy * 37 + cx * 61) % 180).astype(np.uint8)
    hsv = np.stack([hue, np.full((H, W), 200, np.uint8),
                    np.full((H, W), 230, np.uint8)], axis=-1)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)


def color_dotboard(H, W, spacing=16, radius=3):
    """White canvas with colored dots on a grid (sparse warp debugging)."""
    canvas = np.full((H, W, 3), 255, np.uint8)
    for i, y in enumerate(range(spacing // 2, H, spacing)):
        for j, x in enumerate(range(spacing // 2, W, spacing)):
            hue = int((i * 37 + j * 61) % 180)
            col = cv2.cvtColor(np.uint8([[[hue, 220, 230]]]),
                               cv2.COLOR_HSV2BGR)[0, 0]
            cv2.circle(canvas, (x, y), radius, tuple(int(c) for c in col), -1)
    return canvas


# -- labelled grids (reference name_fig / griddify / tile) -------------------- #

def name_images(images, names, **text_kwargs):
    """Stamp a label onto each image (copy)."""
    return [draw_text(img, str(name), **text_kwargs)
            for img, name in zip(images, names)]


def tile_images(img_grid, h_space=1, w_space=None, bg_color=0):
    """Tile a 2D list of equally-sized images with spacing."""
    w_space = h_space if w_space is None else w_space
    rows = []
    for row in img_grid:
        H = row[0].shape[0]
        spacer = np.full((H, w_space, 3), bg_color, np.uint8)
        parts = []
        for i, img in enumerate(row):
            if i:
                parts.append(spacer)
            parts.append(img)
        rows.append(np.concatenate(parts, axis=1))
    W = rows[0].shape[1]
    vspace = np.full((h_space, W, 3), bg_color, np.uint8)
    out = []
    for i, r in enumerate(rows):
        if i:
            out.append(vspace)
        out.append(r)
    return np.concatenate(out, axis=0)


# -- alignment / correspondence visualizations -------------------------------- #

def vis_flow_align(flow, src_img, dst_img, alpha=0.5):
    """Warp-alignment check: backward-warp dst by the flow and blend with src.

    A correct flow makes the blend look sharp (reference vis_flow_align).
    Pure numpy bilinear warp (host-side debug utility).
    """
    H, W = flow.shape[:2]
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    map_x = xs + np.asarray(flow, np.float32)[..., 0]
    map_y = ys + np.asarray(flow, np.float32)[..., 1]
    warped = cv2.remap(dst_img, map_x, map_y, cv2.INTER_LINEAR,
                       borderMode=cv2.BORDER_CONSTANT)
    return blend(to_gray_3ch(src_img), to_gray_3ch(warped), alpha)


def vis_correspondences(flow, src_img, dst_img, spacing=32):
    """Side-by-side src|dst image with correspondence lines drawn across."""
    H, W = src_img.shape[:2]
    canvas = np.concatenate([src_img, dst_img], axis=1).copy()
    for y in range(spacing // 2, H, spacing):
        for x in range(spacing // 2, W, spacing):
            dx, dy = flow[y, x]
            color = tuple(int(c) for c in np.random.RandomState(
                y * W + x).randint(64, 255, 3))
            line(canvas, (x, y), (W + x + float(dx), y + float(dy)), color)
    return canvas


def zoomins(img, center, zooms=(2, 4), win=64, cross=True):
    """Cut progressively zoomed crops around a point (reference zoomins)."""
    H, W = img.shape[:2]
    cx, cy = int(round(center[0])), int(round(center[1]))
    outs = []
    for z in zooms:
        half = max(int(round(win / (2 * z))), 2)
        x0, x1 = np.clip([cx - half, cx + half], 0, W - 1)
        y0, y1 = np.clip([cy - half, cy + half], 0, H - 1)
        crop = img[y0:y1 + 1, x0:x1 + 1]
        crop = cv2.resize(crop, (win, win), interpolation=cv2.INTER_NEAREST)
        if cross:
            cv2.drawMarker(crop, (win // 2, win // 2), (0, 0, 255),
                           cv2.MARKER_CROSS, 12, 1)
        outs.append(crop)
    return outs


def resize(src, dsize=None, fx=None, fy=None, interpolation=cv2.INTER_LINEAR,
           align_corners=False):
    """cv2.resize with an optional align_corners=True mode.

    align_corners resizing maps corner pixel CENTERS onto each other
    (torch interpolate semantics) instead of area edges; the reference
    implements it by remap with an explicit grid (vis_utils.py resize).
    """
    if not align_corners:
        return cv2.resize(src, dsize, fx=fx, fy=fy,
                          interpolation=interpolation)
    H, W = src.shape[:2]
    if dsize is None:
        dsize = (int(round(W * fx)), int(round(H * fy)))
    out_w, out_h = dsize
    xs = np.linspace(0, W - 1, out_w, dtype=np.float32)
    ys = np.linspace(0, H - 1, out_h, dtype=np.float32)
    map_x, map_y = np.meshgrid(xs, ys)
    return cv2.remap(src, map_x, map_y, interpolation)


# -- matlab-style flow colormap (reference flow_viz.py flow2color_matlab) ----- #

def flow_to_color_matlab(flow, max_flow=None):
    """Middlebury 'matlab-style' variant: like flow_to_color but saturating
    out-of-range magnitudes at full saturation instead of renormalizing."""
    flow = np.asarray(flow, np.float32)
    u, v = flow[..., 0], flow[..., 1]
    rad = np.sqrt(u ** 2 + v ** 2)
    if max_flow is None:
        max_flow = max(float(rad.max()), 1e-5)
    scaled = np.clip(rad / max_flow, 0, 1)
    out = flow_to_color(np.stack([u, v], -1), rad_max=max_flow)
    # saturate over-range pixels fully
    over = rad > max_flow
    if np.any(over):
        hsv = cv2.cvtColor(out, cv2.COLOR_RGB2HSV)
        hsv[..., 1] = np.where(over, 255, hsv[..., 1])
        out = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
    del scaled
    return out


# -- interactive flow inspector (reference FlowGUI) ---------------------------- #

class FlowGUI:
    """Interactive src/dst flow inspector (reference vis_utils.FlowGUI).

    Renders src|dst side by side; moving the mouse over the source half
    draws the flow correspondence in the target half. ``render(pos)`` is
    the pure part (headless-testable); ``run()`` opens a cv2 window.
    """

    def __init__(self, flow, src_img, dst_img, occlusion=None, sigma=None):
        self.flow = np.asarray(flow, np.float32)
        self.src = src_img
        self.dst = dst_img
        self.occl = occlusion
        self.sigma = sigma
        self.H, self.W = src_img.shape[:2]

    def render(self, pos):
        x, y = int(np.clip(pos[0], 0, self.W - 1)), int(np.clip(pos[1], 0, self.H - 1))
        canvas = np.concatenate([self.src, self.dst], axis=1).copy()
        dx, dy = self.flow[y, x]
        occluded = self.occl is not None and self.occl[y, x] > 0.5
        color = (0, 0, 255) if occluded else (0, 255, 0)
        circle(canvas, (x, y), 4, color, 2)
        circle(canvas, (self.W + x + float(dx), y + float(dy)), 4, color, 2)
        line(canvas, (x, y), (self.W + x + float(dx), y + float(dy)), color)
        label = f"({x},{y}) -> ({x + dx:.1f},{y + dy:.1f})"
        if self.sigma is not None:
            label += f" sigma={float(self.sigma[y, x]):.2f}"
        if occluded:
            label += " OCCL"
        return draw_text(canvas, label)

    def run(self, window="FlowGUI"):  # pragma: no cover - needs a display
        state = {"pos": (self.W // 2, self.H // 2)}

        def on_mouse(event, x, y, flags, param):
            state["pos"] = (x, y)

        cv2.namedWindow(window)
        cv2.setMouseCallback(window, on_mouse)
        while True:
            cv2.imshow(window, self.render(state["pos"]))
            if cv2.waitKey(16) in (27, ord("q")):
                break
        cv2.destroyWindow(window)


# -- alignment / geometry overlays (reference vis_utils.py:245-343) ----------- #
def vis_alignment_plain(src, dst, equalize_hist=False):
    """Red/blue=dst-gray, green=src-gray false-color alignment check.

    Reference parity: vis_utils.py:245-266 (per-image min/max normalization
    unless histogram equalization is requested).
    """
    assert src.shape == dst.shape
    sg = cv2.cvtColor(src, cv2.COLOR_BGR2GRAY)
    dg = cv2.cvtColor(dst, cv2.COLOR_BGR2GRAY)
    if equalize_hist:
        sg = cv2.equalizeHist(sg).astype(np.float32) / 255
        dg = cv2.equalizeHist(dg).astype(np.float32) / 255
    else:
        sg = sg.astype(np.float32) / 255
        dg = dg.astype(np.float32) / 255
        sg = (sg - sg.min()) / max(np.ptp(sg), 1e-12)
        dg = (dg - dg.min()) / max(np.ptp(dg), 1e-12)
    out = np.stack([dg, sg, dg], axis=-1)
    return np.uint8(out * 255)


def draw_corners(canvas, corners, color, thickness=2, with_cross=True,
                 with_tl=False):
    """Draw the quadrilateral given by (2, 4) corner array, optional
    diagonal cross and top-left marker (reference vis_utils.py:471-491)."""
    if corners is None:
        return canvas
    assert corners.shape == (2, 4), f"bad corners shape {corners.shape}"
    pts = corners.T.reshape(4, 1, 2)
    vis = polylines(canvas.copy(), [pts], True, color, thickness)
    if with_cross:
        vis = line(vis, tuple(pts[0, 0]), tuple(pts[2, 0]), color, thickness)
        vis = line(vis, tuple(pts[1, 0]), tuple(pts[3, 0]), color, thickness)
    if with_tl:
        vis = cv2.circle(vis, tuple(pts[0, 0].astype(np.int32).tolist()),
                         radius=2 * thickness, color=color, thickness=-1)
    return vis


def vis_vector_in_center(img, vector, color=(0, 255, 0), thickness=2):
    """Draw a vector anchored at the image center (vis_utils.py:493-500)."""
    canvas = img.copy()
    center = (canvas.shape[1] // 2, canvas.shape[0] // 2)
    line(canvas, center, (center[0] + vector[0], center[1] + vector[1]),
         color, thickness)
    return canvas


def draw_box_with_margins(canvas, tl_xy, br_xy, radius, color=(0, 0, 255)):
    """Mark a box's four corners with margin circles (vis_utils.py:310-321)."""
    vis = canvas.copy()
    (tx, ty), (bx, by) = tl_xy, br_xy
    for pt in ((tx, ty), (bx, ty), (bx, by), (tx, by)):
        cv2.circle(vis, (int(pt[0]), int(pt[1])), int(radius), color)
    return vis


def place_img_at(img, canvas, tl_row, tl_col):
    """Paste img into canvas at (row, col), in place (vis_utils.py:541-543)."""
    H, W = img.shape[:2]
    canvas[tl_row:tl_row + H, tl_col:tl_col + W, :] = img


def shorten_text(text, max_len, keep="right"):
    """Ellipsis-shorten a string keeping its right or left end
    (vis_utils.py:347-357)."""
    if len(text) <= max_len:
        return text
    margin = 3 if max_len > 8 else 0
    if keep == "right":
        return "." * margin + text[-(max_len - margin):]
    if keep == "left":
        return text[: max_len - margin] + "." * margin
    raise ValueError("Invalid 'keep' value")


def vis_prosac_scores(sorted_coords, image):
    """Color the top-20% ranked points by rank (viridis), rest dark gray.

    Reference parity: vis_utils.py:324-344 (matplotlib colormap replaced by
    cv2.COLORMAP_VIRIDIS — same colormap family, BGR output).
    """
    canvas = to_gray_3ch(image).copy()
    xy, N = sorted_coords.shape
    assert xy == 2
    top_n = int(N * 0.2)
    ramp = cv2.applyColorMap(
        np.linspace(0, 255, max(top_n, 1)).astype(np.uint8).reshape(-1, 1),
        cv2.COLORMAP_VIRIDIS).reshape(-1, 3)
    for i in range(N):
        if i < top_n:
            color = ramp[top_n - i - 1].tolist()
        else:
            color = [30, 30, 30]
        x, y = int(round(sorted_coords[0, i])), int(round(sorted_coords[1, i]))
        cv2.circle(canvas, (x, y), 2, color, -1)
    return canvas


class OverlayBackground:
    """Blend images-after-drawing back over their saved originals.

    Reference parity: vis_utils.py:1167-1185 — snapshot backgrounds at
    construction, then ``overlay(imgs, alpha)`` mixes each drawn-on image
    with its original.
    """

    def __init__(self, *background_images):
        self.backgrounds_copy = [img.copy() for img in background_images]

    def overlay(self, *overlay_images, alpha=0.5):
        return [cv2.addWeighted(ov, alpha, bg, 1 - alpha, 0)
                for ov, bg in zip(overlay_images, self.backgrounds_copy)]


def make_knn_interp(db_xy, db_values):
    """K-NN interpolator factory (reference vis_utils.py:661-703).

    returns interp(query_xy, K, max_dist=None) -> values with the
    reference's negative-distance weighting and NaN for empty neighborhoods.
    """
    from scipy.spatial import KDTree

    tree = KDTree(db_xy)
    N = db_xy.shape[0]

    def interp(query_xy, K, max_dist=None, min_K=None):
        bound = np.inf if max_dist is None else max_dist
        dists, ids = tree.query(query_xy, k=K, distance_upper_bound=bound)
        dists = np.atleast_2d(np.asarray(dists, np.float64))
        ids = np.atleast_2d(ids)
        valid = ids < N
        dists[~valid] = np.nan
        with np.errstate(invalid="ignore"):
            weights = (-dists) / np.nansum(-dists, axis=-1, keepdims=True)
        vals = np.full(dists.shape, np.nan)
        vals[valid] = np.asarray(db_values)[ids[valid]]
        vals[valid] *= weights[valid]
        out = np.nansum(vals, axis=-1)
        # nansum turns all-NaN rows into 0.0 — keep them NaN (reference
        # semantics: queries with no (or too few) neighbors are invalid)
        needed = 1 if min_K is None else min_K
        out[valid.sum(axis=-1) < needed] = np.nan
        return out

    return interp
