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
