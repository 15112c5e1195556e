"""Demo app: track a video, render point tracks + first-frame edit propagation.

Role parity with reference demo.py: a query grid is tracked from frame 0,
drawn as occlusion-colored dots into ``<name>_points.mp4``, and an "edit"
overlay drawn on the first frame is propagated to every frame by forward
splatting (``<name>_edit.mp4``).
"""

import argparse
import logging
from pathlib import Path

import cv2
import numpy as np

from mft_tpu.config import load_config
from mft_tpu.io import get_video_frames, VideoWriter
from mft_tpu.tracker.point_tracking import convert_to_point_tracking

logger = logging.getLogger(__name__)


def get_queries(frame_shape, spacing=30):
    """Grid of query points every ``spacing`` px (reference demo.py:106-116)."""
    H, W = frame_shape[:2]
    xs = np.arange(spacing // 2, W, spacing, dtype=np.float32)
    ys = np.arange(spacing // 2, H, spacing, dtype=np.float32)
    xg, yg = np.meshgrid(xs, ys)
    return np.stack([xg.reshape(-1), yg.reshape(-1)], axis=1)


def draw_dots(frame, coords, occlusions):
    """Visible points green, occluded red (reference demo.py:118-128)."""
    canvas = frame.copy()
    for (x, y), occl in zip(coords, occlusions):
        xi, yi = int(round(float(x))), int(round(float(y)))
        if 0 <= xi < frame.shape[1] and 0 <= yi < frame.shape[0]:
            color = (0, 0, 255) if occl > 0.5 else (0, 255, 0)
            cv2.circle(canvas, (xi, yi), 3, color, -1)
    return canvas


def make_default_edit(frame):
    """A synthetic first-frame edit: a filled logo-ish rectangle + text."""
    H, W = frame.shape[:2]
    edit = np.zeros((H, W, 3), np.uint8)
    cv2.rectangle(edit, (W // 8, H // 8), (W // 2, H // 4), (0, 200, 255), -1)
    cv2.putText(edit, "mft-tpu", (W // 8 + 5, H // 6), cv2.FONT_HERSHEY_SIMPLEX,
                1.0, (30, 30, 30), 2)
    return edit


def draw_edit(frame, result, edit, edit_mask):
    """Propagate the first-frame edit by forward splatting the edit pixels
    along the template->current flow (reference demo.py:130-146)."""
    import jax.numpy as jnp
    warped = np.asarray(result.warp_forward(
        jnp.asarray(edit.astype(np.float32)),
        mask=jnp.asarray(edit_mask), border=0.0))
    warped_mask = np.asarray(result.warp_forward(
        jnp.asarray(edit_mask.astype(np.float32)[..., None]), border=0.0))[..., 0]
    alpha = np.clip(warped_mask, 0, 1)[..., None]
    out = frame.astype(np.float32) * (1 - alpha) + warped * alpha
    return np.clip(out, 0, 255).astype(np.uint8)


def run(args):
    config = load_config(args.config)
    tracker = config.tracker_class(config)
    video_name = Path(args.video).stem
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    queries = None
    edit = edit_mask = None
    writer_pts = VideoWriter(out_dir / f"{video_name}_points.mp4", fps=args.fps)
    writer_edit = VideoWriter(out_dir / f"{video_name}_edit.mp4", fps=args.fps)
    n_frames = 0
    try:
        for i, frame in enumerate(get_video_frames(args.video)):
            if args.max_frames and i >= args.max_frames:
                break
            if i == 0:
                meta = tracker.init(frame)
                queries = get_queries(frame.shape, args.grid_spacing)
                edit = make_default_edit(frame)
                edit_mask = edit.any(axis=2)
            else:
                meta = tracker.track(frame)
            coords, occl = convert_to_point_tracking(meta.result, queries)
            writer_pts.write(draw_dots(frame, coords, occl))
            writer_edit.write(draw_edit(frame, meta.result, edit, edit_mask))
            n_frames += 1
    finally:
        writer_pts.close()
        writer_edit.close()
    logger.info("wrote %d frames to %s", n_frames, out_dir)
    return n_frames


def get_parser():
    parser = argparse.ArgumentParser(description="mft-tpu demo")
    parser.add_argument("--video", required=True,
                        help="input video file or image directory")
    parser.add_argument("--config", default="configs/MFT_cfg.py")
    parser.add_argument("--out", default="demo_out")
    parser.add_argument("--grid_spacing", type=int, default=30)
    parser.add_argument("--fps", type=float, default=25.0)
    parser.add_argument("--max_frames", type=int, default=None)
    return parser


def _main():
    logging.basicConfig(level=logging.INFO)
    run(get_parser().parse_args())


def main():
    import os
    from mft_tpu.utils.various import with_debugger
    entry = _main if not os.environ.get("MFT_TPU_DEBUG") else with_debugger(_main)
    entry()


if __name__ == "__main__":
    main()
