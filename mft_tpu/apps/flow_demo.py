"""Pairwise-flow demo: run the RAFT-OU network on consecutive frames and
render flow-colorwheel panels.

Role parity with the reference's RAFT demo (MFT/RAFT/demo.py:42-75): glob an
image directory, compute flow for each consecutive pair, and visualize
image-over-flow. The reference pops an interactive ``cv2.imshow`` window per
pair; this build targets headless TPU hosts, so each panel is written to
``<out>/flow_XXXX.png`` (frame stacked over flow color, same layout as
reference demo.py:33) and optionally bundled into ``<out>/flow.mp4``.
"""

import argparse
import logging
from pathlib import Path

import cv2
import numpy as np

from mft_tpu.config import load_config
from mft_tpu.io import get_video_frames, VideoWriter

logger = logging.getLogger(__name__)


def flow_panel(frame_bgr, flow, extra=None):
    """Stack the frame over its flow-color rendering (reference demo.py:26-39,
    ``viz``). With OU ``extra``, a third row shows occlusion (red) and
    sigma (green) maps."""
    from mft_tpu.utils.vis import flow_to_color
    flow_rgb = flow_to_color(np.asarray(flow))
    rows = [frame_bgr, flow_rgb[:, :, ::-1]]  # flow_to_color is RGB; demo is BGR
    if extra is not None:
        occl = np.clip(np.asarray(extra["occlusion"]), 0.0, 1.0)
        sigma = np.asarray(extra["sigma"])
        sigma = sigma / max(float(sigma.max()), 1e-6)
        ou = np.stack([np.zeros_like(occl), sigma, occl], axis=-1)
        rows.append((ou * 255).astype(np.uint8))
    return np.concatenate(rows, axis=0)


def run(args):
    config = load_config(args.config)
    flower = config.flow_config.of_class(config.flow_config)
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    writer = None
    prev = None
    n = 0
    for frame in get_video_frames(args.video):
        if prev is not None:
            flow, extra = flower.compute_flow(prev, frame, mode="flow")
            panel = flow_panel(prev, np.asarray(flow),
                               extra if args.show_ou else None)
            cv2.imwrite(str(out_dir / f"flow_{n:04d}.png"), panel)
            if args.mp4:
                if writer is None:
                    writer = VideoWriter(out_dir / "flow.mp4", fps=args.fps)
                writer.write(panel)
            n += 1
        prev = frame
    if writer is not None:
        writer.close()
    logger.info("wrote %d flow panels to %s", n, out_dir)
    return n


def get_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--video", required=True,
                        help="video file or image directory")
    parser.add_argument("--config", default="configs/MFT_cfg.py",
                        help="tracker config; its flow_config selects the net")
    parser.add_argument("--out", default="flow_demo_out")
    parser.add_argument("--mp4", action="store_true",
                        help="also write the panels as flow.mp4")
    parser.add_argument("--show_ou", action="store_true",
                        help="append an occlusion/sigma panel row")
    parser.add_argument("--fps", type=float, default=10.0)
    return parser


def main():
    logging.basicConfig(level=logging.INFO)
    run(get_parser().parse_args())


if __name__ == "__main__":
    main()
