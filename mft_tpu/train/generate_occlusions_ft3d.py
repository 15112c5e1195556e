"""Offline occlusion-map generation for FlyingThings3D.

Role parity with reference generate_occlusion_maps_FlyingThings3D.py (a 900
LoC TF1 graph): FlyingThings3D ships forward and backward flow but no
occlusion ground truth; occlusion maps are derived by forward-backward
consistency plus out-of-frame tests and written as PNGs mirroring the flow
directory layout (both time directions), which FlyingThings3D(load_occlusion
=True) then consumes.

A pixel is marked occluded when the forward-backward roundtrip error exceeds
the classical tolerance  |f + b(p+f)|^2 > a1 * (|f|^2 + |b(p+f)|^2) + a2
(Sundaram et al. 2010), or when its flow endpoint leaves the image.
"""

import argparse
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

ALPHA1 = 0.01
ALPHA2 = 0.5


def _bilinear2(data, x, y):
    """Sample (H, W, C) at float coords with border clamping."""
    H, W = data.shape[:2]
    x = np.clip(x, 0, W - 1)
    y = np.clip(y, 0, H - 1)
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    x1 = np.minimum(x0 + 1, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    return (data[y0, x0] * (1 - wx) * (1 - wy) + data[y0, x1] * wx * (1 - wy)
            + data[y1, x0] * (1 - wx) * wy + data[y1, x1] * wx * wy)


def occlusion_from_fb(flow_fwd, flow_bwd, alpha1=ALPHA1, alpha2=ALPHA2):
    """(H, W, 2) fwd + bwd flow -> (H, W) float 0/1 occlusion map."""
    H, W = flow_fwd.shape[:2]
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    ex = xs + flow_fwd[..., 0]
    ey = ys + flow_fwd[..., 1]
    bwd_at = _bilinear2(flow_bwd.astype(np.float64), ex, ey)
    rt = flow_fwd + bwd_at  # roundtrip residual
    rt_sq = np.sum(rt ** 2, axis=-1)
    mag_sq = (np.sum(flow_fwd.astype(np.float64) ** 2, axis=-1)
              + np.sum(bwd_at ** 2, axis=-1))
    inconsistent = rt_sq > alpha1 * mag_sq + alpha2
    out_of_frame = (ex < 0) | (ey < 0) | (ex >= W) | (ey >= H)
    return (inconsistent | out_of_frame).astype(np.float32)


def process_pair_dir(fwd_dir, bwd_dir, out_fwd_dir, out_bwd_dir):
    """Generate occlusions for one into_future/into_past directory pair."""
    import cv2
    from mft_tpu.train.flow_readers import read_pfm

    fwd_dir, bwd_dir = Path(fwd_dir), Path(bwd_dir)
    out_fwd_dir, out_bwd_dir = Path(out_fwd_dir), Path(out_bwd_dir)
    out_fwd_dir.mkdir(parents=True, exist_ok=True)
    out_bwd_dir.mkdir(parents=True, exist_ok=True)

    fwd_files = sorted(fwd_dir.glob("*.pfm"))
    bwd_files = sorted(bwd_dir.glob("*.pfm"))
    # into_future flow i pairs with into_past flow i+1 (frames i -> i+1 -> i)
    n = 0
    for i in range(len(fwd_files) - 1):
        f = read_pfm(fwd_files[i])[..., :2]
        b = read_pfm(bwd_files[i + 1])[..., :2]
        occ_f = occlusion_from_fb(f, b)
        occ_b = occlusion_from_fb(b, f)
        cv2.imwrite(str(out_fwd_dir / (fwd_files[i].stem + ".png")),
                    (occ_f * 255).astype(np.uint8))
        cv2.imwrite(str(out_bwd_dir / (bwd_files[i + 1].stem + ".png")),
                    (occ_b * 255).astype(np.uint8))
        n += 1
    return n


def main():
    parser = argparse.ArgumentParser(
        description="generate FlyingThings3D occlusion maps")
    parser.add_argument("--root", default="datasets/FlyingThings3D")
    parser.add_argument("--split", default="TRAIN")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    root = Path(args.root)
    fwd_dirs = sorted(root.glob(f"optical_flow/{args.split}/*/*/into_future/left"))
    total = 0
    for fwd in fwd_dirs:
        bwd = Path(str(fwd).replace("into_future", "into_past"))
        out_f = Path(str(fwd).replace("optical_flow", "occlusions"))
        out_b = Path(str(bwd).replace("optical_flow", "occlusions"))
        total += process_pair_dir(fwd, bwd, out_f, out_b)
    logger.info("generated %d occlusion pairs", total)


if __name__ == "__main__":
    main()
