"""Training observability: scalar curves + image panels.

Role parity with the reference's tensorboard ``Logger``
(MFT/RAFT/train.py:262-346) and its VAL_FREQ image panels
(train.py:442-465): running-mean console line + scalars every SUM_FREQ,
validation scalars, and flow/occlusion/sigma image panels.

TPU-era twist: scalars ALWAYS go to an append-only ``scalars.jsonl`` and
panels to plain PNGs under the run directory, so a headless 50k-step run on a
remote TPU host stays inspectable with nothing but a filesystem; tensorboard
event files are written additionally when torch's SummaryWriter is available.
"""

import json
import logging
import time
from pathlib import Path

import numpy as np
import cv2

logger = logging.getLogger(__name__)

SUM_FREQ = 10


def _to_numpy_first(x):
    """(B, H, W[, C]) or (H, W[, C]) device/host array -> (H, W, C) numpy f32.

    A 3D array is ambiguous: (1, H, W) batched masks (e.g. the loop's
    ``valid`` slice) have a singleton LEADING axis, while (H, W, C) images
    have a small TRAILING channel axis — disambiguate on shape.
    """
    a = np.asarray(x).astype(np.float32)
    if a.ndim == 4:
        a = a[0]
    if a.ndim == 3 and a.shape[0] == 1 and a.shape[-1] > 4:
        a = a[0]  # (1, H, W) batched 2D map, not (H, W, C)
    if a.ndim == 2:
        a = a[..., None]
    return a


def render_panel(key, value):
    """Render one named array to a uint8 RGB (H, W, 3) image.

    Key-based dispatch matching the reference Logger.write_images
    (train.py:322-343): 'flow*' -> colorwheel, 'occl*'/'sigma*' -> clamped
    grayscale, 'valid' -> binary mask, anything else -> raw uint8 image.
    """
    from mft_tpu.utils.vis import flow_to_color
    a = _to_numpy_first(value)
    if "flow" in key:
        return flow_to_color(a[..., :2])
    if key == "valid":
        g = (a[..., 0] > 0.5).astype(np.uint8) * 255
        return np.stack([g, g, g], axis=-1)
    if "occl" in key or "sigma" in key:
        g = np.clip(a[..., 0], 0.0, 255.0).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    return np.clip(a, 0, 255).astype(np.uint8)[..., :3]


class TrainLogger:
    """Scalar + image logging for training runs.

    Files under ``run_dir``:
      scalars.jsonl     one {"step": n, ...} object per flush
      panels/step_N/KEY.png   image panels
      tb/               tensorboard event files (if SummaryWriter available)
    """

    def __init__(self, run_dir, use_tensorboard=True):
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self._scalar_file = open(self.run_dir / "scalars.jsonl", "a")
        self.total_steps = 0
        self.running = {}
        self._pushed = 0
        self._t0 = time.time()
        self.writer = None
        self._use_tb = use_tensorboard

    def _tb(self):
        if self.writer is None and self._use_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.writer = SummaryWriter(log_dir=str(self.run_dir / "tb"))
            except Exception:  # tensorboard genuinely unavailable
                self._use_tb = False
        return self.writer

    # -- scalars ----------------------------------------------------------- #
    def _flush_running(self, lr=None):
        n = max(self._pushed, 1)  # actual pushes, not SUM_FREQ: a resumed
        means = {k: v / n for k, v in self.running.items()}  # run's first
        if lr is not None:  # flush covers fewer than SUM_FREQ steps
            means["lr"] = lr
        self.write_dict(means)
        rate = (time.time() - self._t0) / n
        self._t0 = time.time()
        logger.info(
            "step %6d %s (%.2f s/step)", self.total_steps,
            " ".join(f"{k.split('/')[-1]}={v:.4f}" for k, v in means.items()),
            rate)
        self.running = {}
        self._pushed = 0

    def push(self, metrics, lr=None):
        """Accumulate one step's metrics; auto-flush every SUM_FREQ steps."""
        self.total_steps += 1
        self._pushed = getattr(self, "_pushed", 0) + 1
        for k, v in metrics.items():
            self.running[k] = self.running.get(k, 0.0) + float(v)
        if self.total_steps % SUM_FREQ == 0:
            self._flush_running(lr=lr)

    def write_dict(self, results):
        """Write a scalar dict (e.g. validation results) at the current step."""
        rec = {"step": self.total_steps}
        rec.update({k: float(v) for k, v in results.items()})
        self._scalar_file.write(json.dumps(rec) + "\n")
        self._scalar_file.flush()
        tb = self._tb()
        if tb is not None:
            for k, v in results.items():
                tb.add_scalar(k, float(v), self.total_steps)

    # -- images ------------------------------------------------------------ #
    def write_images(self, images):
        """Write named image panels (PNG + tensorboard)."""
        step_dir = self.run_dir / "panels" / f"step_{self.total_steps:06d}"
        step_dir.mkdir(parents=True, exist_ok=True)
        tb = self._tb()
        for key, value in images.items():
            rgb = render_panel(key, value)
            cv2.imwrite(str(step_dir / f"{key}.png"),
                        cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
            if tb is not None:
                tb.add_image(key, rgb, self.total_steps, dataformats="HWC")

    def write_prediction_panels(self, batch, preds):
        """The reference's VAL_FREQ panel set (train.py:444-465).

        args:
          batch: (img1, img2, flow_gt, valid, occl_gt) channel-last arrays.
          preds: RAFT train-mode output dict of per-iteration lists.
        """
        img1, img2, flow_gt, valid, occl_gt = batch
        self.write_images({"image1": img1, "image2": img2, "valid": valid,
                           "flow_gt": flow_gt})
        if occl_gt is not None:
            self.write_images({"occl_gt": np.asarray(occl_gt) * 255.0})
        self.write_images({"flow_est": preds["flow"][-1]})
        if preds.get("occlusion"):
            logits = _to_numpy_first(preds["occlusion"][-1])
            e = np.exp(logits - logits.max(axis=-1, keepdims=True))
            soft = e / e.sum(axis=-1, keepdims=True)
            self.write_images({"occl_est_neg": 255.0 * soft[..., 0:1],
                               "occl_est_pos": 255.0 * soft[..., 1:2]})
        if preds.get("uncertainty"):
            log_var = _to_numpy_first(preds["uncertainty"][-1])[..., 0:1]
            sigma2 = np.exp(log_var)
            sigma = np.sqrt(sigma2)
            panels = {"sigma2_est": sigma2 * 255.0, "sigma_est": sigma * 255.0}
            for name, s in (("sigma2_est_minmax", sigma2),
                            ("sigma_est_minmax", sigma)):
                rng = s.max() - s.min()
                panels[name] = ((s - s.min()) / rng if rng > 0 else s) * 255.0
            self.write_images(panels)

    def close(self):
        self._scalar_file.close()
        if self.writer is not None:
            self.writer.close()
