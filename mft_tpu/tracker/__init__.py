"""MFT tracker: delta-chaining + per-pixel candidate selection, TPU-first.

Re-design of the reference tracker (MFT/MFT.py) for XLA:
- the per-delta Python loop + dict memory (MFT.py:74-107, 150-181) becomes a
  fixed-shape device-resident ring buffer and ONE batched RAFT forward over
  the stacked delta axis;
- dedup/before-start clamping (MFT.py:80-91) becomes host-computed slot
  indices + a validity mask (the per-frame index math is trivially cheap on
  host and keeps the device graph static);
- chaining + selection + memory update run as a single jitted step.
"""

from mft_tpu.tracker.mft import MFT
from mft_tpu.tracker.select import select_best

__all__ = ["MFT", "select_best"]
