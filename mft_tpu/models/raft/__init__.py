"""RAFT-OU optical flow network, TPU-native (flax, NHWC, lax.scan recurrence).

Architecture parity with the reference RAFT + OcclusionAndUncertaintyBlock
(MFT/RAFT/core/raft.py, update.py, extractor.py, corr.py), re-designed for
XLA/TPU: channel-last layout, all-pairs correlation as one MXU matmul,
pyramid lookups as batched gathers (Pallas kernel in mft_tpu.kernels), and
the 12-step GRU refinement as a compiled lax.scan.
"""

from mft_tpu.models.raft.raft import RAFT, RAFTParams
from mft_tpu.models.raft.wrapper import RAFTFlow

__all__ = ["RAFT", "RAFTParams", "RAFTFlow"]
