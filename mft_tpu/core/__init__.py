"""Core numerics: coordinate grids, bilinear gather/splat, FlowOU value type.

All functions are pure, jit-friendly, and operate on channel-last (H, W, C)
arrays — the TPU-native layout. Batch via ``jax.vmap``.
"""

from mft_tpu.core.coords import grid_coords
from mft_tpu.core.interp import (
    bilinear_sample,
    bilinear_splat,
)
from mft_tpu.core.flowou import (
    FlowOU,
    identity_flowou,
    chain_flow,
    chain_results,
    warp_backward,
    warp_forward_points,
    sample_flowou,
    invalid_mask,
    forward_backward_error,
)

__all__ = [
    "grid_coords",
    "bilinear_sample",
    "bilinear_splat",
    "FlowOU",
    "identity_flowou",
    "chain_flow",
    "chain_results",
    "warp_backward",
    "warp_forward_points",
    "sample_flowou",
    "invalid_mask",
    "forward_backward_error",
]
