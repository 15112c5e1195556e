"""Dense tracking result -> sparse point tracks.

Reference parity: MFT/point_tracking.py:6-27 (convert_to_point_tracking):
query points are warped forward by the dense flow (flow bilinearly sampled AT
the query positions) and the occlusion map is bilinearly sampled at the query
positions. One tiny jitted function; only (N, 2)+(N,) scalars return to host.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mft_tpu.core.flowou import FlowOU


@jax.jit
def point_tracks(result: FlowOU, queries: jnp.ndarray):
    """args: result FlowOU; queries (N, 2) template-frame (x, y) coords.
    returns: coords (N, 2) current-frame positions, occlusion (N,) in [0, 1].
    """
    from mft_tpu.core.flowou import warp_forward_points
    from mft_tpu.core.interp import bilinear_sample
    coords = warp_forward_points(result.flow, queries)
    occl = bilinear_sample(result.occlusion[..., None], queries)[..., 0]
    return coords, occl


def convert_to_point_tracking(result: FlowOU, queries):
    """Numpy-returning convenience wrapper (reference API shape)."""
    coords, occl = point_tracks(result, jnp.asarray(queries, jnp.float32))
    return np.asarray(coords), np.float32(np.asarray(occl))
