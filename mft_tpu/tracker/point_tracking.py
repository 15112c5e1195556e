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


@jax.jit
def _point_tracks_batch(flows, occls, queries):
    from mft_tpu.core.flowou import warp_forward_points
    from mft_tpu.core.interp import bilinear_sample

    def one(flow, occl):
        coords = warp_forward_points(flow, queries)
        o = bilinear_sample(occl[..., None], queries)[..., 0]
        return coords, o

    return jax.vmap(one)(flows, occls)


def convert_to_point_tracking_batch(results, queries):
    """Batched conversion over T same-shape FlowOU results.

    One stack + one jitted sample + one device fetch for the whole group —
    the per-frame wrapper costs a dispatch and two host fetches per frame,
    which dominates runner post-processing through a remote device tunnel.

    returns: coords (T, N, 2), occlusion (T, N) numpy arrays.
    """
    q = jnp.asarray(queries, jnp.float32)
    flows = jnp.stack([r.flow for r in results])
    occls = jnp.stack([r.occlusion for r in results])
    coords, occl = _point_tracks_batch(flows, occls, q)
    return np.asarray(coords), np.asarray(occl).astype(np.float32)
