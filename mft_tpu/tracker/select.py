"""Per-pixel candidate selection over the delta axis.

Reference parity (MFT/MFT.py:112-142): score = -sigma; candidates whose
occlusion exceeds the threshold get -inf; the best (max) score wins, ties
resolved to the LOWEST candidate index (candidates are ordered inf-first,
then ascending delta — torch .max picks the first maximal index, as does
jnp.argmax). Invalid candidates (before-start / duplicate deltas, which the
reference skips with `continue`) are masked to -inf instead.
"""

import jax.numpy as jnp

from mft_tpu.core.flowou import FlowOU, invalid_mask


def select_best(flows: jnp.ndarray, occlusions: jnp.ndarray,
                sigmas: jnp.ndarray, valid: jnp.ndarray,
                occlusion_threshold: float = 0.02) -> FlowOU:
    """Select the best chained candidate per pixel.

    args:
      flows: (N, H, W, 2) chained candidate flows (candidate 0 = delta inf).
      occlusions: (N, H, W) chained occlusion maps.
      sigmas: (N, H, W) chained sigma maps.
      valid: (N,) bool — False for padded/duplicate/before-start candidates.
      occlusion_threshold: candidates above it are not selectable.

    returns:
      FlowOU of the selected candidates, with flows leaving the image marked
      occluded (occlusion := 1, reference MFT.py:140-142).
    """
    neg_inf = jnp.float32(-jnp.inf)
    scores = -sigmas
    scores = jnp.where(occlusions > occlusion_threshold, neg_inf, scores)
    scores = jnp.where(valid[:, None, None], scores, neg_inf)

    best = jnp.argmax(scores, axis=0)  # (H, W) first max index, like torch
    sel_flow = jnp.take_along_axis(
        flows, best[None, ..., None], axis=0)[0]
    sel_occl = jnp.take_along_axis(occlusions, best[None], axis=0)[0]
    sel_sigma = jnp.take_along_axis(sigmas, best[None], axis=0)[0]

    inval = invalid_mask(sel_flow)
    sel_occl = jnp.where(inval, 1.0, sel_occl)
    return FlowOU(flow=sel_flow, occlusion=sel_occl, sigma=sel_sigma)
