"""Coordinate grid helpers.

Convention: coordinates are (x, y) pixel positions in float32, stored in the
LAST axis (channel-last). A dense grid has shape (H, W, 2) with
``grid[y, x] == (x, y)``.

Reference parity: MFT/utils/geom_utils.py:429 (torch_get_featuremap_coords)
and MFT/RAFT/core/utils/utils.py:115 (coords_grid) produce the same (x, y)
grids in channel-first layout.
"""

import jax.numpy as jnp


def grid_coords(H: int, W: int, dtype=jnp.float32) -> jnp.ndarray:
    """Dense pixel-coordinate grid, shape (H, W, 2), last axis = (x, y)."""
    xs = jnp.arange(W, dtype=dtype)
    ys = jnp.arange(H, dtype=dtype)
    xg, yg = jnp.meshgrid(xs, ys)  # both (H, W)
    return jnp.stack([xg, yg], axis=-1)
