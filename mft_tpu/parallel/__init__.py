"""Device mesh, sharding, and multi-clip streaming (SPMD scaling layer).

The reference has no distributed backend (SURVEY §2.4: single GPU, one
DataParallel wrapper). This package is the TPU-native scaling layer:
- ``mesh``: jax.sharding.Mesh construction + data-parallel wrappers for the
  train step (collectives inserted by XLA over ICI);
- ``streaming``: batched multi-clip dense-tracking throughput mode — many
  video clips tracked in lockstep, sharded over the mesh data axis.
"""

from mft_tpu.parallel.mesh import make_mesh, shard_batch_fn
from mft_tpu.parallel.streaming import StreamingTracker

__all__ = ["make_mesh", "shard_batch_fn", "StreamingTracker"]
