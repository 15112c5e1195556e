"""Mesh construction + data-parallel sharding helpers.

Design: a 1-D ``data`` mesh axis by default (MFT is convolutional — there is
no attention/TP/PP structure to shard; the reference itself is data-parallel
only, train.py:376). Parameters are replicated, batches are sharded on the
leading axis, and XLA inserts the gradient psums over ICI.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_names=("data",), shape=None) -> Mesh:
    """Build a Mesh over ``devices`` (default: all available)."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch_fn(step_fn, mesh: Mesh, axis: str = "data"):
    """Wrap a (state, batch) -> (state, aux) step for data parallelism.

    state is replicated; every leaf of ``batch`` is sharded on its leading
    dimension. The wrapped function jits with explicit shardings so XLA
    partitions the forward/backward and inserts gradient all-reduces.
    """
    repl = replicated(mesh)
    shard = batch_sharding(mesh, axis)
    jitted = jax.jit(step_fn, donate_argnums=(0,))

    def wrapped(state, batch):
        state = jax.device_put(state, repl)
        batch = jax.tree.map(lambda b: jax.device_put(b, shard), batch)
        return jitted(state, batch)

    return wrapped


def shard_array(x, mesh: Mesh, spec: P):
    """Place an array with an explicit PartitionSpec."""
    return jax.device_put(x, NamedSharding(mesh, spec))
