"""Training checkpoints: params + optimizer state + step (orbax-backed).

Improvement over the reference (train.py:423-424 saves weights only, so
resume loses optimizer/scheduler state): we checkpoint the full train state
and support weights-only export for inference (flax msgpack, read by
mft_tpu.models.raft.wrapper.load_variables).
"""

import logging
from pathlib import Path

import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


def save_checkpoint(ckpt_dir, step, state):
    """state: any pytree (e.g. {'variables': ..., 'opt_state': ..., 'step': ...})."""
    path = Path(ckpt_dir).resolve() / f"step_{step:08d}"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    logger.info("saved checkpoint %s", path)
    return path


def latest_checkpoint(ckpt_dir):
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    steps = sorted(ckpt_dir.glob("step_*"))
    return steps[-1] if steps else None


def restore_checkpoint(ckpt_path, target):
    """Restore into the structure of ``target`` (concrete or abstract)."""
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(ckpt_path).resolve(), target)


def export_weights(path, variables):
    """Weights-only msgpack export for inference configs."""
    from mft_tpu.models.raft.wrapper import save_variables
    save_variables(path, variables)
    logger.info("exported inference weights to %s", path)
