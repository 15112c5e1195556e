"""Optimizer, LR schedule, and parameter freezing for RAFT-OU training.

Reference parity (MFT/RAFT/train.py:252-259, 348-364):
- AdamW(lr, weight_decay, eps) + OneCycleLR over num_steps+100 with linear
  annealing and pct_start=0.05 (torch defaults: div_factor=25,
  final_div_factor=1e4), gradient clipping at 1.0;
- weight freezing by parameter-path masks: the official recipe freezes the
  flow network and features and trains only the occlusion_block.
"""

from typing import Sequence

import jax
import optax
from flax import traverse_util


def onecycle_linear(max_lr, total_steps, pct_start=0.05, div_factor=25.0,
                    final_div_factor=1e4):
    """torch OneCycleLR(anneal_strategy='linear') equivalent schedule."""
    initial = max_lr / div_factor
    final = initial / final_div_factor
    # torch OneCycleLR phase boundaries: up ends at pct_start*total - 1,
    # down ends at total - 1
    up_end = max(float(pct_start * total_steps) - 1.0, 1.0)
    down_end = float(total_steps - 1)

    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        up = initial + (max_lr - initial) * jnp.minimum(step / up_end, 1.0)
        down_frac = jnp.clip((step - up_end) / max(down_end - up_end, 1.0),
                             0.0, 1.0)
        down = max_lr + (final - max_lr) * down_frac
        return jnp.where(step <= up_end, up, down)

    return schedule


def trainable_mask(params, trainable_prefixes: Sequence[str]):
    """Pytree of bools: True where the parameter path starts with a prefix.

    Paths are '/'-joined flax module paths, e.g. 'occlusion_block/occl_head'.
    Reference parity: weight_freezer (train.py:348-364) — freeze-all +
    unfreeze-occlusion_block corresponds to prefixes=('occlusion_block',).
    """
    flat = traverse_util.flatten_dict(params)
    mask = {
        k: any("/".join(k).startswith(p) for p in trainable_prefixes)
        for k in flat
    }
    return traverse_util.unflatten_dict(mask)


def make_optimizer(lr=1.25e-4, num_steps=50_000, weight_decay=1e-5,
                   epsilon=1e-8, clip=1.0, params=None,
                   trainable_prefixes=None):
    """AdamW + OneCycle + clip, with optional parameter freezing."""
    schedule = onecycle_linear(lr, num_steps + 100)
    tx = optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(schedule, weight_decay=weight_decay, eps=epsilon),
    )
    if trainable_prefixes is not None:
        assert params is not None, "params needed to build the freeze mask"
        mask = trainable_mask(params, trainable_prefixes)
        tx = optax.chain(
            optax.masked(tx, mask),
            # frozen params: zero updates (keeps the update tree complete)
            optax.masked(optax.set_to_zero(),
                         jax.tree.map(lambda m: not m, mask)),
        )
    return tx, schedule
