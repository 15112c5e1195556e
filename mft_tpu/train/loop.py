"""RAFT-OU training loop (the official OU-head finetuning recipe + full RAFT).

Role parity with reference MFT/RAFT/train.py:369-477 and its CLI
(@file argument lists supported, train.py:487-535 / train_params.txt):
AdamW + OneCycle, grad clip 1.0, gamma-weighted sequence losses, parameter
freezing (flow + features frozen -> only occlusion_block trains), periodic
validation + checkpointing every VAL_FREQ steps.

TPU-first: one jitted, donated train step; batches are built host-side by a
thread prefetcher and moved once per step; optional data-parallel sharding
over a device mesh (see mft_tpu.parallel).
"""

import argparse
import logging
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

from mft_tpu.models.raft.raft import RAFT, RAFTParams
from mft_tpu.train.losses import sequence_loss
from mft_tpu.train.optim import make_optimizer

logger = logging.getLogger(__name__)

SUM_FREQ = 10
VAL_FREQ = 5000


def make_train_step(model, tx, loss_kwargs, iters=12, train_bn=False,
                    mesh=None):
    """Build the jitted train step: (state, batch) -> (state, metrics).

    state = {'variables': {...}, 'opt_state': ..., 'step': int}
    batch = (img1, img2, flow, valid, occl), channel-last device arrays.
    """

    def loss_fn(params, extra_vars, batch):
        img1, img2, flow_gt, valid, occl_gt = batch
        variables = {"params": params, **extra_vars}
        if train_bn and "batch_stats" in extra_vars:
            preds, new_vars = model.apply(variables, img1, img2, iters=iters,
                                          test_mode=False,
                                          mutable=["batch_stats"])
        else:
            preds = model.apply(variables, img1, img2, iters=iters,
                                test_mode=False)
            new_vars = {}
        loss, metrics = sequence_loss(preds, flow_gt, valid, occl_gt=occl_gt,
                                      **loss_kwargs)
        return loss, (metrics, new_vars)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, batch):
        params = state["variables"]["params"]
        extra = {k: v for k, v in state["variables"].items() if k != "params"}
        (loss, (metrics, new_vars)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, extra, batch)
        updates, opt_state = tx.update(grads, state["opt_state"], params)
        params = optax.apply_updates(params, updates)
        variables = {"params": params, **extra, **new_vars}
        metrics["train/loss"] = loss
        return {"variables": variables, "opt_state": opt_state,
                "step": state["step"] + 1}, metrics

    if mesh is not None:
        from mft_tpu.parallel.mesh import shard_batch_fn
        step = shard_batch_fn(step, mesh)
    return step


def build_state(model, tx, example_hw=(368, 768), restore=None, seed=1234):
    H, W = example_hw
    dummy = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), dummy, dummy, iters=1)
    variables = dict(variables)
    if restore:
        from mft_tpu.models.raft.wrapper import load_variables
        loaded = load_variables(restore, model, example_hw=(64, 64))
        variables.update(dict(loaded))
    opt_state = tx.init(variables["params"])
    return {"variables": variables, "opt_state": opt_state, "step": 0}


def train(args):
    # --mixed_precision: bf16 compute, f32 params/optimizer state. The TPU
    # analog of the reference's GradScaler AMP (train.py:389) — bf16 keeps
    # f32's exponent range, so no loss scaling is needed.
    cfg = RAFTParams(small=args.small, occlusion_module=args.occlusion_module,
                     compute_dtype="bfloat16" if args.mixed_precision
                     else "float32")
    model = RAFT(cfg=cfg, train_mode=not args.freeze_features_training)

    trainable = None
    if args.freeze_optical_flow_training and args.freeze_features_training:
        trainable = ("occlusion_block",)  # the official recipe
    tx, schedule = make_optimizer(lr=args.lr, num_steps=args.num_steps,
                                  weight_decay=args.wdecay,
                                  epsilon=args.epsilon, clip=args.clip,
                                  params=None, trainable_prefixes=None)

    # --restore_ckpt: a .pth/.msgpack file restores WEIGHTS only (the
    # reference's strict=False torch.load behavior, train.py:379-380); an
    # orbax checkpoint DIRECTORY from a previous run restores the full
    # train state (params + optimizer + step) after the optimizer is built
    restore_dir = None
    restore_weights = args.restore_ckpt
    if args.restore_ckpt and Path(args.restore_ckpt).is_dir():
        restore_dir, restore_weights = Path(args.restore_ckpt), None
        if not restore_dir.name.startswith("step_"):
            # a run's checkpoint ROOT was given — resume its newest step
            from mft_tpu.train.checkpoint import latest_checkpoint
            latest = latest_checkpoint(restore_dir)
            if latest is None:
                raise FileNotFoundError(
                    f"no step_* checkpoints under {restore_dir}")
            restore_dir = latest

    state = build_state(model, tx, tuple(args.image_size),
                        restore=restore_weights)
    if trainable is not None:
        tx, schedule = make_optimizer(lr=args.lr, num_steps=args.num_steps,
                                      weight_decay=args.wdecay,
                                      epsilon=args.epsilon, clip=args.clip,
                                      params=state["variables"]["params"],
                                      trainable_prefixes=trainable)
        state["opt_state"] = tx.init(state["variables"]["params"])
    if restore_dir is not None:
        from mft_tpu.train.checkpoint import restore_checkpoint
        state = restore_checkpoint(restore_dir, state)
        logger.info("resumed full train state from %s (step %d)",
                    restore_dir, int(state["step"]))

    loss_kwargs = dict(
        gamma=args.gamma,
        freeze_optical_flow=args.freeze_optical_flow_training,
        occlusion_module=args.occlusion_module,
        uncertainty_loss_type=args.uncertainty_loss,
        optical_flow_loss_type=args.optical_flow_loss,
        weighting_unc_loss=args.weighting_unc_loss,
    )
    step_fn = make_train_step(model, tx, loss_kwargs, iters=args.iters,
                              train_bn=not args.freeze_features_training)

    from mft_tpu.train.datasets import fetch_dataset, BatchLoader
    dataset = fetch_dataset(args.stage, args.image_size,
                            dashcam_augmentation=args.dashcam_augmenentation)
    loader = BatchLoader(dataset, args.batch_size, num_workers=args.num_workers)

    from mft_tpu.train.checkpoint import save_checkpoint, export_weights
    from mft_tpu.train.logger import TrainLogger
    ckpt_dir = Path(args.checkpoint_dir) / args.name
    tlog = TrainLogger(ckpt_dir / "runs")
    tlog.total_steps = int(state["step"])
    for batch in loader:
        batch = tuple(jnp.asarray(b) for b in batch)
        state, metrics = step_fn(state, batch)
        step = int(state["step"])
        tlog.push(metrics, lr=float(schedule(step)))
        if step % VAL_FREQ == 0 or step >= args.num_steps:
            save_checkpoint(ckpt_dir, step, state)
            export_weights(ckpt_dir / f"{args.name}_step{step}.msgpack",
                           state["variables"])
            # image panels from the current batch (reference train.py:444-465)
            try:
                # train_mode models update batch_stats on apply; collect and
                # discard the mutation instead of tripping flax's immutable-
                # collection error (the train step does the same, above)
                preds, _ = model.apply(state["variables"], batch[0][:1],
                                       batch[1][:1], iters=args.iters,
                                       test_mode=False,
                                       mutable=["batch_stats"])
                tlog.write_prediction_panels(
                    tuple(b[:1] if b is not None else None for b in batch),
                    preds)
            except Exception:
                logger.exception("panel rendering failed")
            if args.validation:
                from mft_tpu.train.validate import run_validation
                for val_name in args.validation:
                    try:
                        res = run_validation(val_name, model, state["variables"],
                                             iters=args.iters)
                        logger.info("validation %s @%d: %s", val_name, step, res)
                        tlog.write_dict({f"val/{val_name}/{k}": v
                                         for k, v in res.items()})
                    except Exception:
                        logger.exception("validation %s failed", val_name)
        if step >= args.num_steps:
            break
    tlog.close()
    return state


def get_parser():
    parser = argparse.ArgumentParser(fromfile_prefix_chars="@")
    parser.add_argument("--name", default="raftou")
    parser.add_argument("--stage", default="sintel_things_kubric_train_subsplit")
    parser.add_argument("--validation", nargs="*", default=[])
    parser.add_argument("--occlusion_module", default="separate_with_uncertainty")
    parser.add_argument("--small", action="store_true")
    parser.add_argument("--freeze_optical_flow_training", action="store_true")
    parser.add_argument("--freeze_features_training", action="store_true")
    parser.add_argument("--uncertainty_loss", default="huber_non_occluded")
    parser.add_argument("--optical_flow_loss", default="L1")
    parser.add_argument("--weighting_unc_loss", action="store_true")
    # jpeg-corruption augmentation at p=0.5 (reference train.py:525 — the
    # reference's flag spelling, typo included, for @file compatibility)
    parser.add_argument("--dashcam_augmenentation", action="store_true")
    parser.add_argument("--mixed_precision", action="store_true",
                        help="bf16 compute (f32 params; no loss scaling)")
    parser.add_argument("--restore_ckpt", default=None)
    parser.add_argument("--num_steps", type=int, default=50000)
    parser.add_argument("--batch_size", type=int, default=6)
    parser.add_argument("--lr", type=float, default=1.25e-4)
    parser.add_argument("--image_size", type=int, nargs=2, default=[368, 768])
    parser.add_argument("--wdecay", type=float, default=1e-5)
    parser.add_argument("--epsilon", type=float, default=1e-8)
    parser.add_argument("--clip", type=float, default=1.0)
    parser.add_argument("--gamma", type=float, default=0.85)
    parser.add_argument("--iters", type=int, default=12)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--checkpoint_dir", default="checkpoints")
    return parser


def _main():
    logging.basicConfig(level=logging.INFO)
    train(get_parser().parse_args())



def main():
    import os
    from mft_tpu.utils.various import with_debugger
    entry = _main if not os.environ.get("MFT_TPU_DEBUG") else with_debugger(_main)
    entry()


if __name__ == "__main__":
    main()
