"""Sequence losses for RAFT-OU training (flow L1, occlusion CE, uncertainty).

Formula parity with reference MFT/RAFT/train.py:44-245, jax-native:

- all masks are multiplicative (no boolean indexing) and every mean is over
  the FULL tensor (the reference's ``(mask * loss).mean()`` convention, which
  implicitly down-weights by the masked-out fraction);
- per-iteration predictions are weighted gamma^(n-i-1) (RAFT convention);
- flow loss variants: 'L1', 'L1_non_occluded', 'L1_occluded_to_epe3'
  (train.py:118-158);
- occlusion: cross-entropy on hard 0/1 GT only (occl_gt<0.01 or >0.99),
  computed — exactly as the reference does (train.py:108) — on the SOFTMAXED
  logits (a double-softmax quirk we replicate for parity);
- uncertainty: heteroscedastic Huber/L2 (He et al. 2019 eq. 9-10):
  exp(-alpha) * huber(epe) + alpha/2, plus 'epe_direct' variants and the
  optional epe-polynomial re-weighting (train.py:161-245);
- pixels with GT flow magnitude >= MAX_FLOW=400 are excluded (train.py:44).

Layout: channel-last. flow (B, H, W, 2); occl/valid (B, H, W); predictions
are lists over iterations; occlusion predictions are (B, H, W, 2) logits and
uncertainty predictions (B, H, W, 1) log-variances.
"""

import jax
import jax.numpy as jnp

MAX_FLOW = 400.0


def _huber(x, beta=1.0):
    """torch SmoothL1Loss with default beta=1."""
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def _base_valid(flow_gt, valid, max_flow):
    mag = jnp.sqrt(jnp.sum(jnp.square(flow_gt), axis=-1))
    return (valid >= 0.5) & (mag < max_flow)


def sequence_flow_loss(flow_preds, flow_gt, valid, occl_gt=None, gamma=0.8,
                       max_flow=MAX_FLOW, flow_loss_type="L1"):
    """Gamma-weighted L1 flow loss over the iteration sequence.

    returns (loss, metrics) with EPE / 1px / 3px / 5px train metrics.
    """
    base_valid = _base_valid(flow_gt, valid, max_flow)
    hard_occl = None
    if "occl" in flow_loss_type:
        assert occl_gt is not None
        hard_occl = occl_gt > 0.99

    n = len(flow_preds)
    loss = 0.0
    for i, pred in enumerate(flow_preds):
        w = gamma ** (n - i - 1)
        abs_err = jnp.abs(pred - flow_gt)
        if flow_loss_type == "L1":
            m = base_valid
        elif flow_loss_type == "L1_non_occluded":
            m = base_valid & ~hard_occl
        elif flow_loss_type == "L1_occluded_to_epe3":
            epe_i = jax.lax.stop_gradient(
                jnp.sqrt(jnp.sum(jnp.square(pred - flow_gt), axis=-1)))
            m = base_valid & (~hard_occl | (epe_i < 3.0))
        else:
            raise NotImplementedError(flow_loss_type)
        loss = loss + w * jnp.mean(m[..., None] * abs_err)

    epe = jnp.sqrt(jnp.sum(jnp.square(flow_preds[-1] - flow_gt), axis=-1))
    count = jnp.maximum(jnp.sum(base_valid), 1)
    vm = base_valid

    def vmean(x):
        return jnp.sum(jnp.where(vm, x, 0.0)) / count

    metrics = {
        "train/epe": vmean(epe),
        "train/1px": vmean((epe < 1).astype(jnp.float32)),
        "train/3px": vmean((epe < 3).astype(jnp.float32)),
        "train/5px": vmean((epe < 5).astype(jnp.float32)),
    }
    return loss, metrics


def sequence_occl_loss(occl_preds, occl_gt, flow_gt, valid, gamma=0.8,
                       max_flow=MAX_FLOW):
    """Occlusion cross-entropy on hard-0/1 ground truth only.

    NB: matches the reference exactly, INCLUDING its double softmax
    (CE applied to softmaxed logits, train.py:108). One deliberate fix: the
    reference multiplies ``valid[:, None]`` (B,1,H,W) with the (B,H,W) CE map,
    which broadcasts into a cross-batch (B,B,H,W) product (train.py:109) —
    we apply the mask per-sample, as intended (identical at batch size 1).
    """
    base_valid = _base_valid(flow_gt, valid, max_flow)
    hard = (occl_gt < 0.01) | (occl_gt > 0.99)
    m = base_valid & hard
    labels = (occl_gt > 0.5).astype(jnp.int32)

    n = len(occl_preds)
    loss = 0.0
    i_loss = None
    for i, logits in enumerate(occl_preds):
        w = gamma ** (n - i - 1)
        probs = jax.nn.softmax(logits, axis=-1)          # the quirk
        logp = jax.nn.log_softmax(probs, axis=-1)
        i_loss = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        loss = loss + w * jnp.mean(m * i_loss)
    metrics = {"train/cross_entropy_occl": jnp.mean(i_loss)}
    return loss, metrics


def _epe_weight_poly(epe):
    """Polynomial epe re-weighting (reference train.py:161-171)."""
    coef = jnp.array([-7.27864588e-02, 9.00020608e+00,
                      -1.79078330e+01, 8.68281513e+01])
    e = jax.lax.stop_gradient(jnp.clip(epe, 0.0, 50.0))
    return (e ** 3 * coef[0] + e ** 2 * coef[1] + e * coef[2] + coef[3]) / 50.0


def sequence_uncertainty_loss(flow_preds, uncertainty_preds, flow_gt, valid,
                              gamma=0.8, max_flow=MAX_FLOW,
                              uncertainty_loss_type="huber",
                              weighting_unc_loss=False, occl_gt=None):
    """Heteroscedastic uncertainty loss (He et al. 2019 eq. 9-10)."""
    base_valid = _base_valid(flow_gt, valid, max_flow)
    if "non_occluded" in uncertainty_loss_type:
        base_valid = base_valid & ~(occl_gt > 0.99)

    n = len(flow_preds)
    loss = 0.0
    i_loss = None
    for i in range(n):
        w = gamma ** (n - i - 1)
        alpha = uncertainty_preds[i][..., 0]  # (B, H, W)
        sq = jnp.sum(jnp.square(flow_preds[i] - flow_gt), axis=-1)
        epe = jax.lax.stop_gradient(jnp.sqrt(sq))

        if uncertainty_loss_type in ("huber", "huber_non_occluded",
                                     "L2", "L2_non_occluded"):
            exp_neg = jnp.exp(-alpha)
            if uncertainty_loss_type.startswith("L2"):
                err = 0.5 * exp_neg * jnp.square(epe)
            else:
                err = exp_neg * _huber(epe)
            i_loss = err + 0.5 * alpha
            if weighting_unc_loss:
                base = _huber(epe) if not uncertainty_loss_type.startswith("L2") \
                    else jnp.square(epe)
                i_loss = _epe_weight_poly(base) * i_loss
        elif uncertainty_loss_type in ("huber_epe_direct",
                                       "huber_epe_direct_non_occluded"):
            comp = -alpha * jnp.exp(-alpha)
            i_loss = _huber(comp - jax.lax.stop_gradient(sq))
            if weighting_unc_loss:
                i_loss = _epe_weight_poly(epe) * i_loss
        else:
            raise NotImplementedError(uncertainty_loss_type)

        loss = loss + w * jnp.mean(base_valid * i_loss)
    metrics = {"train/uncert": jnp.mean(i_loss)}
    return loss, metrics


def sequence_loss(preds, flow_gt, valid, occl_gt=None, gamma=0.8,
                  max_flow=MAX_FLOW, *,
                  freeze_optical_flow=False,
                  occlusion_module="separate_with_uncertainty",
                  uncertainty_loss_type="huber_non_occluded",
                  optical_flow_loss_type="L1",
                  weighting_unc_loss=False,
                  alpha_flow=1.0, alpha_occl=5.0, alpha_uncertainty=1.0):
    """Combined training objective (reference train.py:49-86).

    ``preds``: dict with 'flow', 'occlusion', 'uncertainty' lists from the
    model's train-mode forward.
    """
    total = 0.0
    metrics = {}
    if not freeze_optical_flow:
        flow_loss, m = sequence_flow_loss(preds["flow"], flow_gt, valid,
                                          occl_gt=occl_gt, gamma=gamma,
                                          max_flow=max_flow,
                                          flow_loss_type=optical_flow_loss_type)
        total = total + alpha_flow * flow_loss
        metrics.update(m)
    else:
        # metrics are still useful when flow is frozen
        _, m = sequence_flow_loss(preds["flow"], flow_gt, valid,
                                  occl_gt=occl_gt, gamma=gamma,
                                  max_flow=max_flow, flow_loss_type="L1")
        metrics.update(m)

    if occlusion_module is not None:
        occl_loss, m = sequence_occl_loss(preds["occlusion"], occl_gt, flow_gt,
                                          valid, gamma=gamma, max_flow=max_flow)
        total = total + alpha_occl * occl_loss
        metrics.update(m)

    if occlusion_module is not None and "uncertainty" in occlusion_module:
        unc_loss, m = sequence_uncertainty_loss(
            preds["flow"], preds["uncertainty"], flow_gt, valid, gamma=gamma,
            max_flow=max_flow, uncertainty_loss_type=uncertainty_loss_type,
            weighting_unc_loss=weighting_unc_loss, occl_gt=occl_gt)
        total = total + alpha_uncertainty * unc_loss
        metrics.update(m)

    return total, metrics
