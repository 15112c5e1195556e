"""Per-pair GRU iteration schedule (RAFT._flow_scheduled) correctness.

The schedule is the documented non-default speed mode: each delta pair runs
its own iteration count. The contract is EXACT per-pair parity with a uniform
run of that pair's count — scheduling must only skip work, never change math
(see mft_tpu/models/raft/raft.py _flow_scheduled).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mft_tpu.config import Config
from mft_tpu.models.raft import RAFTFlow
from mft_tpu.models.raft.raft import RAFT, RAFTParams


H, W = 48, 64


@pytest.fixture(scope="module")
def model_and_vars():
    model = RAFT(cfg=RAFTParams())
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(rng, dummy, dummy, iters=1)
    return model, variables


def _features(variables, model, B, seed=1):
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 255, (2 * B, H, W, 3)).astype(np.float32)
    fmap, cnet = model.apply(variables, jnp.asarray(imgs),
                             method=lambda m, im: m.encode(im))
    return fmap[:B], fmap[B:], cnet[:B]


def _fwd(model, variables, fmap1, fmap2, cnet, iters):
    return model.apply(
        variables, fmap1, fmap2, cnet,
        method=lambda m, a, b, c: m.flow_from_features(
            a, b, c, iters=iters, test_mode=True))


def test_uniform_schedule_matches_int_iters(model_and_vars):
    model, variables = model_and_vars
    f1, f2, cn = _features(variables, model, B=2)
    ref = _fwd(model, variables, f1, f2, cn, iters=3)
    out = _fwd(model, variables, f1, f2, cn, iters=(3, 3))
    for k in ("flow", "occlusion", "uncertainty", "coords"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_scheduled_pairs_match_individual_runs(model_and_vars):
    model, variables = model_and_vars
    B = 3
    sched = (3, 1, 2)  # deliberately NOT sorted: exercises the permutation
    f1, f2, cn = _features(variables, model, B=B)
    out = _fwd(model, variables, f1, f2, cn, iters=sched)
    for b, it in enumerate(sched):
        ref = _fwd(model, variables, f1[b:b + 1], f2[b:b + 1],
                   cn[b:b + 1], iters=it)
        for k in ("flow", "occlusion", "uncertainty", "coords"):
            np.testing.assert_allclose(
                np.asarray(out[k][b]), np.asarray(ref[k][0]),
                rtol=1e-4, atol=1e-4, err_msg=f"pair {b} ({it} iters) {k}")


def test_schedule_with_ties_and_jit(model_and_vars):
    model, variables = model_and_vars
    sched = (2, 2, 1, 2)
    f1, f2, cn = _features(variables, model, B=4)
    fwd = jax.jit(lambda v, a, b, c: model.apply(
        v, a, b, c, method=lambda m, x, y, z: m.flow_from_features(
            x, y, z, iters=sched, test_mode=True)))
    out = fwd(variables, f1, f2, cn)
    ref = _fwd(model, variables, f1, f2, cn, iters=sched)
    np.testing.assert_allclose(np.asarray(out["flow"]),
                               np.asarray(ref["flow"]), rtol=1e-5, atol=1e-5)
    assert np.isfinite(np.asarray(out["flow"])).all()


def test_schedule_validation(model_and_vars):
    model, variables = model_and_vars
    f1, f2, cn = _features(variables, model, B=2)
    with pytest.raises(ValueError):
        _fwd(model, variables, f1, f2, cn, iters=(3,))
    with pytest.raises(ValueError):
        _fwd(model, variables, f1, f2, cn, iters=(3, 0))


def _tracker(schedule=None, iters=2):
    flow_cfg = Config()
    flow_cfg.of_class = RAFTFlow
    flow_cfg.raft_params = {"occlusion_module": "separate_with_uncertainty"}
    flow_cfg.model = None
    flow_cfg.flow_iters = iters
    cfg = Config()
    cfg.flow_config = flow_cfg
    cfg.deltas = [np.inf, 1, 2]
    cfg.occlusion_threshold = 0.02
    if schedule is not None:
        cfg.flow_iters_schedule = schedule
    from mft_tpu.tracker import MFT
    return MFT(cfg)


def test_tracker_schedule_resolution():
    tr = _tracker(schedule={float("inf"): 3, 1: 1})
    assert tr._iters_schedule() == (3, 1, 2)  # missing delta 2 -> flow_iters
    tr2 = _tracker(schedule=[3, 1, 2])
    assert tr2._iters_schedule() == (3, 1, 2)
    tr3 = _tracker(schedule={"inf": 4})
    assert tr3._iters_schedule() == (4, 2, 2)
    assert _tracker()._iters_schedule() is None


def test_tracker_uniform_schedule_matches_default():
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
              for _ in range(4)]
    results = []
    for schedule in (None, [2, 2, 2]):
        tr = _tracker(schedule=schedule)
        tr.init(frames[0])
        outs = []
        for f in frames[1:]:
            meta = tr.track(f)
            outs.append(np.asarray(meta.result.flow))
        results.append(outs)
    for a, b in zip(*results):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
