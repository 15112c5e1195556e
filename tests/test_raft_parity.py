"""Golden-activation parity: our JAX RAFT-OU vs the reference torch model.

The reference at /root/reference is imported read-only as a TEST ORACLE (its
torch modules are instantiated with random weights, converted to flax via
convert.py, and outputs compared). No reference code is copied.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

try:
    from MFT.RAFT.core.raft import RAFT as TorchRAFT
    from MFT.RAFT.core.corr import CorrBlock as TorchCorrBlock
    HAVE_REF = True
except Exception:  # reference not available -> skip oracle tests
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference repo not importable")

from mft_tpu.models.raft.raft import RAFT, RAFTParams  # noqa: E402
from mft_tpu.models.raft.corr import build_corr_pyramid, corr_lookup  # noqa: E402
from mft_tpu.models.raft.upsample import convex_upsample, upsample8  # noqa: E402
from mft_tpu.models.raft.convert import torch_statedict_to_variables  # noqa: E402


class _Args(dict):
    """Attribute+contains dict, as the reference configs use for raft_params."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v


def make_torch_model(seed=0):
    torch.manual_seed(seed)
    args = _Args(occlusion_module="separate_with_uncertainty", small=False,
                 mixed_precision=False)
    model = TorchRAFT(args)
    model.eval()
    return model


def test_corr_pyramid_and_lookup_parity(rng):
    # NB: smallest pyramid level must be > 1x1 — the reference's own
    # bilinear_sampler divides by (W-1) and NaNs on 1x1 levels.
    B, C, H, W = 1, 32, 16, 24
    f1 = rng.standard_normal((B, C, H, W)).astype(np.float32)
    f2 = rng.standard_normal((B, C, H, W)).astype(np.float32)
    coords = rng.uniform(-2, 14, (B, H, W, 2)).astype(np.float32)

    with torch.no_grad():
        tc = TorchCorrBlock(torch.from_numpy(f1), torch.from_numpy(f2), radius=4)
        want = tc(torch.from_numpy(coords).permute(0, 3, 1, 2)).numpy()  # B,324,H,W

    pyr = build_corr_pyramid(jnp.asarray(np.transpose(f1, (0, 2, 3, 1))),
                             jnp.asarray(np.transpose(f2, (0, 2, 3, 1))))
    got = np.asarray(corr_lookup(pyr, jnp.asarray(coords), radius=4))  # B,H,W,324
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want, atol=2e-4)


def test_convex_upsample_parity(rng):
    B, h, w = 1, 4, 5
    flow = rng.standard_normal((B, 2, h, w)).astype(np.float32)
    mask = rng.standard_normal((B, 576, h, w)).astype(np.float32)
    with torch.no_grad():
        want = TorchRAFT.upsample_flow(None, torch.from_numpy(flow),
                                       torch.from_numpy(mask)).numpy()
    got = np.asarray(convex_upsample(jnp.asarray(np.transpose(flow, (0, 2, 3, 1))),
                                     jnp.asarray(np.transpose(mask, (0, 2, 3, 1))),
                                     mult_coef=8.0))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want, atol=1e-4)


def test_upsample8_parity(rng):
    x = rng.standard_normal((1, 1, 4, 5)).astype(np.float32)
    import torch.nn.functional as F
    with torch.no_grad():
        want = F.interpolate(torch.from_numpy(x), size=(32, 40), mode="bilinear",
                             align_corners=True).numpy()
    got = np.asarray(upsample8(jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want, atol=1e-5)


def test_full_raft_forward_parity(rng):
    tm = make_torch_model()
    variables = torch_statedict_to_variables(tm.state_dict())
    variables = jax.tree.map(jnp.asarray, variables)

    # fmaps are H/8 x W/8; keep the coarsest corr level > 1x1 (see above)
    H, W = 128, 192
    img1 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)

    with torch.no_grad():
        out_t = tm(torch.from_numpy(np.transpose(img1, (0, 3, 1, 2))),
                   torch.from_numpy(np.transpose(img2, (0, 3, 1, 2))),
                   iters=3, test_mode=True)

    model = RAFT(cfg=RAFTParams())
    out_j = model.apply(variables, jnp.asarray(img1), jnp.asarray(img2),
                        iters=3, test_mode=True)

    for key, ch in [("flow", 2), ("occlusion", 2), ("uncertainty", 1)]:
        want = out_t[key].numpy()
        got = np.transpose(np.asarray(out_j[key]), (0, 3, 1, 2))
        assert got.shape == want.shape, key
        np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3, err_msg=key)

    want_coords = out_t["coords"].numpy()
    got_coords = np.transpose(np.asarray(out_j["coords"]), (0, 3, 1, 2))
    np.testing.assert_allclose(got_coords, want_coords, atol=5e-3, rtol=1e-3)


def test_convex_upsample_multi_matches_single(rng):
    """Shared-mask multi-field upsampling == independent per-field calls."""
    import jax.numpy as jnp
    from mft_tpu.models.raft.upsample import (convex_upsample,
                                              convex_upsample_multi)
    B, h, w = 2, 8, 12
    mask = jnp.asarray(rng.standard_normal((B, h, w, 576)).astype(np.float32))
    fl = jnp.asarray(rng.standard_normal((B, h, w, 2)).astype(np.float32))
    oc = jnp.asarray(rng.standard_normal((B, h, w, 2)).astype(np.float32))
    un = jnp.asarray(rng.standard_normal((B, h, w, 1)).astype(np.float32))
    multi = convex_upsample_multi([fl, oc, un], mask, [8.0, 1.0, 8.0])
    singles = [convex_upsample(fl, mask, 8.0), convex_upsample(oc, mask, 1.0),
               convex_upsample(un, mask, 8.0)]
    for m, s in zip(multi, singles):
        np.testing.assert_allclose(np.asarray(m), np.asarray(s), atol=1e-5)


def test_convert_inverse_roundtrip(rng):
    """flax -> torch statedict -> flax must reproduce the variables exactly
    (the inverse converter derives its mapping from the forward one, so
    this closes the loop for handing trained flax weights to the reference
    torch pipeline)."""
    from mft_tpu.models.raft.convert import variables_to_torch_statedict

    tm = make_torch_model(seed=5)
    template = tm.state_dict()
    variables = torch_statedict_to_variables(template)
    # perturb so we don't accidentally pass by comparing against template
    variables = jax.tree.map(
        lambda v: np.asarray(v) + rng.standard_normal(np.shape(v)).astype(
            np.float32) * 0.01, variables)

    sd = variables_to_torch_statedict(variables, template)
    assert set(sd) == set(template)
    back = torch_statedict_to_variables(sd)

    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b) > 100
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    # and torch must accept it as a full state dict
    tm.load_state_dict({k: torch.from_numpy(np.asarray(v, np.float32))
                        if np.asarray(v).dtype.kind == "f"
                        else torch.from_numpy(np.asarray(v))
                        for k, v in sd.items()})


def test_convert_cli_round_trip(tmp_path):
    """The convert CLI (tools/download_models.sh flow) writes a msgpack that
    restores to the exact converted variables."""
    from flax import serialization
    from mft_tpu.models.raft import convert

    model = make_torch_model(seed=3)
    src = tmp_path / "m.pth"
    torch.save(model.state_dict(), src)
    dst = tmp_path / "m.msgpack"
    convert.main([str(src), str(dst)])
    restored = serialization.msgpack_restore(dst.read_bytes())
    direct = convert.load_torch_checkpoint(src)
    flat_r = jax.tree_util.tree_leaves_with_path(restored)
    flat_d = jax.tree_util.tree_leaves_with_path(direct)
    assert len(flat_r) == len(flat_d) > 100
    for (pr, vr), (pd, vd) in zip(flat_r, flat_d):
        assert pr == pd
        np.testing.assert_array_equal(np.asarray(vr), np.asarray(vd))


def test_full_raft_forward_parity_with_flow_init(rng):
    """Warm-started forward parity: the same low-res flow_init fed to both
    implementations (the reference's video warm-start input,
    MFT/RAFT/core/raft.py:153-154) must produce the same outputs. Pins the
    mechanism behind the tracker's warm_start_inf mode."""
    tm = make_torch_model(seed=1)
    variables = torch_statedict_to_variables(tm.state_dict())
    variables = jax.tree.map(jnp.asarray, variables)

    H, W = 128, 192
    img1 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
    init8 = rng.normal(0, 1.5, (1, H // 8, W // 8, 2)).astype(np.float32)

    with torch.no_grad():
        out_t = tm(torch.from_numpy(np.transpose(img1, (0, 3, 1, 2))),
                   torch.from_numpy(np.transpose(img2, (0, 3, 1, 2))),
                   iters=3,
                   flow_init=torch.from_numpy(
                       np.transpose(init8, (0, 3, 1, 2))),
                   test_mode=True)

    model = RAFT(cfg=RAFTParams())
    out_j = model.apply(variables, jnp.asarray(img1), jnp.asarray(img2),
                        iters=3, flow_init=jnp.asarray(init8),
                        test_mode=True)

    for key in ("flow", "occlusion", "uncertainty"):
        want = out_t[key].numpy()
        got = np.transpose(np.asarray(out_j[key]), (0, 3, 1, 2))
        assert got.shape == want.shape, key
        np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3,
                                   err_msg=key)


def _perturb_to_trained_like(tm, rng):
    """Trained-checkpoint-like statistics; canonical impl lives in
    tools/tapvid_parity.py (shared with the e2e + metric parity tests)."""
    from pathlib import Path
    repo = str(Path(__file__).resolve().parents[1])
    if repo not in sys.path:
        sys.path.insert(0, repo)
    from tools.tapvid_parity import perturb_to_trained_like
    perturb_to_trained_like(tm, rng)


def test_full_raft_forward_parity_trained_like_stats(rng):
    """Converter parity with non-trivial norm affine params + running stats
    (the closest available stand-in for the missing trained .pth blob)."""
    tm = make_torch_model(seed=2)
    _perturb_to_trained_like(tm, rng)
    tm.eval()
    variables = torch_statedict_to_variables(tm.state_dict())
    variables = jax.tree.map(jnp.asarray, variables)

    H, W = 128, 192
    img1 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)

    with torch.no_grad():
        out_t = tm(torch.from_numpy(np.transpose(img1, (0, 3, 1, 2))),
                   torch.from_numpy(np.transpose(img2, (0, 3, 1, 2))),
                   iters=2, test_mode=True)

    model = RAFT(cfg=RAFTParams())
    out_j = model.apply(variables, jnp.asarray(img1), jnp.asarray(img2),
                        iters=2, test_mode=True)

    for key in ("flow", "occlusion", "uncertainty"):
        want = out_t[key].numpy()
        got = np.transpose(np.asarray(out_j[key]), (0, 3, 1, 2))
        assert got.shape == want.shape, key
        np.testing.assert_allclose(got, want, atol=1e-2, rtol=2e-3,
                                   err_msg=key)
