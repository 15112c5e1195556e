"""Training stack: loss parity vs torch reference, schedule, freezing, data."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mft_tpu.train.losses import (sequence_flow_loss, sequence_occl_loss,
                                  sequence_uncertainty_loss)
from mft_tpu.train.optim import onecycle_linear, make_optimizer, trainable_mask

torch = pytest.importorskip("torch")


def _reference_train():
    import types
    # the reference hard-imports debugger/vision/telemetry helpers absent here
    class _Any:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            return a[0] if a else None

    tv_transforms = types.ModuleType("torchvision.transforms")
    tv_transforms.ColorJitter = _Any
    tv = types.ModuleType("torchvision")
    tv.transforms = tv_transforms
    tb = types.ModuleType("torch.utils.tensorboard")
    tb.SummaryWriter = _Any
    for mod, stub_attrs in [("ipdb", {"iex": lambda f: f}),
                            ("torchvision", None),
                            ("torchvision.transforms", None),
                            ("torch.utils.tensorboard", None)]:
        if mod in sys.modules:
            continue
        if mod == "torchvision":
            sys.modules[mod] = tv
        elif mod == "torchvision.transforms":
            sys.modules[mod] = tv_transforms
        elif mod == "torch.utils.tensorboard":
            sys.modules[mod] = tb
        else:
            stub = types.ModuleType(mod)
            for k, v in (stub_attrs or {}).items():
                setattr(stub, k, v)
            sys.modules[mod] = stub
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        from MFT.RAFT import train as ref_train
        return ref_train
    except Exception:
        return None


def synth_batch(rng, B=2, H=16, W=20, n_preds=3):
    flow_gt = rng.standard_normal((B, H, W, 2)).astype(np.float32) * 5
    valid = (rng.uniform(size=(B, H, W)) > 0.2).astype(np.float32)
    occl = rng.choice([0.0, 0.5, 1.0], size=(B, H, W), p=[0.6, 0.1, 0.3]).astype(np.float32)
    flow_preds = [flow_gt + rng.standard_normal((B, H, W, 2)).astype(np.float32)
                  for _ in range(n_preds)]
    occl_preds = [rng.standard_normal((B, H, W, 2)).astype(np.float32)
                  for _ in range(n_preds)]
    unc_preds = [rng.standard_normal((B, H, W, 1)).astype(np.float32)
                 for _ in range(n_preds)]
    return flow_gt, valid, occl, flow_preds, occl_preds, unc_preds


def to_torch_chfirst(x):
    t = torch.from_numpy(np.asarray(x))
    if t.ndim == 4:
        return t.permute(0, 3, 1, 2)
    return t


@pytest.mark.parametrize("loss_type", ["L1", "L1_non_occluded",
                                       "L1_occluded_to_epe3"])
def test_flow_loss_matches_reference(rng, loss_type):
    ref = _reference_train()
    if ref is None:
        pytest.skip("reference train module not importable")
    flow_gt, valid, occl, flow_preds, _, _ = synth_batch(rng)
    ours, m = sequence_flow_loss(
        [jnp.asarray(p) for p in flow_preds], jnp.asarray(flow_gt),
        jnp.asarray(valid), occl_gt=jnp.asarray(occl), gamma=0.8,
        flow_loss_type=loss_type)
    want, wm = ref.sequence_flow_loss(
        [to_torch_chfirst(p) for p in flow_preds], to_torch_chfirst(flow_gt),
        to_torch_chfirst(valid[..., None]), occl_gt=to_torch_chfirst(occl[..., None]),
        gamma=0.8, flow_loss_type=loss_type)
    np.testing.assert_allclose(float(ours), float(want), rtol=1e-5)
    np.testing.assert_allclose(float(m["train/epe"]), wm["train/epe"], rtol=1e-4)
    np.testing.assert_allclose(float(m["train/1px"]), wm["train/1px"], rtol=1e-4)


def test_occl_loss_matches_reference(rng):
    ref = _reference_train()
    if ref is None:
        pytest.skip("reference train module not importable")
    # B=1: at larger batch the REFERENCE cross-batch-broadcasts its validity
    # mask (train.py:109 bug, see losses.py docstring); both agree at B=1.
    flow_gt, valid, occl, _, occl_preds, _ = synth_batch(rng, B=1)
    ours, _ = sequence_occl_loss(
        [jnp.asarray(p) for p in occl_preds], jnp.asarray(occl),
        jnp.asarray(flow_gt), jnp.asarray(valid), gamma=0.8)
    want, _ = ref.sequence_occl_loss(
        [to_torch_chfirst(p) for p in occl_preds], to_torch_chfirst(occl[..., None]),
        to_torch_chfirst(flow_gt), to_torch_chfirst(valid[..., None]), gamma=0.8)
    np.testing.assert_allclose(float(ours), float(want), rtol=1e-5)


@pytest.mark.parametrize("unc_type", ["huber", "huber_non_occluded", "L2",
                                      "huber_epe_direct"])
def test_uncertainty_loss_matches_reference(rng, unc_type):
    ref = _reference_train()
    if ref is None:
        pytest.skip("reference train module not importable")
    flow_gt, valid, occl, flow_preds, _, unc_preds = synth_batch(rng)
    ours, _ = sequence_uncertainty_loss(
        [jnp.asarray(p) for p in flow_preds],
        [jnp.asarray(p) for p in unc_preds],
        jnp.asarray(flow_gt), jnp.asarray(valid), gamma=0.8,
        uncertainty_loss_type=unc_type, occl_gt=jnp.asarray(occl))
    want, _ = ref.sequence_uncertainty_loss(
        [to_torch_chfirst(p) for p in flow_preds],
        [to_torch_chfirst(p) for p in unc_preds],
        to_torch_chfirst(flow_gt), to_torch_chfirst(valid[..., None]), gamma=0.8,
        uncertainty_loss_type=unc_type, occl_gt=to_torch_chfirst(occl[..., None]))
    np.testing.assert_allclose(float(ours), float(want), rtol=1e-4)


def test_onecycle_matches_torch():
    max_lr, steps = 1.25e-4, 1000
    sched = onecycle_linear(max_lr, steps, pct_start=0.05)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=max_lr)
    tsched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr, steps, pct_start=0.05, cycle_momentum=False,
        anneal_strategy="linear")
    torch_lrs = []
    for _ in range(steps):
        torch_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        tsched.step()
    ours = np.array([float(sched(i)) for i in range(steps)])
    np.testing.assert_allclose(ours, np.array(torch_lrs), rtol=0.02)


@pytest.mark.slow
def test_freeze_masks_only_update_ou_block(rng):
    """Official recipe: only occlusion_block parameters may change."""
    from mft_tpu.models.raft.raft import RAFT, RAFTParams
    import optax

    model = RAFT(cfg=RAFTParams())
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img, iters=1)
    params = variables["params"]
    tx, _ = make_optimizer(lr=1e-3, num_steps=10, params=params,
                           trainable_prefixes=("occlusion_block",))
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)

    from flax import traverse_util
    old = traverse_util.flatten_dict(params)
    new = traverse_util.flatten_dict(new_params)
    for k in old:
        changed = not np.allclose(np.asarray(old[k]), np.asarray(new[k]))
        if k[0] == "occlusion_block":
            assert changed, f"{k} should have been updated"
        else:
            assert not changed, f"{k} should be frozen"


def test_flow_readers_roundtrip(tmp_path, rng):
    from mft_tpu.train import flow_readers as fr
    flow = rng.standard_normal((12, 17, 2)).astype(np.float32) * 10
    fr.write_flo(tmp_path / "a.flo", flow)
    np.testing.assert_allclose(fr.read_flo(tmp_path / "a.flo"), flow)

    pfm = rng.standard_normal((9, 11, 3)).astype(np.float32)
    fr.write_pfm(tmp_path / "a.pfm", pfm)
    np.testing.assert_allclose(fr.read_pfm(tmp_path / "a.pfm"), pfm)

    kflow = rng.uniform(-30, 30, (8, 10, 2)).astype(np.float32)
    kvalid = (rng.uniform(size=(8, 10)) > 0.5).astype(np.float32)
    fr.write_kitti_flow(tmp_path / "k.png", kflow, kvalid)
    rflow, rvalid = fr.read_kitti_flow(tmp_path / "k.png")
    np.testing.assert_allclose(rflow, kflow, atol=1 / 64)
    np.testing.assert_array_equal(rvalid > 0.5, kvalid > 0.5)


def test_augmentor_shapes_and_oof(rng):
    from mft_tpu.train.augment import FlowAugmenter
    H, W = 96, 128
    img1 = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    img2 = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    flow = rng.standard_normal((H, W, 2)).astype(np.float32) * 3
    occl = np.zeros((H, W, 1), np.float32)
    aug = FlowAugmenter(crop_size=(64, 64), seed=0)
    for _ in range(5):
        o1, o2, of, ov, oo = aug(img1.copy(), img2.copy(), flow.copy(),
                                 None, occl.copy())
        assert o1.shape == (64, 64, 3) and o2.shape == (64, 64, 3)
        assert of.shape == (64, 64, 2) and ov.shape == (64, 64)
        assert oo.shape == (64, 64, 1)
        assert oo.min() >= 0 and oo.max() <= 1

    # out-of-frame endpoints must be marked occluded
    big_flow = np.full((32, 32, 2), 100.0, np.float32)
    occ = FlowAugmenter.mark_out_of_frame_occluded(big_flow,
                                                   np.zeros((32, 32), np.float32))
    assert occ.min() == 1.0


def test_augmenter_valid_mask_is_transformed(rng):
    """A caller-supplied valid mask (e.g. Kubric correct_flow ambiguity)
    must be cropped/flipped WITH the sample, not recomputed from the flow
    (reference augmentor.py:304-312)."""
    from mft_tpu.train.augment import FlowAugmenter
    H, W = 96, 128
    img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    flow = np.zeros((H, W, 2), np.float32)  # all-finite: magnitude mask = 1
    occl = np.zeros((H, W, 1), np.float32)
    valid = np.zeros((H, W), np.float32)  # fully INVALID input mask
    aug = FlowAugmenter(crop_size=(64, 64), seed=0)
    _, _, _, ov, _ = aug(img.copy(), img.copy(), flow, valid, occl)
    # a discarded mask would come back all-ones from |flow| < 1000
    assert ov.max() <= 0.5


def test_sparse_color_transform_is_symmetric(rng):
    """SparseFlowAugmenter's jitter must be identical for both frames
    (reference SparseFlowAugmentor has no asymmetric pass)."""
    from mft_tpu.train.augment import SparseFlowAugmenter
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    aug = SparseFlowAugmenter(crop_size=(32, 32), seed=0)
    o1, o2 = aug.color_transform(img.copy(), img.copy())
    np.testing.assert_array_equal(o1, o2)


def test_mixed_dataset_weights():
    from mft_tpu.train.datasets import MixedDataset

    class Dummy:
        def __init__(self, tag, n):
            self.tag, self.n = tag, n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return self.tag

    ds = MixedDataset([Dummy("a", 3), Dummy("b", 2)], weights=[2, 1])
    assert len(ds) == 8
    tags = [ds[i] for i in range(len(ds))]
    assert tags.count("a") == 6 and tags.count("b") == 2


def test_viper_dataset_reads_npz_flow(tmp_path, rng):
    """VIPER dataset: pairs + npz flow with NaN->invalid sparse semantics."""
    import cv2
    from mft_tpu.train.datasets import VIPER

    seq = tmp_path / "val" / "img" / "001"
    flows = tmp_path / "val" / "flow" / "001"
    seq.mkdir(parents=True)
    flows.mkdir(parents=True)
    H, W = 24, 32
    for i in range(3):
        img = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
        cv2.imwrite(str(seq / f"001_{i:05d}.jpg"), img)
    for i in range(2):
        u = rng.normal(size=(H, W)).astype(np.float32)
        v = rng.normal(size=(H, W)).astype(np.float32)
        u[0, 0] = np.nan  # invalid pixel
        np.savez(flows / f"001_{i:05d}.npz", u=u, v=v)

    ds = VIPER(None, split="validation", root=str(tmp_path))
    assert len(ds) == 2
    img1, img2, flow, valid, occl = ds[0]
    assert img1.shape == (H, W, 3) and flow.shape == (H, W, 2)
    assert valid[0, 0] == 0.0 and valid[1, 1] == 1.0
    assert np.isfinite(flow).all()


@pytest.mark.slow
def test_orbax_full_state_checkpoint_roundtrip(tmp_path, rng):
    """save_checkpoint/restore_checkpoint round-trip the FULL train state
    (params + optimizer + step) — the resume path of --restore_ckpt with an
    orbax directory (reference restores weights only, train.py:379-380)."""
    from mft_tpu.models.raft.raft import RAFT, RAFTParams
    from mft_tpu.train.loop import build_state, make_train_step
    from mft_tpu.train.checkpoint import (latest_checkpoint, restore_checkpoint,
                                          save_checkpoint)
    from mft_tpu.train.optim import make_optimizer

    model = RAFT(cfg=RAFTParams(small=True), train_mode=False)
    tx, _ = make_optimizer(lr=1e-4, num_steps=4)
    H, W = 64, 96
    state = build_state(model, tx, example_hw=(H, W))
    step_fn = make_train_step(
        model, tx,
        dict(gamma=0.85, freeze_optical_flow=False,
             occlusion_module="separate_with_uncertainty",
             uncertainty_loss_type="huber_non_occluded",
             optical_flow_loss_type="L1"),
        iters=1)
    B = 1
    batch = (
        jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)), jnp.float32),
        jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)), jnp.float32),
        jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32),
        jnp.ones((B, H, W), jnp.float32),
        jnp.zeros((B, H, W), jnp.float32),
    )
    state, _ = step_fn(state, batch)
    state, _ = step_fn(state, batch)
    save_checkpoint(tmp_path, int(state["step"]), state)

    fresh = build_state(model, tx, example_hw=(H, W), seed=999)
    assert int(fresh["step"]) == 0
    path = latest_checkpoint(tmp_path)
    restored = restore_checkpoint(path, fresh)
    assert int(restored["step"]) == 2
    a = jax.tree.leaves(restored["variables"])
    b = jax.tree.leaves(state["variables"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    oa = jax.tree.leaves(restored["opt_state"])
    ob = jax.tree.leaves(state["opt_state"])
    for x, y in zip(oa, ob):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_jpeg_transform_structural(rng):
    """Fixed-seed JPEG corruption: same shape/dtype, visibly lossy, both
    frames corrupted at a shared severity (reference augmentor.py:212-218)."""
    from mft_tpu.train.augment import FlowAugmenter, jpeg_corrupt
    img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    out = jpeg_corrupt(img, severity=3)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert not np.array_equal(out, img)  # lossy at quality 15
    # severity ordering: stronger corruption -> larger deviation
    e1 = np.abs(jpeg_corrupt(img, 1).astype(int) - img.astype(int)).mean()
    e3 = np.abs(jpeg_corrupt(img, 3).astype(int) - img.astype(int)).mean()
    assert e3 >= e1

    aug = FlowAugmenter(crop_size=(32, 32), seed=0, do_jpeg_transform=True,
                        jpeg_prop=1.0)
    i1, i2 = aug.jpeg_transform(img.copy(), img.copy())
    assert not np.array_equal(i1, img)
    np.testing.assert_array_equal(i1, i2)  # same severity on both


def test_blend_augmenter_structural(tmp_path, rng):
    """Perlin-alpha lighten-only blend: output >= input (lighten-only),
    uint8, applied identically to both frames (reference augmentor.py:26-93)."""
    import cv2
    from mft_tpu.train.augment import BlendAugmenter, _perlin_noise_2d

    noise = _perlin_noise_2d((128, 128), (8, 8), np.random.default_rng(0))
    assert noise.shape == (128, 128)
    assert -1.5 < noise.min() < noise.max() < 1.5
    assert noise.std() > 0.05  # non-degenerate

    src = tmp_path / "coco"
    src.mkdir()
    bright = np.full((40, 60, 3), 255, np.uint8)
    cv2.imwrite(str(src / "b.png"), bright)
    aug = BlendAugmenter(source_dir=str(src), blend_prop=1.0,
                         rng=np.random.default_rng(3))
    img1 = rng.integers(0, 100, (64, 96, 3), dtype=np.uint8)
    img2 = img1.copy()
    o1, o2 = aug(img1, img2)
    assert o1.dtype == np.uint8 and o1.shape == img1.shape
    assert (o1.astype(int) >= img1.astype(int) - 1).all()  # lighten-only
    np.testing.assert_array_equal(o1, o2)  # same blend on both frames
    # disabled when no source dir
    off = BlendAugmenter(source_dir=None, blend_prop=1.0)
    a, b = off(img1.copy(), img2.copy())
    np.testing.assert_array_equal(a, img1)


def test_text_augmenter_structural(rng):
    """Random text overlays: pixels changed, validity zeroed under the text
    (reference augmentor.py:96-154)."""
    from mft_tpu.train.augment import TextAugmenter
    img1 = np.zeros((96, 128, 3), np.uint8)
    img2 = np.zeros((96, 128, 3), np.uint8)
    valid = np.ones((96, 128), np.float32)
    aug = TextAugmenter(do_add_text=True, add_text_prop=1.0, max_add_text=3,
                        rng=np.random.default_rng(1))
    # some draws can land text off-frame; try a few seeds deterministically
    for seed in range(1, 6):
        aug.rng = np.random.default_rng(seed)
        o1, o2, ov = aug(img1.copy(), img2.copy(), valid.copy())
        if (o1 != img1).any():
            break
    assert (o1 != img1).any()
    assert o1.dtype == np.uint8
    assert ov.min() == 0.0  # text pixels invalidated
    # invalidated exactly where non-alpha-blended text pixels were drawn
    assert ((ov == 0) | (ov == 1)).all()


def test_flow_augmenter_call_with_corruptions(rng):
    """End-to-end __call__ with jpeg+text on: shapes and valid-mask dtype."""
    from mft_tpu.train.augment import FlowAugmenter
    H, W = 96, 128
    img1 = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    img2 = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    flow = rng.standard_normal((H, W, 2)).astype(np.float32) * 3
    occl = np.zeros((H, W, 1), np.float32)
    aug = FlowAugmenter(crop_size=(64, 64), seed=0, do_jpeg_transform=True,
                        jpeg_prop=1.0, do_add_text_transform=True,
                        add_text_prop=1.0)
    o1, o2, of, ov, oo = aug(img1, img2, flow, None, occl)
    assert o1.shape == (64, 64, 3) and of.shape == (64, 64, 2)
    assert ov.shape == (64, 64) and ov.dtype == np.float32
    assert oo.shape == (64, 64, 1)


def test_fetch_dataset_dashcam_flag(tmp_path, monkeypatch):
    """dashcam_augmentation=True threads jpeg params into the augmenters
    (reference datasets.py:546-552)."""
    from mft_tpu.train import datasets as D

    class Env:
        sintel_dir = flyingchairs_dir = flyingthings_dir = None
        kubric_dir = kitti_dir = hd1k_dir = None

    captured = {}
    orig = D.FlyingChairs.__init__

    def spy(self, aug_params=None, **kw):
        captured.update(aug_params or {})
        self.augmentor = None
        self.flow_list, self.image_list = [], []
        self.sparse = False
        self.load_occlusion = False

    monkeypatch.setattr(D.FlyingChairs, "__init__", spy)
    D.fetch_dataset("chairs", (368, 496), env=Env(), dashcam_augmentation=True)
    assert captured.get("do_jpeg_transform") is True
    assert captured.get("jpeg_prop") == 0.5


def test_fetch_dataset_no_kubric_stage(monkeypatch):
    """First-stage recipe 'sintel_things_train_subsplit' (reference
    datasets.py:572-577): 200x sintel_clean + 200x sintel_final +
    things_final, shared -0.4..0.8 scale, no kubric."""
    from mft_tpu.train import datasets as D

    class Env:
        sintel_dir = flyingthings_dir = kubric_dir = None

    made = []

    def spy_factory(name):
        def spy(self, aug_params=None, **kw):
            made.append((name, dict(aug_params or {}), dict(kw)))
            self.augmentor = None
            self.flow_list, self.image_list = [], []
            self.sparse = False
            self.load_occlusion = False
        return spy

    monkeypatch.setattr(D.MpiSintel, "__init__", spy_factory("sintel"))
    monkeypatch.setattr(D.FlyingThings3D, "__init__", spy_factory("things"))
    kubric_made = []
    monkeypatch.setattr(D.KubricLongTerm, "__init__",
                        spy_factory("kubric"))
    mixed = D.fetch_dataset("sintel_things_train_subsplit", (368, 768),
                            env=Env())
    names = [n for n, _, _ in made]
    assert names == ["sintel", "sintel", "things"]
    assert not kubric_made
    assert list(mixed.weights) == [200, 200, 1]
    for _, aug_params, _ in made:
        assert aug_params["min_scale"] == -0.4
        assert aug_params["max_scale"] == 0.8
    for _, _, kw in made[:2]:
        assert kw.get("subsplit") == "train"


def test_train_logger(tmp_path, rng):
    """Scalars jsonl + panel PNGs (reference Logger, train.py:262-346)."""
    import json
    from mft_tpu.train.logger import TrainLogger, SUM_FREQ, render_panel

    tlog = TrainLogger(tmp_path / "run", use_tensorboard=False)
    for i in range(SUM_FREQ):
        tlog.push({"train/loss": float(i)}, lr=1e-4)
    lines = (tmp_path / "run" / "scalars.jsonl").read_text().splitlines()
    rec = json.loads(lines[-1])
    assert rec["step"] == SUM_FREQ
    assert rec["train/loss"] == pytest.approx(np.mean(np.arange(SUM_FREQ)))
    assert rec["lr"] == pytest.approx(1e-4)

    # validation scalars
    tlog.write_dict({"val/sintel/epe": 1.5})
    rec = json.loads((tmp_path / "run" / "scalars.jsonl")
                     .read_text().splitlines()[-1])
    assert rec["val/sintel/epe"] == 1.5

    # panel rendering dispatch
    flow_img = render_panel("flow_est", rng.standard_normal((8, 8, 2)))
    assert flow_img.shape == (8, 8, 3) and flow_img.dtype == np.uint8
    occl_img = render_panel("occl_est_pos", np.full((8, 8, 1), 300.0))
    assert occl_img.max() == 255  # clamped

    # full prediction panel set
    B, H, W = 1, 16, 24
    batch = (rng.integers(0, 255, (B, H, W, 3)).astype(np.float32),
             rng.integers(0, 255, (B, H, W, 3)).astype(np.float32),
             rng.standard_normal((B, H, W, 2)).astype(np.float32),
             np.ones((B, H, W), np.float32),
             np.zeros((B, H, W, 1), np.float32))
    preds = {"flow": [rng.standard_normal((B, H, W, 2)).astype(np.float32)],
             "occlusion": [rng.standard_normal((B, H, W, 2)).astype(np.float32)],
             "uncertainty": [rng.standard_normal((B, H, W, 1)).astype(np.float32)]}
    tlog.write_prediction_panels(batch, preds)
    panel_dir = tmp_path / "run" / "panels" / f"step_{tlog.total_steps:06d}"
    names = {p.name for p in panel_dir.iterdir()}
    assert {"image1.png", "image2.png", "valid.png", "flow_gt.png",
            "occl_gt.png", "flow_est.png", "occl_est_neg.png",
            "occl_est_pos.png", "sigma_est.png", "sigma_est_minmax.png",
            "sigma2_est.png", "sigma2_est_minmax.png"} <= names
    tlog.close()
