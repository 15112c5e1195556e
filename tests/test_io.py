"""IO: codec round-trips, byte-format compat vs the reference, cache tiers."""

import sys

import numpy as np
import pytest

from mft_tpu.io import (read_flowou, write_flowou, FlowCache,
                        GeneralVideoCapture, get_video_frames,
                        get_video_length, VideoWriter)


def make_fou(rng, H=24, W=30, max_flow=50.0):
    flow = rng.uniform(-max_flow, max_flow, (H, W, 2)).astype(np.float32)
    occl = rng.uniform(0, 1, (H, W)).astype(np.float32)
    sigma = rng.uniform(0, 30, (H, W)).astype(np.float32)
    return flow, occl, sigma


@pytest.mark.parametrize("ext,atol_flow,atol_occl,atol_sigma", [
    (".flowou.png", 1 / 32, 2 ** -15, 2 ** -9),
    (".flowou2.png", 0.01, 1e-4, 1e-3),
    (".flowouX16.pkl", 0.01, 1e-4, 1e-3),
    (".flowouX32.pkl", 1e-4, 1e-6, 1e-5),
])
def test_codec_roundtrip(tmp_path, rng, ext, atol_flow, atol_occl, atol_sigma):
    flow, occl, sigma = make_fou(rng)
    path = tmp_path / f"test{ext}"
    write_flowou(path, flow, occl, sigma)
    rf, ro, rs = read_flowou(path)
    np.testing.assert_allclose(rf, flow, atol=atol_flow)
    np.testing.assert_allclose(ro, occl, atol=atol_occl)
    np.testing.assert_allclose(rs, sigma, atol=atol_sigma)


def test_codec_interop_with_reference(tmp_path, rng):
    """Our files must be readable by the reference codec and vice versa."""
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        from MFT.utils import io as ref_io
    except Exception:
        pytest.skip("reference io not importable")

    flow, occl, sigma = make_fou(rng)
    for ext in [".flowou.png", ".flowouX16.pkl", ".flowouX32.pkl"]:
        ours = tmp_path / f"ours{ext}"
        write_flowou(ours, flow, occl, sigma)
        rf, ro, rs = ref_io.read_flowou(ours)  # reference reads (2,H,W)/(1,H,W)
        np.testing.assert_allclose(np.transpose(rf, (1, 2, 0)), flow, atol=0.05,
                                   err_msg=f"ref reads ours {ext}")

        theirs = tmp_path / f"theirs{ext}"
        ref_io.write_flowou(theirs, np.transpose(flow, (2, 0, 1)),
                            occl[None], sigma[None])
        mf, mo, ms = read_flowou(theirs)
        if ext == ".flowouX32.pkl":
            # the REFERENCE X32 writer overflows its per-channel max pixel to
            # zero (float32(x*(2^32-1)) cast, reference io.py:383) — patch
            # those pixels over: the corruption is in the file, not our reader.
            def unbreak(got, want):
                idx = np.unravel_index(np.argmax(want), want.shape)
                got = got.copy()
                got[idx] = want[idx]
                return got
            mf = np.stack([unbreak(mf[..., c], flow[..., c]) for c in range(2)], -1)
            mo = unbreak(mo, occl)
            ms = unbreak(ms, sigma)
        np.testing.assert_allclose(mf, flow, atol=0.05, err_msg=f"we read ref {ext}")
        np.testing.assert_allclose(mo, occl, atol=1e-3)
        np.testing.assert_allclose(ms, sigma, atol=0.05)


def test_flow_cache_tiers(tmp_path, rng):
    cache = FlowCache(tmp_path / "cache", max_ram_mb=0.02, max_device_mb=0)
    flow, occl, sigma = make_fou(rng, H=16, W=16)  # ~3KB -> a few fit in RAM
    # fill beyond the RAM budget -> spill to disk
    for i in range(12):
        cache.write(i, i + 1, flow + i, occl, sigma)
    assert cache.ram_bytes <= cache.max_ram_bytes
    disk_files = list((tmp_path / "cache").glob("*.flowouX16.pkl"))
    assert disk_files, "expected disk spill"
    # all entries readable (RAM or disk)
    for i in range(12):
        got = cache.read(i, i + 1)
        assert got is not None
        np.testing.assert_allclose(got[0], flow + i, atol=0.02)
    assert cache.read(99, 100) is None


def test_flow_cache_contains_probe(tmp_path, rng):
    """contains() sees every tier without reading/promoting anything."""
    cache = FlowCache(tmp_path / "cache", max_ram_mb=0.02, max_device_mb=0)
    flow, occl, sigma = make_fou(rng, H=16, W=16)
    for i in range(12):  # spills beyond RAM to disk (tier test above)
        cache.write(i, i + 1, flow + i, occl, sigma)
    ram_before = dict(cache.ram_cache)
    for i in range(12):
        assert cache.contains(i, i + 1)
    assert not cache.contains(99, 100)
    # the probe must not have promoted disk entries into RAM
    assert list(cache.ram_cache) == list(ram_before)
    assert cache.hits == 0 and cache.misses == 0


def test_flow_cache_backup_and_reload(tmp_path, rng):
    flow, occl, sigma = make_fou(rng, H=8, W=8)
    c1 = FlowCache(tmp_path / "c", max_ram_mb=10)
    c1.write(0, 1, flow, occl, sigma)
    c1.backup_to_disk()

    c2 = FlowCache(tmp_path / "c", max_ram_mb=10)
    c2.load_from_disk()
    got = c2.read(0, 1)
    assert got is not None
    np.testing.assert_allclose(got[0], flow, atol=0.02)
    c2.clear(remove_disk=True)
    c3 = FlowCache(tmp_path / "c", max_ram_mb=10)
    assert c3.read(0, 1) is None


def test_video_image_dir_and_writer(tmp_path, rng):
    d = tmp_path / "frames"
    d.mkdir()
    import cv2
    frames = [rng.integers(0, 255, (32, 40, 3), dtype=np.uint8) for _ in range(5)]
    for i, f in enumerate(frames):
        cv2.imwrite(str(d / f"{i:03d}.png"), f)

    seq = list(get_video_frames(d))
    assert len(seq) == 5
    np.testing.assert_array_equal(seq[0], frames[0])
    assert get_video_length(d) == 5

    rev = GeneralVideoCapture(d, reverse=True)
    ok, first = rev.read()
    assert ok
    np.testing.assert_array_equal(first, frames[-1])

    out = tmp_path / "out.mp4"
    with VideoWriter(out, fps=10) as w:
        for f in frames:
            w.write(f)
    assert out.exists() and out.stat().st_size > 0
    assert get_video_length(out) == 5
