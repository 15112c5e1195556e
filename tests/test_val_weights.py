"""Committed trained-weights gate, asserted on the real chip.

Runs ``tools/val_weights.py`` (the committed weights/raftou_synth.msgpack
vs deterministic random init on HELD-OUT synthetic pairs) and asserts its
margin gate: trained EPE < 0.5x random and occlusion accuracy > random
+ 10 points (measured round 5: EPE ratio 0.018, occ-acc +46.6 pts —
docs/TRAINING.md). Guards the artifact the accuracy docs stand on: a
corrupted/mismatched msgpack or a converter regression would fail here
long before the drift/parity artifacts are re-run.
"""

import os
import subprocess
import sys

import pytest

from tests.test_tpu_drift import _ambient_tpu

pytestmark = [pytest.mark.slow, pytest.mark.tpu]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not _ambient_tpu(), reason="no TPU in ambient env")
def test_committed_weights_beat_random_by_gate_margin():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = env.get("_AMBIENT_JAX_PLATFORMS", "axon")
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    # same env recipe as test_tpu_drift (which initializes the remote TPU
    # reliably); the tool also self-inserts the repo on sys.path
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "val_weights.py"),
         "--n", "8"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, (
        f"weights gate failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-2000:]}")
    assert "GATE: PASS" in proc.stdout
