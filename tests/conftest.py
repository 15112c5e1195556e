"""Test configuration: force an 8-virtual-device CPU JAX platform.

Must set the env vars BEFORE jax is imported anywhere, so this conftest is the
first import in every test session. Multi-chip sharding logic is exercised on
the virtual CPU mesh; real-TPU execution is covered by bench.py / the driver.
"""

import os

# remember the ambient platform before forcing CPU (TPU-marked tests spawn
# subprocesses that restore it — see tests/test_tpu_drift.py)
os.environ.setdefault("_AMBIENT_JAX_PLATFORMS",
                      os.environ.get("JAX_PLATFORMS", ""))
os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env may say 'axon' (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# determinism + avoid accidental x64
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# the axon sitecustomize force-registers the TPU platform; override it
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
