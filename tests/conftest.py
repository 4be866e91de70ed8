"""Test configuration: run JAX on a virtual 8-device CPU mesh with float64.

Accuracy validation against the reference golden trajectories needs float64;
multi-chip sharding tests need several devices. Both are CPU-side concerns —
the TPU path is exercised by bench.py / __graft_entry__.py on real hardware.
"""

import os

# force CPU for tests even if the session points JAX at a TPU platform
# (the environment may pre-import jax via sitecustomize, so set the config
# knob too — it works after import)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def sphere_h5():
    path = os.path.join(REFERENCE, "demos/sphere/hydroData/sphere.h5")
    if not os.path.exists(path):
        pytest.skip("sphere.h5 reference data not available")
    return path


@pytest.fixture(scope="session")
def reference_data_dir():
    d = os.path.join(REFERENCE, "tests/regression/reference_data")
    if not os.path.isdir(d):
        pytest.skip("reference regression data not available")
    return d
