"""Test harness config: force the CPU backend with 8 virtual devices.

Multi-chip (mesh/pjit) logic is tested on emulated CPU devices per
SURVEY.md §4; the real-TPU path is exercised by bench.py and the driver's
compile checks.  Must run before jax initializes its backends.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# NOTE: JAX_PLATFORMS is not enough here — the axon TPU plugin still grabs
# the client; JAX_PLATFORM_NAME/jax_platforms config does the job.
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu"
    return devs


REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)
