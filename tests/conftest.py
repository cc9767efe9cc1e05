"""Test harness config: run everything on CPU with 8 fake devices.

This is the TPU-native analogue of a fake distributed backend (SURVEY.md §4.5):
8 host devices exercise the real psum/ppermute/all_gather collectives of the
data-parallel and halo-exchange paths deterministically, with no TPU attached.
Must run before anything imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# fp32 matmuls on CPU for numerics tests
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 fake CPU devices, got {len(devs)}"
    return devs
