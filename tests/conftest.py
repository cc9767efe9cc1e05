"""Test harness config: run everything on CPU with 8 fake devices.

This is the TPU-native analogue of a fake distributed backend (SURVEY.md §4.5):
8 host devices exercise the real psum/ppermute/all_gather collectives of the
data-parallel and halo-exchange paths deterministically, with no TPU attached.

NOTE: this environment's sitecustomize imports jax and registers the axon
TPU plugin before any user code, and exports JAX_PLATFORMS=axon — so env
vars set here are too late. jax.config.update still works because backends
are not *initialized* until first use, so we override through the config.
"""

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# fp32 matmuls on CPU for numerics tests (XLA CPU rounds via bf16 otherwise)
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 fake CPU devices, got {len(devs)}"
    return devs
