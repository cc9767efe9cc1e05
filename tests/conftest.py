"""Test harness config: run everything on CPU with 8 fake devices.

This is the TPU-native analogue of a fake distributed backend (SURVEY.md §4.5):
8 host devices exercise the real psum/ppermute/all_gather collectives of the
data-parallel and halo-exchange paths deterministically, with no TPU attached.

NOTE: this environment's sitecustomize imports jax and registers the axon
TPU plugin before any user code, and exports JAX_PLATFORMS=axon — so env
vars set here are too late. jax.config.update still works because backends
are not *initialized* until first use, so we override through the config.

Exception: `DDTPU_TPU_TESTS=1` keeps the real TPU backend so the
@pytest.mark.tpu latency-budget suite (tests/test_tpu_budgets.py) can run
on the chip:  DDTPU_TPU_TESTS=1 python -m pytest tests -m tpu
Everything not marked tpu is deselected in that mode by default (the
budget suite asserts real-chip latencies; ordinary tests still want CPU).
"""

import os

import jax
import pytest

TPU_MODE = os.environ.get("DDTPU_TPU_TESTS") == "1"

if not TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    # fp32 matmuls on CPU for numerics tests (XLA CPU rounds via bf16 otherwise)
    jax.config.update("jax_default_matmul_precision", "highest")


def pytest_collection_modifyitems(config, items):
    if TPU_MODE:
        skip = pytest.mark.skip(reason="DDTPU_TPU_TESTS=1 runs only -m tpu tests")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(reason="TPU latency budgets need the real chip "
                                       "(DDTPU_TPU_TESTS=1)")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 fake CPU devices, got {len(devs)}"
    return devs
