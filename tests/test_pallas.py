"""Pallas kernel parity vs the pure-JAX reference paths (SURVEY.md §4.2:
interpret mode on CPU so CI needs no TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepdenoiser_tpu import transforms
from deepdenoiser_tpu.data import synthetic
from deepdenoiser_tpu.models import kpn
from deepdenoiser_tpu.ops import fused_ingest, kpn_pallas


@pytest.fixture(scope="module")
def noisy():
    clean = synthetic.generate_clean_passes(24, 40, seed=21)
    return synthetic.add_mc_noise(clean, spp=4, seed=2)


def test_fused_radiance_parity(noisy):
    d = jnp.asarray(noisy["diffuse_direct"])
    i = jnp.asarray(noisy["diffuse_indirect"])
    c = jnp.asarray(noisy["diffuse_color"])
    got_d, got_i = fused_ingest.encode_radiance(d, i, c, interpret=True)
    want_d = transforms.normalize("diffuse_direct", transforms.demodulate(d, c))
    want_i = transforms.normalize("diffuse_indirect", transforms.demodulate(i, c))
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i), atol=1e-6)


def test_fused_aux_parity(noisy):
    n = jnp.asarray(noisy["normal"]) * 1.5  # push outside [-1,1] to test clamp
    got = fused_ingest.encode_normal(n, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(transforms.normalize("normal", n)), atol=1e-7
    )
    dep, alp = fused_ingest.encode_depth_alpha(
        jnp.asarray(noisy["depth"]), jnp.asarray(noisy["alpha"]), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(dep),
        np.asarray(transforms.normalize("depth", jnp.asarray(noisy["depth"]))),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(alp),
        np.asarray(transforms.normalize("alpha", jnp.asarray(noisy["alpha"]))),
        atol=1e-7,
    )


def test_fused_group_encode_parity(noisy):
    d = {k: jnp.asarray(v) for k, v in noisy.items()}
    got = fused_ingest.encode_group_inputs_pallas(d, "glossy", interpret=True)
    want = transforms.encode_group_inputs(d, "glossy")
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.parametrize(
    "aux", [(), ("depth",), ("alpha",), ("normal", "depth"), ("normal", "depth", "alpha")]
)
def test_fused_group_encode_aux_subsets(noisy, aux):
    """The Pallas twin accepts every aux subset the pure-JAX encoder does
    (ADVICE r1: aux=('depth',) used to KeyError on the missing alpha)."""
    d = {k: jnp.asarray(v) for k, v in noisy.items() if k != "alpha" or "alpha" in aux}
    got = fused_ingest.encode_group_inputs_pallas(d, "diffuse", aux=aux, interpret=True)
    want = transforms.encode_group_inputs(d, "diffuse", aux=aux)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_fused_batched_parity(noisy):
    """NHWC batched input goes through the same flattened-view kernels."""
    d = jnp.stack([jnp.asarray(noisy["diffuse_direct"])] * 2)
    i = jnp.stack([jnp.asarray(noisy["diffuse_indirect"])] * 2)
    c = jnp.stack([jnp.asarray(noisy["diffuse_color"])] * 2)
    got_d, _ = fused_ingest.encode_radiance(d, i, c, interpret=True)
    want_d = transforms.normalize("diffuse_direct", transforms.demodulate(d, c))
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d), atol=1e-6)


@pytest.mark.parametrize("k", [3, 5])
def test_kpn_pallas_parity(k):
    rng = np.random.default_rng(0)
    n, h, w, c = 2, 20, 36, 3
    noisy = jnp.asarray(rng.random((n, h, w, c)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((n, h, w, k * k)).astype(np.float32))
    weights = jax.nn.softmax(logits, axis=-1)
    want = kpn.apply_per_pixel_kernels(noisy, weights, k)
    got = kpn_pallas.apply_per_pixel_kernels_pallas(noisy, weights, k, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("k", [3, 5])
def test_kpn_pallas_custom_vjp_gradcheck(k):
    """r4: the Pallas apply is differentiable (custom_vjp). Both grads must
    match jax.grad of the XLA shift-accumulate exactly (same math)."""
    rng = np.random.default_rng(2)
    n, h, w, c = 1, 12, 20, 3
    noisy = jnp.asarray(rng.random((n, h, w, c)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((n, h, w, k * k)).astype(np.float32))
    weights = jax.nn.softmax(logits, axis=-1)
    cot = jnp.asarray(rng.standard_normal((n, h, w, c)).astype(np.float32))

    def loss_xla(x, wt):
        return jnp.sum(kpn.apply_per_pixel_kernels(x, wt, k) * cot)

    def loss_pl(x, wt):
        return jnp.sum(
            kpn_pallas.apply_per_pixel_kernels_pallas(x, wt, k, True) * cot
        )

    gx_want, gw_want = jax.grad(loss_xla, argnums=(0, 1))(noisy, weights)
    gx_got, gw_got = jax.grad(loss_pl, argnums=(0, 1))(noisy, weights)
    np.testing.assert_allclose(np.asarray(gx_got), np.asarray(gx_want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_got), np.asarray(gw_want), atol=1e-5)


def test_kpn_pallas_delta_identity():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 16, 24, 3)).astype(np.float32))
    k = 3
    w = np.zeros((1, 16, 24, k * k), np.float32)
    w[..., k * k // 2] = 1.0
    got = kpn_pallas.apply_per_pixel_kernels_pallas(x, jnp.asarray(w), k, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=1e-6)
