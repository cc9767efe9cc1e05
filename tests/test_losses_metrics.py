"""Loss library + PSNR/SSIM metric tests (SURVEY.md C15, N6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepdenoiser_tpu.ops import losses, metrics


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).random(shape).astype(np.float32))


# --- losses ---------------------------------------------------------------


@pytest.mark.parametrize("kind", ["l1", "l2", "smape", "huber"])
def test_difference_zero_at_equal(kind):
    x = _rand((2, 8, 8, 3))
    d = losses.difference(kind, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-7)
    d2 = losses.difference(kind, x + 0.5, x)
    assert float(d2.mean()) > 0


def test_smape_bounded():
    p = _rand((2, 8, 8, 3), 1) * 100
    t = _rand((2, 8, 8, 3), 2) * 100
    d = losses.difference("smape", p, t)
    assert float(d.max()) <= 1.0 + 1e-6


def test_gradient_loss_ignores_constant_offset():
    t = _rand((1, 8, 8, 3))
    g = losses.gradient_difference("l1", t + 0.7, t)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


def test_pass_loss_masking():
    cfg = losses.LossConfig(kind="l1", gradient_weight=0.0)
    p = _rand((4, 8, 8, 3), 3)
    t = jnp.zeros_like(p)
    mask = jnp.asarray([1.0, 1.0, 0.0, 0.0]).reshape(4, 1, 1, 1)
    full = losses.pass_loss(cfg, p, t)
    masked = losses.pass_loss(cfg, p, t, mask)
    want = float(jnp.abs(p[:2]).sum() / (2 * 8 * 8 * 3))
    np.testing.assert_allclose(float(masked), want, rtol=1e-5)
    assert abs(float(full) - want) > 1e-4  # mask actually changed the value


def test_multi_pass_loss_weights():
    cfg = losses.LossConfig(kind="l2", gradient_weight=0.0)
    p = {"a": _rand((1, 4, 4, 3), 4), "b": _rand((1, 4, 4, 3), 5)}
    t = {k: jnp.zeros_like(v) for k, v in p.items()}
    total, per = losses.multi_pass_loss(cfg, p, t, weights={"a": 2.0, "b": 0.5})
    np.testing.assert_allclose(
        float(total), 2.0 * float(per["a"]) + 0.5 * float(per["b"]), rtol=1e-6
    )


def test_ms_ssim_loss_term_runs():
    cfg = losses.LossConfig(kind="l1", gradient_weight=0.0, ms_ssim_weight=0.3,
                            ms_ssim_scales=2)
    p = _rand((1, 48, 48, 3), 6)
    t = _rand((1, 48, 48, 3), 7)
    v = losses.pass_loss(cfg, p, t)
    assert np.isfinite(float(v))


# --- metrics --------------------------------------------------------------


def test_psnr_known_value():
    x = jnp.zeros((1, 16, 16, 3))
    y = jnp.full((1, 16, 16, 3), 0.1)
    np.testing.assert_allclose(float(metrics.psnr(x, y)), 20.0, atol=1e-4)


def test_psnr_per_image_shape():
    x = _rand((3, 16, 16, 3), 8)
    v = metrics.psnr_per_image(x, x * 0.9)
    assert v.shape == (3,)


def test_ssim_identical_is_one():
    x = _rand((2, 32, 32, 3), 9)
    v = metrics.ssim(x, x)
    np.testing.assert_allclose(np.asarray(v), 1.0, atol=1e-5)


def test_ssim_decreases_with_noise():
    x = _rand((1, 32, 32, 3), 10)
    rng = np.random.default_rng(11)
    small = x + jnp.asarray(0.02 * rng.standard_normal(x.shape).astype(np.float32))
    big = x + jnp.asarray(0.2 * rng.standard_normal(x.shape).astype(np.float32))
    s_small = float(metrics.ssim(small, x)[0])
    s_big = float(metrics.ssim(big, x)[0])
    assert s_big < s_small < 1.0


def test_ssim_luminance_shift_penalized():
    x = _rand((1, 32, 32, 3), 12)
    v = float(metrics.ssim(x + 0.5, x)[0])
    assert v < 0.99


def test_ms_ssim_identical_close_to_one():
    x = _rand((1, 96, 96, 3), 13)
    v = float(metrics.ms_ssim(x, x, n_scales=3)[0])
    np.testing.assert_allclose(v, 1.0, atol=1e-4)


def test_tonemap_range():
    x = jnp.asarray([0.0, 1.0, 100.0, 1e6])
    y = metrics.tonemap_for_metrics(x)
    assert float(y.min()) >= 0.0 and float(y.max()) < 1.0
