"""Holdout synthetic family (de-circularized quality eval — VERDICT r1):
contract parity with the training family, structural difference, and the
inference pipeline running end-to-end on it."""

import jax
import jax.numpy as jnp
import numpy as np

from deepdenoiser_tpu import passes, transforms
from deepdenoiser_tpu.config import InferenceConfig
from deepdenoiser_tpu.data import synthetic, synthetic_holdout
from deepdenoiser_tpu.inference import pipeline
from deepdenoiser_tpu.models import factory
from deepdenoiser_tpu.models.factory import ModelConfig


def test_holdout_recomposition_identity():
    clean = synthetic_holdout.generate_clean_passes(40, 56, seed=3)
    rec = synthetic.recompose_np(clean)
    np.testing.assert_allclose(rec, clean["combined"], rtol=1e-5, atol=1e-6)
    # noisy realizations stay recomposition-consistent too
    noisy = synthetic.add_mc_noise(clean, spp=4, seed=1)
    np.testing.assert_allclose(
        synthetic.recompose_np(noisy), noisy["combined"], rtol=1e-5, atol=1e-6
    )


def test_holdout_pass_contract():
    clean = synthetic_holdout.generate_clean_passes(32, 32, seed=7)
    assert set(clean) == set(passes.ALL_PASSES)
    for name, arr in clean.items():
        assert arr.shape == (32, 32, passes.channels(name)), name
        assert arr.dtype == np.float32, name
        assert np.isfinite(arr).all(), name
    np.testing.assert_allclose(
        np.linalg.norm(clean["normal"], axis=-1), 1.0, atol=1e-4
    )
    assert clean["depth"].min() > 0.0
    assert 0.0 <= clean["alpha"].min() and clean["alpha"].max() <= 1.0


def test_holdout_is_piecewise_constant_albedo():
    """Structural difference from the training family: albedo is flat
    almost everywhere with hard edges (training albedo is smooth fields
    with gradients nearly everywhere)."""
    hold = synthetic_holdout.generate_clean_passes(64, 64, seed=11)
    train = synthetic.generate_clean_passes(64, 64, seed=11)

    def grad_mag(a):
        return np.abs(np.diff(a, axis=0)).mean(-1)  # (h-1, w)

    g_hold = grad_mag(hold["diffuse_color"])
    g_train = grad_mag(train["diffuse_color"])
    # holdout: most pixels have ~zero albedo gradient (flat cells)
    assert (g_hold < 1e-6).mean() > 0.8
    # training family: smooth non-zero gradients almost everywhere
    assert (g_train < 1e-6).mean() < 0.2


def test_holdout_denoises_through_pipeline():
    clean = synthetic_holdout.generate_clean_passes(48, 64, seed=5)
    noisy = synthetic.add_mc_noise(clean, spp=4, seed=2)
    cfg = ModelConfig(
        in_channels=transforms.joint_input_channels(),
        out_channels=transforms.joint_output_channels(),
        base_width=8, depth=1, convs_per_level=1,
    )
    params = factory.init_params(cfg, jax.random.PRNGKey(0), spatial=32)
    denoise, _ = pipeline.make_joint_frame_denoiser(
        cfg, InferenceConfig(tile=0, compute_dtype="float32"), 48, 64
    )
    out = denoise(params, {k: jnp.asarray(v) for k, v in noisy.items()})
    assert out["combined"].shape == (48, 64, 3)
    assert np.isfinite(np.asarray(out["combined"])).all()


# --- round-3 spheres family (the new untouched holdout) ---------------------


def test_spheres_recomposition_identity():
    from deepdenoiser_tpu.data import synthetic_spheres

    clean = synthetic_spheres.generate_clean_passes(40, 56, seed=3)
    rec = synthetic.recompose_np(clean)
    np.testing.assert_allclose(rec, clean["combined"], rtol=1e-5, atol=1e-6)
    noisy = synthetic.add_mc_noise(clean, spp=4, seed=1)
    np.testing.assert_allclose(
        synthetic.recompose_np(noisy), noisy["combined"], rtol=1e-5, atol=1e-6
    )


def test_spheres_pass_contract():
    from deepdenoiser_tpu.data import synthetic_spheres

    clean = synthetic_spheres.generate_clean_passes(32, 48, seed=7)
    assert set(clean) == set(passes.ALL_PASSES)
    for name, arr in clean.items():
        assert arr.shape == (32, 48, passes.channels(name)), name
        assert arr.dtype == np.float32, name
        assert np.isfinite(arr).all(), name
    np.testing.assert_allclose(
        np.linalg.norm(clean["normal"], axis=-1), 1.0, atol=1e-4
    )
    assert clean["depth"].min() > 0.0
    assert 0.0 <= clean["alpha"].min() and clean["alpha"].max() <= 1.0


def test_spheres_structurally_distinct():
    """Curved geometry: the spheres family has smoothly varying normals on
    curved surfaces AND a sky region, unlike the Voronoi family's per-cell
    constant base normals; its albedo has hard checker edges."""
    from deepdenoiser_tpu.data import synthetic_spheres

    clean = synthetic_spheres.generate_clean_passes(64, 96, seed=5)
    # sky region exists (alpha 0) and geometry region exists
    assert 0.05 < clean["alpha"].mean() < 0.999
    # checkerboard albedo: a large flat fraction AND hard edges
    g = np.abs(np.diff(clean["diffuse_color"], axis=1)).mean(-1)
    assert (g < 1e-6).mean() > 0.5  # flat within checker squares
    assert (g > 0.05).mean() > 0.005  # hard edges present


def test_spheres_frame_set_contract():
    from deepdenoiser_tpu.data import synthetic_spheres

    clean, noisy = synthetic_spheres.generate_frame_set(
        24, 24, seed=1, spps=(4,), n_seeds=2
    )
    assert len(noisy) == 2
    for n in noisy:
        assert set(n) == set(clean)


# --- round-4 boxes family (the second untouched holdout) --------------------


def test_boxes_recomposition_identity():
    from deepdenoiser_tpu.data import synthetic_boxes

    clean = synthetic_boxes.generate_clean_passes(40, 56, seed=3)
    rec = synthetic.recompose_np(clean)
    np.testing.assert_allclose(rec, clean["combined"], rtol=1e-5, atol=1e-6)
    noisy = synthetic.add_mc_noise(clean, spp=4, seed=1)
    np.testing.assert_allclose(
        synthetic.recompose_np(noisy), noisy["combined"], rtol=1e-5, atol=1e-6
    )


def test_boxes_pass_contract():
    from deepdenoiser_tpu.data import synthetic_boxes

    clean = synthetic_boxes.generate_clean_passes(32, 48, seed=7)
    assert set(clean) == set(passes.ALL_PASSES)
    for name, arr in clean.items():
        assert arr.shape == (32, 48, passes.channels(name)), name
        assert arr.dtype == np.float32, name
        assert np.isfinite(arr).all(), name
    np.testing.assert_allclose(
        np.linalg.norm(clean["normal"], axis=-1), 1.0, atol=1e-4
    )
    assert clean["depth"].min() > 0.0
    assert 0.0 <= clean["alpha"].min() and clean["alpha"].max() <= 1.0


def test_boxes_structurally_distinct():
    """The boxes family differs from ALL prior families on two axes:
    piecewise-constant face normals (vs the spheres' smooth curvature) and
    area-light SOFT shadows — the direct pass has a wide band of fractional
    shadow levels, while the spheres family's hard shadows are binary."""
    from deepdenoiser_tpu.data import synthetic_boxes, synthetic_spheres

    clean = synthetic_boxes.generate_clean_passes(96, 128, seed=5)
    # flat-face normals: most geometry pixels have exactly-zero normal grad
    geo = clean["alpha"][..., 0] > 0
    gn = np.abs(np.diff(clean["normal"], axis=1)).sum(-1)
    flat = (gn[geo[:, 1:] & geo[:, :-1]] < 1e-6).mean()
    assert flat > 0.9, flat

    def penumbra_fraction(frame):
        """Fraction of lit-geometry pixels at fractional shadow levels:
        direct/(lambert-proxy) strictly inside (0.05, 0.95)."""
        d = frame["diffuse_direct"].sum(-1)
        geo = frame["alpha"][..., 0] > 0
        top = np.quantile(d[geo & (d > 0)], 0.99)
        r = d / max(top, 1e-6)
        sel = geo & (d > 0)
        return ((r > 0.05) & (r < 0.95))[sel].mean()

    # soft shadows produce a large intermediate-intensity population that
    # hard shadows + smooth lambert alone do not (compare at same seed)
    pb = penumbra_fraction(clean)
    assert pb > 0.2, pb


def test_boxes_frame_set_contract():
    from deepdenoiser_tpu.data import synthetic_boxes

    clean, noisy = synthetic_boxes.generate_frame_set(
        24, 24, seed=1, spps=(4,), n_seeds=2
    )
    assert len(noisy) == 2
    for n in noisy:
        assert set(n) == set(clean)
