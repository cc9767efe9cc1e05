"""EXR round-trip + synthetic fixture sanity (SURVEY.md C5, N5)."""

import numpy as np
import pytest

from deepdenoiser_tpu import passes
from deepdenoiser_tpu.data import exr, synthetic


def test_synthetic_shapes_and_ranges():
    clean = synthetic.generate_clean_passes(32, 40, seed=1)
    assert set(clean) == set(passes.ALL_PASSES)
    for name, arr in clean.items():
        assert arr.shape == (32, 40, passes.channels(name)), name
        assert arr.dtype == np.float32
        assert np.isfinite(arr).all()
    assert clean["alpha"].min() >= 0 and clean["alpha"].max() <= 1
    assert np.abs(np.linalg.norm(clean["normal"], axis=-1) - 1).max() < 1e-3


def test_noise_decreases_with_spp():
    clean = synthetic.generate_clean_passes(64, 64, seed=2)
    err = {}
    for spp in (4, 64):
        noisy = synthetic.add_mc_noise(clean, spp=spp, seed=5)
        err[spp] = float(np.abs(noisy["combined"] - clean["combined"]).mean())
    assert err[64] < err[4] * 0.5
    assert err[4] > 1e-3  # there IS noise


def test_noisy_realizations_differ():
    clean = synthetic.generate_clean_passes(32, 32, seed=3)
    a = synthetic.add_mc_noise(clean, spp=8, seed=1)
    b = synthetic.add_mc_noise(clean, spp=8, seed=2)
    assert np.abs(a["diffuse_direct"] - b["diffuse_direct"]).max() > 1e-4


def test_exr_roundtrip(tmp_path):
    clean = synthetic.generate_clean_passes(24, 24, seed=4)
    exr.save_frame_dir(tmp_path / "frame", clean)
    loaded = exr.load_frame_dir(tmp_path / "frame")
    assert set(loaded) == set(clean)
    for name in clean:
        np.testing.assert_array_equal(loaded[name], clean[name])


def test_exr_cycles_names(tmp_path):
    clean = synthetic.generate_clean_passes(16, 16, seed=5)
    exr.save_frame_dir(tmp_path / "f", clean, cycles_names=True)
    assert (tmp_path / "f" / "DiffDir.exr").exists()
    loaded = exr.load_frame_dir(tmp_path / "f")
    np.testing.assert_array_equal(loaded["diffuse_direct"], clean["diffuse_direct"])


def test_exr_missing_pass_strict(tmp_path):
    clean = synthetic.generate_clean_passes(16, 16, seed=6)
    exr.save_frame_dir(tmp_path / "f", {"normal": clean["normal"]})
    with pytest.raises(FileNotFoundError):
        exr.load_frame_dir(tmp_path / "f", wanted=["normal", "depth"])
    ok = exr.load_frame_dir(tmp_path / "f", wanted=["normal", "depth"], strict=False)
    assert set(ok) == {"normal"}


def test_frame_set_generator():
    clean, noisy = synthetic.generate_frame_set(16, 16, seed=0, spps=(4, 16), n_seeds=2)
    assert len(noisy) == 4
    for n in noisy:
        assert set(n) == set(clean)


def test_synthetic_jax_consistency():
    """On-device generator: recomposition identity + batch encode shapes."""
    import jax
    import jax.numpy as jnp

    from deepdenoiser_tpu import transforms
    from deepdenoiser_tpu.data import synthetic_jax as sj

    clean = sj.generate_clean_passes(jax.random.PRNGKey(0), 24, 32)
    assert set(clean) == set(passes.ALL_PASSES)
    rec = transforms.recompose({k: v for k, v in clean.items() if k != "combined"})
    assert float(jnp.abs(rec - clean["combined"]).max()) < 1e-5
    noisy = sj.add_mc_noise(jax.random.PRNGKey(1), clean, 4.0)
    assert float(jnp.abs(noisy["combined"] - clean["combined"]).mean()) > 1e-3
    for mode, cout in (("joint", 24), ("group", 6), ("rgb", 3)):
        b = sj.training_batch(jax.random.PRNGKey(2), 2, 16, mode)
        assert b["y"].shape[-1] == cout, mode
        assert bool(jnp.isfinite(b["x"]).all())


def test_synthetic_jax_voronoi_and_mixed():
    """Round-3 training corpus: on-device Voronoi family + scene
    randomization keep the recomposition identity; mixed batches are
    finite, deterministic in key, and family-diverse."""
    import jax
    import jax.numpy as jnp

    from deepdenoiser_tpu import transforms
    from deepdenoiser_tpu.data import synthetic_jax as sj

    clean = sj.generate_voronoi_passes(jax.random.PRNGKey(0), 24, 32)
    assert set(clean) == set(passes.ALL_PASSES)
    rec = transforms.recompose({k: v for k, v in clean.items() if k != "combined"})
    assert float(jnp.abs(rec - clean["combined"]).max()) < 1e-5

    rand = sj.randomize_scene(jax.random.PRNGKey(5), clean)
    rec2 = transforms.recompose({k: v for k, v in rand.items() if k != "combined"})
    assert float(jnp.abs(rec2 - rand["combined"]).max()) < 1e-4
    # exposure/depth scaling actually applied
    assert not bool(jnp.allclose(rand["depth"], clean["depth"]))
    assert not bool(jnp.allclose(rand["combined"], clean["combined"]))

    b1 = sj.training_batch(jax.random.PRNGKey(2), 4, 16, "joint", "mixed")
    b2 = sj.training_batch(jax.random.PRNGKey(2), 4, 16, "joint", "mixed")
    assert b1["x"].shape == (4, 16, 16, 41) and b1["y"].shape == (4, 16, 16, 24)
    assert bool(jnp.isfinite(b1["x"]).all()) and bool(jnp.isfinite(b1["y"]).all())
    assert bool((b1["x"] == b2["x"]).all())  # deterministic in key
    bv = sj.training_batch(jax.random.PRNGKey(2), 2, 16, "joint", "voronoi")
    assert bool(jnp.isfinite(bv["x"]).all())
