"""Spatial (band-parallel) sharding with ppermute halo exchange equals the
single-device whole-frame run exactly — BASELINE config #2's multi-chip
analogue on 8 fake CPU devices (SURVEY.md §4.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepdenoiser_tpu.inference import tiled
from deepdenoiser_tpu.models import factory
from deepdenoiser_tpu.models.factory import ModelConfig
from deepdenoiser_tpu.parallel import halo as halo_lib
from deepdenoiser_tpu.parallel import mesh as mesh_lib

CIN = 5


def tiny_cfg():
    return ModelConfig(backbone="unet", in_channels=CIN, out_channels=3,
                       base_width=4, depth=1, convs_per_level=1, act="elu")


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_spatial_shard_equals_whole(devices8, n_shards):
    cfg = tiny_cfg()
    model = factory.build_model(cfg)
    h, w = 72, 40
    frame = jax.random.normal(jax.random.PRNGKey(0), (h, w, CIN))
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, CIN)))
    apply_fn = lambda t: model.apply(params, t)  # noqa: E731

    m = factory.spatial_multiple(cfg)
    hp = factory.halo(cfg)
    mesh = mesh_lib.make_mesh(n_shards, axis_name="spatial")
    f = halo_lib.make_spatial_apply(apply_fn, mesh, h, w, hp, m)
    got = f(frame)
    assert got.shape == (h, w, 3)

    grid, _ = halo_lib.plan_bands(h, w, n_shards, hp, m)
    want = tiled.whole_frame_reference(apply_fn, frame, grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_band_alignment():
    grid, b = halo_lib.plan_bands(100, 60, 4, halo=7, multiple=4)
    assert b % 4 == 0 and 4 * b >= 100
    assert grid.halo % 4 == 0 and grid.halo >= 7


def test_spatial_group_pipeline_matches_tiled(devices8):
    """The full multi-pass pipeline gives identical results band-parallel
    over 4 chips vs single-device tiled (BASELINE configs #2+#3 fused)."""
    import jax.numpy as jnp
    from deepdenoiser_tpu import transforms
    from deepdenoiser_tpu.config import InferenceConfig
    from deepdenoiser_tpu.data import synthetic
    from deepdenoiser_tpu.inference import pipeline

    clean = synthetic.generate_clean_passes(48, 40, seed=33)
    noisy = synthetic.add_mc_noise(clean, spp=8, seed=3)
    d = {k: jnp.asarray(v) for k, v in noisy.items()}

    cfg = ModelConfig(backbone="unet", in_channels=transforms.group_input_channels(),
                      out_channels=6, base_width=4, depth=1, convs_per_level=1,
                      act="elu")
    params = factory.init_params(cfg, jax.random.PRNGKey(0), spatial=16)

    icfg1 = InferenceConfig(tile=0, compute_dtype="float32")
    den1, _ = pipeline.make_group_frame_denoiser(cfg, icfg1, 48, 40)
    out1 = den1(params, d)

    mesh = mesh_lib.make_mesh(4, axis_name="spatial")
    icfg2 = InferenceConfig(tile=0, compute_dtype="float32", spatial_shard=True)
    den2, _ = pipeline.make_group_frame_denoiser(cfg, icfg2, 48, 40, mesh=mesh)
    out2 = den2(params, d)

    for k in out1:
        np.testing.assert_allclose(
            np.asarray(out1[k]), np.asarray(out2[k]), atol=3e-5, err_msg=k
        )


def test_pallas_ingest_pipeline_matches_reference():
    """use_pallas_ingest swaps the encode path without changing results."""
    import jax.numpy as jnp
    from deepdenoiser_tpu import transforms
    from deepdenoiser_tpu.config import InferenceConfig
    from deepdenoiser_tpu.data import synthetic
    from deepdenoiser_tpu.inference import pipeline

    clean = synthetic.generate_clean_passes(32, 32, seed=34)
    noisy = synthetic.add_mc_noise(clean, spp=8, seed=4)
    d = {k: jnp.asarray(v) for k, v in noisy.items()}
    cfg = ModelConfig(backbone="unet", in_channels=transforms.group_input_channels(),
                      out_channels=6, base_width=4, depth=1, convs_per_level=1)
    params = factory.init_params(cfg, jax.random.PRNGKey(0), spatial=16)

    outs = []
    for flag in (False, True):
        icfg = InferenceConfig(tile=0, compute_dtype="float32",
                               use_pallas_ingest=flag)
        den, _ = pipeline.make_group_frame_denoiser(cfg, icfg, 32, 32)
        outs.append(den(params, d))
    for k in outs[0]:
        np.testing.assert_allclose(
            np.asarray(outs[0][k]), np.asarray(outs[1][k]), atol=1e-5, err_msg=k
        )


def test_plan_bands_rejects_halo_taller_than_band():
    """ppermute reaches only the immediate ring neighbor, so a halo taller
    than one band cannot be exchanged; plan_bands must fail loudly instead
    of silently truncating the strip."""
    with pytest.raises(ValueError, match="band height"):
        halo_lib.plan_bands(64, 48, 8, halo=131, multiple=16)
