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
