"""Tiled inference tests: tiled == whole-frame EXACT equality with certified
halos (BASELINE config #2's seam-free guarantee, SURVEY.md §4.4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepdenoiser_tpu import transforms
from deepdenoiser_tpu.config import InferenceConfig
from deepdenoiser_tpu.data import synthetic
from deepdenoiser_tpu.inference import pipeline, tiled
from deepdenoiser_tpu.models import factory
from deepdenoiser_tpu.models.factory import ModelConfig


CIN = 6


def tiny_cfg(**kw):
    d = dict(backbone="unet", in_channels=CIN, out_channels=4, base_width=4,
             depth=2, convs_per_level=1, act="elu")
    d.update(kw)
    return ModelConfig(**d)


@pytest.mark.parametrize("hw", [(40, 56), (96, 64)])
def test_tiled_equals_whole(hw):
    cfg = tiny_cfg()
    model = factory.build_model(cfg)
    h, w = hw
    frame = jax.random.normal(jax.random.PRNGKey(0), (h, w, CIN))
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, CIN)))

    m = factory.spatial_multiple(cfg)
    apply_fn = lambda t: model.apply(params, t)  # noqa: E731
    grid = tiled.plan_grid(h, w, tile=32, halo=factory.halo(cfg), multiple=m)
    got = tiled.make_tiled_apply(apply_fn, grid, cfg.out_channels)(frame)
    want = tiled.whole_frame_reference(apply_fn, frame, grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_tiled_batched_groups_equals_whole():
    cfg = tiny_cfg()
    model = factory.build_model(cfg)
    h, w = 48, 40
    frames = jax.random.normal(jax.random.PRNGKey(2), (3, h, w, CIN))
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, CIN)))
    m = factory.spatial_multiple(cfg)
    apply_fn = lambda t: model.apply(params, t)  # noqa: E731
    grid = tiled.plan_grid(h, w, tile=32, halo=factory.halo(cfg), multiple=m)
    f = tiled.make_tiled_apply(apply_fn, grid, cfg.out_channels, batch_dims=1)
    got = f(frames)
    for i in range(3):
        want = tiled.whole_frame_reference(apply_fn, frames[i], grid)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want), atol=2e-5)


def test_tile_chunking_matches_single_batch():
    cfg = tiny_cfg()
    model = factory.build_model(cfg)
    h, w = 96, 96
    frame = jax.random.normal(jax.random.PRNGKey(3), (h, w, CIN))
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, CIN)))
    m = factory.spatial_multiple(cfg)
    grid = tiled.plan_grid(h, w, tile=32, halo=factory.halo(cfg), multiple=m)
    f_all = tiled.make_tiled_apply(lambda t: model.apply(params, t), grid, cfg.out_channels)
    f_chunk = tiled.make_tiled_apply(
        lambda t: model.apply(params, t), grid, cfg.out_channels, tile_batch=4
    )
    np.testing.assert_allclose(
        np.asarray(f_all(frame)), np.asarray(f_chunk(frame)), atol=1e-6
    )


def test_plan_grid_alignment():
    cfg = tiny_cfg(n_scales=2)
    m = factory.spatial_multiple(cfg)
    g = tiled.plan_grid(1080, 1920, tile=250, halo=factory.halo(cfg), multiple=m)
    assert g.tile % m == 0 and g.halo % m == 0
    assert g.rows * g.tile >= 1080 and g.cols * g.tile >= 1920
    assert g.net_size == g.tile + 2 * g.halo


def test_extract_stitch_identity():
    """With halo=0 and identity network, extract+stitch is the identity."""
    frame = jax.random.normal(jax.random.PRNGKey(4), (50, 70, 3))
    grid = tiled.plan_grid(50, 70, tile=16, halo=0, multiple=1)
    f = tiled.make_tiled_apply(lambda t: t, grid, 3)
    np.testing.assert_allclose(np.asarray(f(frame)), np.asarray(frame), atol=0)


def test_feathered_stitch_partition_of_unity():
    """Identity network + feathered stitch reproduces the frame exactly
    (windows sum to 1 everywhere)."""
    frame = jax.random.normal(jax.random.PRNGKey(5), (40, 40, 2))
    grid = tiled.plan_grid(40, 40, tile=16, halo=4, multiple=1)
    tiles = tiled.extract_tiles(frame, grid)
    out = tiled.stitch_tiles_feathered(tiles, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(frame), atol=1e-5)


def test_multipass_pipeline_end_to_end():
    """Group pipeline runs and recomposes; identity-consistency checks."""
    clean = synthetic.generate_clean_passes(48, 64, seed=11)
    noisy = synthetic.add_mc_noise(clean, spp=16, seed=1)
    cfg = tiny_cfg(in_channels=transforms.group_input_channels(), out_channels=6)
    params = factory.init_params(cfg, jax.random.PRNGKey(0), spatial=32)
    icfg = InferenceConfig(tile=32, compute_dtype="float32")
    denoise, grid = pipeline.make_group_frame_denoiser(cfg, icfg, 48, 64)
    out = denoise(params, {k: jnp.asarray(v) for k, v in noisy.items()})
    assert out["combined"].shape == (48, 64, 3)
    assert np.isfinite(np.asarray(out["combined"])).all()
    # recomposition identity holds on the outputs
    rec = transforms.recompose({k: v for k, v in out.items() if k != "combined"})
    np.testing.assert_allclose(
        np.asarray(rec), np.asarray(out["combined"]), rtol=1e-5, atol=1e-5
    )
    # aux passthrough
    np.testing.assert_array_equal(np.asarray(out["alpha"]), noisy["alpha"])


def test_rgb_pipeline_and_crop_agree_interior():
    """Frame-level RGB pipeline == single-crop path away from borders.

    (Border semantics differ by design: the frame pipeline reflect-pads,
    the crop path keeps training-time SAME-conv borders.)"""
    clean = synthetic.generate_clean_passes(64, 64, seed=12)
    noisy = synthetic.add_mc_noise(clean, spp=8, seed=2)
    cfg = tiny_cfg(in_channels=transforms.rgb_input_channels(), out_channels=3)
    params = factory.init_params(cfg, jax.random.PRNGKey(0), spatial=32)
    icfg = InferenceConfig(tile=64, compute_dtype="float32")
    denoise, grid = pipeline.make_rgb_frame_denoiser(cfg, icfg, 64, 64)
    d = {k: jnp.asarray(v) for k, v in noisy.items()}
    out = denoise(params, d)["combined"]
    crop = pipeline.denoise_crop(cfg, params, d)
    b = factory.halo(cfg)
    np.testing.assert_allclose(
        np.asarray(out)[b:-b, b:-b], np.asarray(crop)[b:-b, b:-b], atol=2e-5
    )


def test_joint_pipeline_end_to_end():
    """Joint-group mode (all groups in one net pass): shapes, finiteness,
    recomposition identity, aux passthrough."""
    clean = synthetic.generate_clean_passes(48, 64, seed=13)
    noisy = synthetic.add_mc_noise(clean, spp=16, seed=3)
    cfg = tiny_cfg(in_channels=transforms.joint_input_channels(),
                   out_channels=transforms.joint_output_channels())
    params = factory.init_params(cfg, jax.random.PRNGKey(0), spatial=32)
    icfg = InferenceConfig(tile=0, compute_dtype="float32")
    denoise, _ = pipeline.make_joint_frame_denoiser(cfg, icfg, 48, 64)
    out = denoise(params, {k: jnp.asarray(v) for k, v in noisy.items()})
    assert out["combined"].shape == (48, 64, 3)
    assert out["glossy_indirect"].shape == (48, 64, 3)
    assert np.isfinite(np.asarray(out["combined"])).all()
    rec = transforms.recompose({k: v for k, v in out.items() if k != "combined"})
    np.testing.assert_allclose(
        np.asarray(rec), np.asarray(out["combined"]), rtol=1e-5, atol=1e-5
    )


def test_feathered_stitch_reachable_via_config():
    """InferenceConfig.stitch='feather' (BASELINE config #2 'overlap
    blending') runs through the pipeline. Feathering is inherently
    APPROXIMATE with disjoint-core grids: at every overlap position exactly
    one tile is RF-certified, so any non-step blend mixes in some
    uncertified values (the step function IS the exact stitch). Assert the
    blend stays close to the exact result."""
    clean = synthetic.generate_clean_passes(48, 64, seed=17)
    noisy = synthetic.add_mc_noise(clean, spp=16, seed=5)
    cfg = tiny_cfg(
        in_channels=transforms.joint_input_channels(),
        out_channels=transforms.joint_output_channels(),
    )
    params = factory.init_params(cfg, jax.random.PRNGKey(0), spatial=32)
    d = {k: jnp.asarray(v) for k, v in noisy.items()}
    den_feather, _ = pipeline.make_joint_frame_denoiser(
        cfg, InferenceConfig(tile=32, compute_dtype="float32",
                             stitch="feather"), 48, 64
    )
    den_exact, _ = pipeline.make_joint_frame_denoiser(
        cfg, InferenceConfig(tile=32, compute_dtype="float32"), 48, 64
    )
    a = np.asarray(den_feather(params, d)["combined"])
    b = np.asarray(den_exact(params, d)["combined"])
    diff = np.abs(a - b)
    assert diff.max() < 0.1, diff.max()      # HDR units; random-init net
    assert diff.mean() < 2e-3, diff.mean()


def test_border_override_whole_frame_only():
    """InferenceConfig.border shrinks the whole-frame reflect pad but is
    IGNORED for tiled and spatially-sharded plans, where the certified halo
    is a correctness requirement."""
    cfg = tiny_cfg(in_channels=8, out_channels=6)
    full = factory.halo(cfg)
    g0 = pipeline.plan_for(cfg, InferenceConfig(tile=0, border=0), 64, 64)
    assert g0.halo == 0 and g0.n_tiles == 1
    g_big = pipeline.plan_for(cfg, InferenceConfig(tile=0, border=1000), 64, 64)
    assert g_big.halo >= full  # border larger than the halo: canonical pad
    gt = pipeline.plan_for(cfg, InferenceConfig(tile=32, border=0), 64, 64)
    assert gt.halo >= full  # tiled: certified, border ignored
    gs = pipeline.plan_for(
        cfg, InferenceConfig(tile=0, border=0, spatial_shard=True), 64, 64
    )
    assert gs.halo >= full  # spatial bands: certified, border ignored

    # interior equality: small-border whole frame matches canonical away
    # from the border band
    params = factory.init_params(cfg, jax.random.PRNGKey(0), spatial=32)
    clean = synthetic.generate_clean_passes(64, 64, seed=21)
    noisy = synthetic.add_mc_noise(clean, spp=8, seed=3)
    d = {k: jnp.asarray(v) for k, v in noisy.items()}
    cfgj = tiny_cfg(
        in_channels=transforms.joint_input_channels(),
        out_channels=transforms.joint_output_channels(),
    )
    pj = factory.init_params(cfgj, jax.random.PRNGKey(0), spatial=32)
    den_canon, _ = pipeline.make_joint_frame_denoiser(
        cfgj, InferenceConfig(tile=0, compute_dtype="float32"), 64, 64
    )
    den_b8, _ = pipeline.make_joint_frame_denoiser(
        cfgj, InferenceConfig(tile=0, compute_dtype="float32", border=8), 64, 64
    )
    a = np.asarray(den_canon(pj, d)["combined"])
    b = np.asarray(den_b8(pj, d)["combined"])
    rf = factory.halo(cfgj)
    np.testing.assert_allclose(a[rf:-rf, rf:-rf], b[rf:-rf, rf:-rf],
                               rtol=1e-5, atol=1e-5)


def test_joint_pipeline_flags_missing_groups():
    """Flag-conditioned inference (SURVEY.md C3): a frame lacking
    subsurface+transmission denoises through the same joint network —
    missing passes zero-filled, flag planes appended, absent groups dropped
    from the recomposition."""
    g2 = ("diffuse", "glossy")
    clean = synthetic.generate_clean_passes(48, 64, seed=15, groups=g2)
    noisy = synthetic.add_mc_noise(clean, spp=16, seed=4, groups=g2)
    n_groups = len(transforms.LIGHT_GROUPS)
    cfg = tiny_cfg(
        in_channels=transforms.joint_input_channels() + n_groups,
        out_channels=transforms.joint_output_channels(),
    )
    params = factory.init_params(cfg, jax.random.PRNGKey(0), spatial=32)
    icfg = InferenceConfig(tile=0, compute_dtype="float32")
    denoise, _ = pipeline.make_joint_frame_denoiser(
        cfg, icfg, 48, 64, use_flags=True
    )
    out = denoise(params, {k: jnp.asarray(v) for k, v in noisy.items()})
    assert out["combined"].shape == (48, 64, 3)
    assert np.isfinite(np.asarray(out["combined"])).all()
    assert "subsurface_direct" not in out  # absent group not fabricated
    rec = transforms.recompose(
        {k: v for k, v in out.items() if k != "combined"}, groups=g2
    )
    np.testing.assert_allclose(
        np.asarray(rec), np.asarray(out["combined"]), rtol=1e-5, atol=1e-5
    )


def test_joint_encode_decode_identity():
    """decode_joint(encode_joint|identity-net) reproduces clean radiance."""
    clean = synthetic.generate_clean_passes(24, 24, seed=14)
    d = {k: jnp.asarray(v) for k, v in clean.items()}
    x = transforms.encode_joint_inputs(d)
    assert x.shape == (24, 24, transforms.joint_input_channels())
    # identity "network": pick the encoded direct/indirect channels per group
    slots = []
    for i in range(4):
        slots.append(x[..., 9 * i : 9 * i + 6])
    net_out = jnp.concatenate(slots, axis=-1)
    dec = transforms.decode_joint_outputs(net_out, d)
    np.testing.assert_allclose(
        np.asarray(dec["diffuse_direct"]), clean["diffuse_direct"],
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(dec["transmission_indirect"]), clean["transmission_indirect"],
        rtol=1e-3, atol=1e-4,
    )


@pytest.mark.parametrize("kw", [
    dict(stem_stride=2),                      # the flagship's stem
    dict(n_scales=2, depth=1),                # multi-scale composition
    dict(stem_stride=2, depth=1, n_scales=2), # both
    dict(backbone="tiramisu", depth=1, layers_per_block=2,
         growth_rate=4, stem_stride=2),       # tiramisu + s2d stem (r2)
])
def test_tiled_equals_whole_advanced_archs(kw):
    """Seam-free exactness holds for the architectures that shift RF
    accounting: space-to-depth stems and multi-scale pyramids."""
    cfg = tiny_cfg(**kw)
    model = factory.build_model(cfg)
    h, w = 72, 56
    frame = jax.random.normal(jax.random.PRNGKey(7), (h, w, CIN))
    m = factory.spatial_multiple(cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 4 * m, 4 * m, CIN)))
    apply_fn = lambda t: model.apply(params, t)  # noqa: E731
    grid = tiled.plan_grid(h, w, tile=32, halo=factory.halo(cfg), multiple=m)
    got = tiled.make_tiled_apply(apply_fn, grid, cfg.out_channels)(frame)
    want = tiled.whole_frame_reference(apply_fn, frame, grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
