"""prepare-data -> shards -> Grain loader -> on-device encoding -> train
step: the end-to-end data path (SURVEY.md §3.1/§3.2, BASELINE config #4's
pipeline half)."""

import numpy as np
import pytest

from deepdenoiser_tpu import passes, transforms
from deepdenoiser_tpu.config import DataConfig, TrainConfig
from deepdenoiser_tpu.data import augment, loader, prepare, shards
from deepdenoiser_tpu.models.factory import ModelConfig


@pytest.fixture(scope="module")
def render_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("renders")
    prepare.generate_synthetic_render_root(
        root, n_frames=3, height=48, width=48, spps=(4,), n_seeds=1, seed=5
    )
    return root


@pytest.fixture(scope="module")
def shard_dirs(render_root, tmp_path_factory):
    out = tmp_path_factory.mktemp("shards")
    cfg = DataConfig(crop=32, crops_per_frame=6, batch_size=4, validation_fraction=0.3)
    metas = prepare.prepare_dataset(render_root, out, cfg, examples_per_shard=8)
    return out, metas, cfg


def test_prepare_dataset_counts(shard_dirs):
    out, metas, cfg = shard_dirs
    total = metas["train"].n_examples + metas["validation"].n_examples
    assert total == 3 * 6 * 1  # frames x crops x variants
    assert metas["train"].crop == 32
    assert "diffuse_direct" in metas["train"].stats
    assert metas["train"].stats["diffuse_direct"]["std"] > 0


def test_shard_reader_roundtrip(shard_dirs):
    out, metas, cfg = shard_dirs
    reader = shards.ShardReader(out / "train")
    assert len(reader) == metas["train"].n_examples
    ex = reader[0]
    assert ex["source/combined"].shape == (32, 32, 3)
    assert ex["target/combined"].shape == (32, 32, 3)
    assert ex["source/depth"].shape == (32, 32, 1)
    # sources are noisier than targets
    assert not np.allclose(ex["source/combined"], ex["target/combined"])


def test_loader_batches_and_determinism(shard_dirs):
    out, metas, cfg = shard_dirs
    it1 = loader.make_iterator(str(out / "train"), cfg, training=True)
    it2 = loader.make_iterator(str(out / "train"), cfg, training=True)
    b1, b2 = next(it1), next(it2)
    assert b1["source/combined"].shape == (4, 32, 32, 3)
    np.testing.assert_array_equal(b1["source/combined"], b2["source/combined"])


def test_loader_host_sharding_disjoint(shard_dirs):
    out, metas, cfg = shard_dirs
    ds0 = loader.make_dataset(str(out / "train"), cfg, training=False,
                              host_count=2, host_index=0, drop_remainder=False)
    ds1 = loader.make_dataset(str(out / "train"), cfg, training=False,
                              host_count=2, host_index=1, drop_remainder=False)
    n0 = sum(b["source/combined"].shape[0] for b in ds0)
    n1 = sum(b["source/combined"].shape[0] for b in ds1)
    assert n0 + n1 == metas["train"].n_examples


def test_batch_encoder_group(shard_dirs):
    out, metas, cfg = shard_dirs
    it = loader.make_iterator(str(out / "train"), cfg, training=True)
    batch = next(it)
    enc = loader.make_batch_encoder(cfg)
    xy = enc({k: np.asarray(v) for k, v in batch.items()})
    assert xy["x"].shape == (4, 32, 32, loader.input_channels(cfg))
    assert xy["y"].shape == (4, 32, 32, 6)
    assert np.isfinite(np.asarray(xy["x"])).all()


def test_iterator_keeps_stored_dtypes(shard_dirs):
    """The host pipeline must NOT upcast: rows/batches keep the shard
    dtypes (f16 bounded passes, f32 radiance) and the on-device encoder
    does the f32 cast — the r5 host-throughput fix (ShardReader
    docstring; VERDICT r4 missing #3)."""
    out, metas, cfg = shard_dirs
    it = loader.make_iterator(str(out / "train"), cfg, training=True)
    batch = next(it)
    stored = {
        name: shards._disk_dtype(name)
        for name in ("diffuse_color", "diffuse_direct", "normal", "depth")
    }
    for pass_name, want in stored.items():
        got = batch[f"{shards.SOURCE_PREFIX}/{pass_name}"].dtype
        assert got == want, (pass_name, got, want)
    enc = loader.make_batch_encoder(cfg)
    xy = enc({k: np.asarray(v) for k, v in batch.items()})
    assert np.asarray(xy["x"]).dtype == np.float32
    assert np.asarray(xy["y"]).dtype == np.float32
    assert np.isfinite(np.asarray(xy["x"])).all()


def test_batch_encoder_rgb(shard_dirs):
    out, metas, _ = shard_dirs
    cfg = DataConfig(crop=32, batch_size=4, mode="rgb")
    it = loader.make_iterator(str(out / "train"), cfg, training=True)
    batch = next(it)
    enc = loader.make_batch_encoder(cfg)
    xy = enc({k: np.asarray(v) for k, v in batch.items()})
    assert xy["x"].shape == (4, 32, 32, loader.input_channels(cfg))
    assert xy["y"].shape == (4, 32, 32, 3)


def test_iterator_checkpoint_resume(shard_dirs):
    out, metas, cfg = shard_dirs
    it = loader.make_iterator(str(out / "train"), cfg, training=True)
    next(it)
    state = it.get_state()
    b_next = next(it)
    it2 = loader.make_iterator(str(out / "train"), cfg, training=True)
    it2.set_state(state)
    b_resume = next(it2)
    np.testing.assert_array_equal(b_next["source/combined"], b_resume["source/combined"])


def test_augment_normal_vectors_consistent():
    """D4 on normals keeps unit length and transforms vectors correctly."""
    rng = np.random.default_rng(0)
    n = rng.standard_normal((8, 8, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    for k in range(4):
        for flip in (False, True):
            out = augment.apply_d4(n, k, flip, is_normal=True)
            np.testing.assert_allclose(
                np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5
            )
            # z component is invariant under in-plane isometries
            spatial = augment.apply_d4(n, k, flip, is_normal=False)
            np.testing.assert_array_equal(out[..., 2], spatial[..., 2])


def test_augment_normal_geometry_consistent():
    """The vector fixup matches real geometry: normals derived from a height
    field, with the pinned y-up camera convention (passes.NORMAL_Y_UP),
    rotate/flip identically whether we (a) transform the normal map with
    apply_d4 or (b) transform the height field and re-derive the normals."""
    assert passes.NORMAL_Y_UP  # the convention this test certifies

    def normals_of(h: np.ndarray) -> np.ndarray:
        # world coords: x = +col, y = up = -row  =>  n ∝ (-dh/dx, -dh/dy, 1)
        dh_di, dh_dj = np.gradient(h)
        n = np.stack([-dh_dj, +dh_di, np.ones_like(h)], axis=-1)
        return (n / np.linalg.norm(n, axis=-1, keepdims=True)).astype(np.float32)

    rng = np.random.default_rng(7)
    # smooth random height field (cumulative sums of noise)
    h = np.cumsum(np.cumsum(rng.standard_normal((16, 16)), 0), 1) * 0.05
    for k in range(4):
        for flip in (False, True):
            got = augment.apply_d4(normals_of(h), k, flip, is_normal=True)
            h_t = augment.apply_d4(h[..., None], k, flip, is_normal=False)[..., 0]
            want = normals_of(h_t)
            # interior crop: np.gradient uses one-sided stencils at borders
            np.testing.assert_allclose(
                got[2:-2, 2:-2], want[2:-2, 2:-2], atol=1e-5
            )


def test_augment_rotation_roundtrip():
    rng = np.random.default_rng(1)
    ex = {"source/normal": rng.standard_normal((4, 4, 3)).astype(np.float32)}
    out = ex["source/normal"]
    for _ in range(4):
        out = augment.apply_d4(out, 1, False, is_normal=True)
    np.testing.assert_allclose(out, ex["source/normal"], atol=1e-6)


def test_feature_flags_end_to_end(tmp_path_factory, devices8):
    """SURVEY.md C3 wired end-to-end: a corpus mixing full-group scenes with
    scenes lacking subsurface+transmission prepares, loads, encodes (flag
    planes + loss mask), and trains data-parallel on 8 fake devices; garbage
    in a missing group's target channels changes nothing (masked loss)."""
    import jax
    import jax.numpy as jnp

    from deepdenoiser_tpu.data import exr, synthetic
    from deepdenoiser_tpu.parallel import mesh as M
    from deepdenoiser_tpu.training import train as T

    root = tmp_path_factory.mktemp("flagroot")
    clean_all, noisy_all = synthetic.generate_frame_set(
        24, 24, seed=1, spps=(4,), n_seeds=1
    )
    exr.save_frame_dir(root / "full0" / prepare.GT_DIR, clean_all)
    exr.save_frame_dir(root / "full0" / "spp4_seed0", noisy_all[0])
    g2 = ("diffuse", "glossy")
    clean2, noisy2 = synthetic.generate_frame_set(
        24, 24, seed=2, spps=(4,), n_seeds=1, groups=g2
    )
    exr.save_frame_dir(root / "partial0" / prepare.GT_DIR, clean2)
    exr.save_frame_dir(root / "partial0" / "spp4_seed0", noisy2[0])

    out = tmp_path_factory.mktemp("flagshards")
    dcfg = DataConfig(crop=16, crops_per_frame=4, batch_size=8, mode="joint",
                      use_flags=True, validation_fraction=0.0)
    metas = prepare.prepare_dataset(root, out, dcfg, examples_per_shard=8)
    assert metas["train"].flags_dim == len(passes.LIGHT_GROUPS)

    it = loader.make_iterator(str(out / "train"), dcfg, training=True)
    raw = {k: np.asarray(v) for k, v in next(it).items()}
    assert raw[shards.FLAGS_KEY].shape == (8, 4)
    assert raw[shards.FLAGS_KEY].min() == 0.0  # partial frames in the batch
    assert raw[shards.FLAGS_KEY].max() == 1.0

    encode = loader.make_batch_encoder(dcfg)
    batch = encode(raw)
    assert batch["x"].shape[-1] == loader.input_channels(dcfg)  # +4 flag planes
    assert batch["mask"].shape == (8, 1, 1, 24)

    mcfg = ModelConfig(
        in_channels=loader.input_channels(dcfg),
        out_channels=loader.output_channels(dcfg),
        base_width=8, depth=1, convs_per_level=1,
    )
    tcfg = TrainConfig(steps=10, warmup_steps=0)
    mesh = M.make_mesh(8)
    step = T.make_train_step(mcfg, tcfg, mesh)

    state1 = T.create_state(mcfg, tcfg, jax.random.PRNGKey(0), spatial=16)
    _, mets1 = step(state1, M.shard_batch(dict(batch), mesh))
    assert np.isfinite(float(mets1["loss"]))

    # corrupt ONLY the masked (missing-group) target channels
    y = np.asarray(batch["y"]).copy()
    mask = np.asarray(batch["mask"])[:, 0, 0, :]
    y += (1.0 - mask)[:, None, None, :] * 123.0
    batch2 = dict(batch)
    batch2["y"] = jnp.asarray(y)
    state2 = T.create_state(mcfg, tcfg, jax.random.PRNGKey(0), spatial=16)
    _, mets2 = step(state2, M.shard_batch(batch2, mesh))
    assert float(mets1["loss"]) == float(mets2["loss"])


def test_train_on_prepared_data(shard_dirs):
    """A few real train steps on prepared shards: loss finite & decreasing."""
    from deepdenoiser_tpu.training import train as T
    import jax

    out, metas, cfg = shard_dirs
    mcfg = ModelConfig(
        backbone="unet", in_channels=loader.input_channels(cfg),
        out_channels=6, base_width=8, depth=1, convs_per_level=1,
    )
    tcfg = TrainConfig(steps=50, warmup_steps=0, learning_rate=1e-2, schedule="constant")
    enc = jax.jit(loader.make_batch_encoder(cfg))
    state = T.create_state(mcfg, tcfg, jax.random.PRNGKey(0), spatial=32)
    step = T.make_train_step(mcfg, tcfg, None)
    it = loader.make_iterator(str(out / "train"), cfg, training=True)
    losses_seen = []
    for i in range(8):
        batch = enc(next(it))
        state, mets = step(state, batch)
        losses_seen.append(float(mets["loss"]))
    assert all(np.isfinite(losses_seen))
    assert losses_seen[-1] < losses_seen[0]


def test_stats_driven_normalization(shard_dirs):
    """SURVEY.md C7→C4: corpus statistics drive the depth normalization.
    derive_pass_scales reads meta.json stats; the encoder applies
    log1p(depth * scale); the inverse round-trips; and loop.fit freezes
    the derived scales into the saved config so inference matches."""
    import jax.numpy as jnp

    from deepdenoiser_tpu import config as config_lib, transforms

    out, metas, cfg = shard_dirs
    scales = loader.derive_pass_scales(metas["train"])
    sd = dict(scales)
    assert set(sd) == {"depth", transforms.RADIANCE_SCALE_KEY}
    want = 1.0 / metas["train"].stats["depth"]["mean"]
    assert abs(sd["depth"] - want) < 1e-9
    want_ex = 1.0 / metas["train"].stats["combined"]["mean"]
    assert abs(sd[transforms.RADIANCE_SCALE_KEY] - want_ex) < 1e-9

    # encoder applies the scale: last aux channel is depth
    dcfg = DataConfig(crop=32, batch_size=4, mode="joint",
                      pass_scales=scales)
    it = loader.make_iterator(str(out / "train"), dcfg, training=False)
    raw = {k: np.asarray(v) for k, v in next(it).items()}
    x_scaled = loader.make_batch_encoder(dcfg)(raw)["x"]
    x_plain = loader.make_batch_encoder(
        DataConfig(crop=32, batch_size=4, mode="joint"))(raw)["x"]
    depth_ch = 36 + 3  # 9*4 group channels + normal(3), then depth
    np.testing.assert_allclose(
        np.asarray(x_scaled[..., depth_ch]),
        np.asarray(np.log1p(raw["source/depth"][..., 0] * scales[0][1])),
        rtol=1e-6,
    )
    assert not np.allclose(np.asarray(x_scaled[..., depth_ch]),
                           np.asarray(x_plain[..., depth_ch]))

    # normalize/denormalize round-trip with a scale
    d = jnp.asarray(raw["source/depth"])
    rt = transforms.denormalize("depth", transforms.normalize("depth", d, 0.37), 0.37)
    np.testing.assert_allclose(np.asarray(rt), np.asarray(d), rtol=1e-5, atol=1e-6)

    # config JSON round-trip preserves the frozen scales
    ecfg = config_lib.ExperimentConfig(data=dcfg)
    rt_cfg = config_lib.from_dict(config_lib.ExperimentConfig,
                                  config_lib.to_dict(ecfg))
    assert rt_cfg.data.pass_scales == scales


def test_fit_freezes_stats_scales(shard_dirs, tmp_path):
    """loop.fit with stats_normalize derives the scales once and saves them
    in workdir/config.json (the contract that makes inference encode
    identically to training)."""
    import json

    from deepdenoiser_tpu import config as config_lib
    from deepdenoiser_tpu.training import loop

    out, metas, cfg = shard_dirs
    dcfg = DataConfig(crop=32, batch_size=4, mode="joint", stats_normalize=True)
    ecfg = config_lib.ExperimentConfig(
        name="stats-test",
        model=ModelConfig(base_width=8, depth=1, convs_per_level=1),
        data=dcfg,
        train=TrainConfig(steps=2, warmup_steps=0, log_every=1,
                          eval_every=100, checkpoint_every=100),
    )
    loop.fit(ecfg, tmp_path / "run", shard_dir=str(out), use_mesh=False)
    saved = json.loads((tmp_path / "run" / "config.json").read_text())
    ps = dict((k, v) for k, v in saved["data"]["pass_scales"])
    assert set(ps) == {"depth", "radiance"}
    assert abs(ps["depth"] - 1.0 / metas["train"].stats["depth"]["mean"]) < 1e-9


def test_batch_encoder_joint(shard_dirs):
    out, metas, _ = shard_dirs
    cfg = DataConfig(crop=32, batch_size=4, mode="joint")
    it = loader.make_iterator(str(out / "train"), cfg, training=True)
    batch = next(it)
    enc = loader.make_batch_encoder(cfg)
    xy = enc({k: np.asarray(v) for k, v in batch.items()})
    assert xy["x"].shape == (4, 32, 32, loader.input_channels(cfg))
    assert xy["y"].shape == (4, 32, 32, loader.output_channels(cfg))
    assert np.isfinite(np.asarray(xy["x"])).all()
