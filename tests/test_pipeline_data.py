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


def test_augment_rotation_roundtrip():
    rng = np.random.default_rng(1)
    ex = {"source/normal": rng.standard_normal((4, 4, 3)).astype(np.float32)}
    out = ex["source/normal"]
    for _ in range(4):
        out = augment.apply_d4(out, 1, False, is_normal=True)
    np.testing.assert_allclose(out, ex["source/normal"], atol=1e-6)


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
