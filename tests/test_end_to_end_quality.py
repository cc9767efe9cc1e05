"""The flagship end-to-end proof: a model trained from scratch on synthetic
shards IMPROVES a held-out frame's PSNR over the noisy input (the quality
half of BASELINE configs #3/#4 at CPU-test scale).

Measured headroom when written: denoised ~33 dB vs noisy ~25.6 dB after
400 steps; the test's +3 dB bar at 300 steps leaves margin for seed drift.
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepdenoiser_tpu.config import DataConfig, InferenceConfig, TrainConfig
from deepdenoiser_tpu.data import loader as loader_lib
from deepdenoiser_tpu.data import prepare, shards, synthetic
from deepdenoiser_tpu.inference import pipeline
from deepdenoiser_tpu.models.factory import ModelConfig
from deepdenoiser_tpu.ops import metrics
from deepdenoiser_tpu.ops.losses import LossConfig
from deepdenoiser_tpu.training import train as train_lib


def _build_shards(root: pathlib.Path, dcfg: DataConfig) -> None:
    src_p = prepare.default_source_passes()
    tgt_p = prepare.default_target_passes()
    w = shards.ShardWriter(root, dcfg.crop, src_p, tgt_p, 256)
    rng = np.random.default_rng(0)
    for f in range(6):
        clean, noisies = synthetic.generate_frame_set(
            96, 96, seed=f, spps=(4,), n_seeds=1
        )
        for noisy in noisies:
            for _ in range(dcfg.crops_per_frame):
                y, x = rng.integers(0, 96 - dcfg.crop, 2)
                w.add(
                    {k: v[y : y + dcfg.crop, x : x + dcfg.crop] for k, v in noisy.items()},
                    {k: clean[k][y : y + dcfg.crop, x : x + dcfg.crop] for k in tgt_p},
                )
    w.finalize()


def test_training_beats_noisy_input(tmp_path):
    dcfg = DataConfig(crop=32, crops_per_frame=24, batch_size=16, mode="rgb", seed=0)
    _build_shards(tmp_path / "train", dcfg)

    mcfg = ModelConfig(
        backbone="unet", in_channels=loader_lib.input_channels(dcfg), out_channels=3,
        base_width=16, depth=2, convs_per_level=1, act="relu",
    )
    tcfg = TrainConfig(
        steps=300, warmup_steps=20, learning_rate=3e-3, schedule="constant",
        loss=LossConfig(kind="l1", gradient_weight=0.2),
    )
    enc = jax.jit(loader_lib.make_batch_encoder(dcfg))
    state = train_lib.create_state(mcfg, tcfg, jax.random.PRNGKey(0), spatial=32)
    step = train_lib.make_train_step(mcfg, tcfg, None)
    it = loader_lib.make_iterator(str(tmp_path / "train"), dcfg, training=True)
    first = None
    for _ in range(300):
        state, mets = step(state, enc(next(it)))
        if first is None:
            first = float(mets["loss"])
    assert float(mets["loss"]) < 0.2 * first

    # held-out frame, whole-frame inference pipeline
    clean = synthetic.generate_clean_passes(96, 96, seed=999)
    noisy = synthetic.add_mc_noise(clean, spp=4, seed=5)
    den, _ = pipeline.make_rgb_frame_denoiser(
        mcfg, InferenceConfig(tile=0, compute_dtype="float32"), 96, 96
    )
    out = den(state.params, {k: jnp.asarray(v) for k, v in noisy.items()})["combined"]

    tm = metrics.tonemap_for_metrics
    ref = tm(jnp.asarray(clean["combined"]))[None]
    p_noisy = float(metrics.psnr(tm(jnp.asarray(noisy["combined"]))[None], ref))
    p_den = float(metrics.psnr(tm(out)[None], ref))
    assert p_den > p_noisy + 3.0, (p_noisy, p_den)
