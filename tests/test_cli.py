"""CLI integration: synth-data -> prepare-data -> train -> denoise -> eval
(the reference's public surface, SURVEY.md L8 / BASELINE.json:5)."""

import dataclasses
import json
from pathlib import Path

import numpy as np
import pytest

from deepdenoiser_tpu import cli, config as config_lib
from deepdenoiser_tpu.config import (
    DataConfig, ExperimentConfig, InferenceConfig, TrainConfig,
)
from deepdenoiser_tpu.models.factory import ModelConfig
from deepdenoiser_tpu.ops.losses import LossConfig


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("ws")
    cfg = ExperimentConfig(
        name="cli-test",
        model=ModelConfig(backbone="unet", base_width=8, depth=1,
                          convs_per_level=1),
        data=DataConfig(crop=32, crops_per_frame=4, batch_size=8,
                        validation_fraction=0.34, seed=1),
        train=TrainConfig(steps=6, warmup_steps=0, learning_rate=1e-3,
                          schedule="constant", log_every=2, eval_every=4,
                          checkpoint_every=3, loss=LossConfig(gradient_weight=0.0)),
        infer=InferenceConfig(tile=32, compute_dtype="float32"),
    )
    config_lib.save(cfg, ws / "config.json")
    assert cli.main(["synth-data", "--out", str(ws / "renders"), "--frames", "3",
                     "--size", "48", "--spp", "4", "--seed", "3"]) == 0
    return ws


def test_config_json_roundtrip(workspace):
    cfg = config_lib.load(workspace / "config.json")
    assert cfg.name == "cli-test"
    assert cfg.model.base_width == 8
    with pytest.raises(KeyError):
        config_lib.from_dict(ExperimentConfig, {"nonsense": 1})


def test_prepare_and_train_and_denoise(workspace):
    ws = workspace
    assert cli.main(["prepare-data", "--config", str(ws / "config.json"),
                     "--renders", str(ws / "renders"),
                     "--out", str(ws / "shards")]) == 0
    assert (ws / "shards" / "train" / "meta.json").exists()

    assert cli.main(["train", "--config", str(ws / "config.json"),
                     "--workdir", str(ws / "run"),
                     "--shards", str(ws / "shards")]) == 0
    ckpt_dir = ws / "run" / "checkpoints"
    assert any(ckpt_dir.iterdir())
    metrics_file = ws / "run" / "metrics_train.jsonl"
    lines = [json.loads(l) for l in metrics_file.read_text().splitlines()]
    assert lines and np.isfinite(lines[-1]["loss"])

    frame_dir = next((ws / "renders").glob("frame*/spp4_seed0"))
    assert cli.main(["denoise", "--config", str(ws / "config.json"),
                     "--checkpoint", str(ckpt_dir),
                     "--frame", str(frame_dir),
                     "--out", str(ws / "out.exr")]) == 0
    assert (ws / "out.exr").exists()
    from deepdenoiser_tpu.data import exr
    img = exr.read_exr(ws / "out.exr")
    assert img.shape == (48, 48, 3)
    assert np.isfinite(img).all()


def test_train_resume(workspace):
    """Re-running train with more steps resumes from the checkpoint."""
    ws = workspace
    assert cli.main(["train", "--config", str(ws / "config.json"),
                     "--workdir", str(ws / "run"),
                     "--shards", str(ws / "shards"),
                     "--steps", "8"]) == 0
    lines = [json.loads(l) for l in (ws / "run" / "metrics_train.jsonl").read_text().splitlines()]
    assert lines[-1]["step"] == 8


def test_denoise_passes_output(workspace):
    ws = workspace
    frame_dir = next((ws / "renders").glob("frame*/spp4_seed0"))
    assert cli.main(["denoise", "--config", str(ws / "config.json"),
                     "--checkpoint", str(ws / "run" / "checkpoints"),
                     "--frame", str(frame_dir),
                     "--out", str(ws / "outdir"), "--passes"]) == 0
    from deepdenoiser_tpu.data import exr
    outs = exr.load_frame_dir(ws / "outdir", strict=False)
    assert "combined" in outs and "diffuse_direct" in outs


def test_eval_command(workspace):
    ws = workspace
    rc = cli.main(["eval", "--config", str(ws / "config.json"),
                   "--checkpoint", str(ws / "run" / "checkpoints"),
                   "--renders", str(ws / "renders")])
    assert rc == 0


def test_presets_channel_validation():
    """Every preset builds a channel-consistent model through loop's
    validator and has a computable halo."""
    import dataclasses as dc

    from deepdenoiser_tpu.data import loader as L
    from deepdenoiser_tpu.models import factory
    from deepdenoiser_tpu.training.loop import _validate_channels

    for name, cfg in config_lib.PRESETS.items():
        fixed = _validate_channels(cfg)
        assert fixed.model.in_channels == L.input_channels(fixed.data), name
        assert fixed.model.out_channels == L.output_channels(fixed.data), name
        assert factory.halo(fixed.model) > 0, name
        assert factory.spatial_multiple(fixed.model) >= 1, name


def test_weights_source_and_eval_ema(workspace, tmp_path):
    """Release-npz weights are loadable from both public front doors
    (VERDICT r2 item 6), eval defaults to EMA params, and a missing weight
    source fails cleanly."""
    import jax

    from deepdenoiser_tpu import weights_io
    from deepdenoiser_tpu.models import factory

    ws = workspace
    cfg = config_lib.load(ws / "config.json")
    params = factory.init_params(cfg.model, jax.random.PRNGKey(7), spatial=32)
    npz = tmp_path / "release_f16.npz"
    weights_io.save_release_params(npz, params)

    # round-trip: fp16 npz -> params pytree with identical structure
    loaded = weights_io.load_release_params(npz)
    assert jax.tree.structure(loaded) == jax.tree.structure(params)

    frame_dir = next((ws / "renders").glob("frame*/spp4_seed0"))
    assert cli.main(["denoise", "--config", str(ws / "config.json"),
                     "--weights", str(npz),
                     "--frame", str(frame_dir),
                     "--out", str(tmp_path / "out.exr")]) == 0
    assert (tmp_path / "out.exr").exists()

    assert cli.main(["eval", "--config", str(ws / "config.json"),
                     "--weights", str(npz),
                     "--renders", str(ws / "renders")]) == 0
    # --no-ema on a checkpoint workdir evaluates raw params
    assert cli.main(["eval", "--config", str(ws / "config.json"),
                     "--checkpoint", str(ws / "run" / "checkpoints"),
                     "--no-ema", "--renders", str(ws / "renders")]) == 0
    # neither --checkpoint nor --weights: clean argparse-level error
    assert cli.main(["eval", "--config", str(ws / "config.json"),
                     "--renders", str(ws / "renders")]) == 2
