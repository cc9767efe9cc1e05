"""Sequence harness tests (BASELINE config #5 semantics at CPU scale)."""

import jax
import numpy as np
import pytest

from deepdenoiser_tpu import transforms
from deepdenoiser_tpu.config import InferenceConfig
from deepdenoiser_tpu.data import prepare, synthetic
from deepdenoiser_tpu.inference import sequence
from deepdenoiser_tpu.models import factory
from deepdenoiser_tpu.models.factory import ModelConfig


def test_run_sequence_reports(tmp_path):
    cfg = ModelConfig(backbone="unet", in_channels=transforms.joint_input_channels(),
                      out_channels=transforms.joint_output_channels(),
                      base_width=4, depth=1, convs_per_level=1,
                      predict_residual=True)
    params = factory.init_params(cfg, jax.random.PRNGKey(0), spatial=32)
    clean = synthetic.generate_clean_passes(40, 48, seed=50)
    frames = [synthetic.add_mc_noise(clean, spp=4, seed=i) for i in range(3)]
    gts = [clean["combined"]] * 3
    report = sequence.run_sequence(
        cfg, InferenceConfig(tile=0, compute_dtype="float32"), params,
        frames, gts, mode="joint",
    )
    assert report["n_frames"] == 3
    assert len(report["latency_ms"]) == 3
    assert len(report["psnr"]) == 3
    assert all(np.isfinite(report["psnr"]))
    assert 0 < report["ssim_mean"] <= 1
    # residual-anchored untrained net stays in the ballpark of the noisy
    # input rather than collapsing (sanity on the anchoring)
    assert report["psnr_mean"] > 15


def test_evaluate_render_root(tmp_path):
    prepare.generate_synthetic_render_root(
        tmp_path, n_frames=2, height=40, width=40, spps=(4,), n_seeds=1, seed=9
    )
    cfg = ModelConfig(backbone="unet", in_channels=transforms.group_input_channels(),
                      out_channels=6, base_width=4, depth=1, convs_per_level=1)
    params = factory.init_params(cfg, jax.random.PRNGKey(0), spatial=32)
    report = sequence.evaluate_render_root(
        cfg, InferenceConfig(tile=0, compute_dtype="float32"), params,
        tmp_path, mode="group",
    )
    assert report["n_frames"] == 2
    assert np.isfinite(report["psnr_mean"])
