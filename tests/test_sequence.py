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


def test_batch_frame_denoiser_dp(devices8):
    """Multi-chip frame-batch throughput mode: 8 frames sharded over an
    8-device 'data' mesh match the per-frame serial pipeline exactly."""
    import jax.numpy as jnp

    from deepdenoiser_tpu.inference import pipeline
    from deepdenoiser_tpu.parallel import mesh as M

    cfg = ModelConfig(backbone="unet", in_channels=transforms.joint_input_channels(),
                      out_channels=transforms.joint_output_channels(),
                      base_width=4, depth=1, convs_per_level=1)
    params = factory.init_params(cfg, jax.random.PRNGKey(0), spatial=32)
    icfg = InferenceConfig(tile=0, compute_dtype="float32")
    clean = synthetic.generate_clean_passes(32, 48, seed=60)
    frames = [synthetic.add_mc_noise(clean, spp=4, seed=i) for i in range(8)]
    batch = {
        k: jnp.stack([jnp.asarray(f[k]) for f in frames])
        for k in frames[0]
    }

    mesh = M.make_mesh(8)
    den_b, _ = sequence.make_batch_frame_denoiser(cfg, icfg, mesh, 32, 48)
    got = np.asarray(den_b(params, M.shard_batch(batch, mesh)))
    assert got.shape == (8, 32, 48, 3)

    den_1, _ = pipeline.make_joint_frame_denoiser(cfg, icfg, 32, 48)
    for i in range(8):
        want = np.asarray(
            den_1(params, {k: jnp.asarray(frames[i][k]) for k in frames[i]})["combined"]
        )
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5)
