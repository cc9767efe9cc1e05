"""BASELINE config #1 end-to-end: single 64x64 crop (noisy RGB + albedo +
normal + depth) CNN forward FROM A PRETRAINED CHECKPOINT, CPU-only — using
the shipped release weights (weights/rgb_small_ema_f16.npz, trained by
tools/pretrain_flagship.py --model rgb-small on a TPU and exported fp16).

Also asserts the shipped flagship weights load and structurally match.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _load(npz):
    import sys

    sys.path.insert(0, str(REPO))
    from tools.export_release_weights import load_release_params

    return load_release_params(npz)


@pytest.mark.skipif(
    not (REPO / "weights/rgb_small_ema_f16.npz").exists(),
    reason="release weights not present",
)
def test_config1_pretrained_crop_denoise():
    from tools.pretrain_flagship import RGB_SMALL
    from deepdenoiser_tpu.data import synthetic
    from deepdenoiser_tpu.inference import pipeline
    from deepdenoiser_tpu.ops import metrics

    params = _load(REPO / "weights/rgb_small_ema_f16.npz")
    clean = synthetic.generate_clean_passes(64, 64, seed=4242)
    noisy = synthetic.add_mc_noise(clean, spp=4, seed=7)
    d = {k: jnp.asarray(v) for k, v in noisy.items()}

    out = pipeline.denoise_crop(RGB_SMALL, params, d)
    assert out.shape == (64, 64, 3)

    tm = metrics.tonemap_for_metrics
    ref = tm(jnp.asarray(clean["combined"]))[None]
    p_noisy = float(metrics.psnr(tm(d["combined"])[None], ref))
    p_den = float(metrics.psnr(tm(out)[None], ref))
    # the shipped checkpoint must actually denoise
    assert p_den > p_noisy + 1.0, (p_noisy, p_den)


@pytest.mark.skipif(
    not (REPO / "weights/flagship_mc_ema_f16.npz").exists(),
    reason="release weights not present",
)
def test_flagship_mc_denoises_traced_monte_carlo():
    """The r5 headline ship: flagship-mc must substantially denoise a
    GENUINE Monte-Carlo estimate (data/mc_tracer.py — fireflies, penumbra
    variance), the regime where the Gaussian-trained incumbent measured
    only +2.77 dB (STATUS_R5 arbitration: flagship-mc +12.68 dB at 1080p).
    Small frame + reduced GT spp keep CPU cost test-sized; the floor is
    set far above the incumbent's small-crop behavior."""
    import sys

    sys.path.insert(0, str(REPO))
    from tools.pretrain_flagship import UNET_FULLRES
    from deepdenoiser_tpu.config import InferenceConfig
    from deepdenoiser_tpu.data import mc_tracer
    from deepdenoiser_tpu.inference import pipeline
    from deepdenoiser_tpu.ops import metrics

    H = W = 160
    clean = mc_tracer.generate_clean_passes(H, W, seed=31, spp=256)
    noisy = mc_tracer.generate_noisy_passes(H, W, seed=31, spp=4)
    params = _load(REPO / "weights/flagship_mc_ema_f16.npz")
    denoise, _ = pipeline.make_joint_frame_denoiser(
        UNET_FULLRES, InferenceConfig(tile=0, border=32), H, W
    )
    out = denoise(params, {k: jnp.asarray(v) for k, v in noisy.items()})
    tm = metrics.tonemap_for_metrics
    ref = tm(jnp.asarray(clean["combined"]))[None]
    p_noisy = float(metrics.psnr(tm(jnp.asarray(noisy["combined"]))[None], ref))
    p_den = float(metrics.psnr(tm(out["combined"])[None], ref))
    # traced-MC gain must be well beyond the Gaussian-trained incumbent's
    # +2.77 dB plateau
    assert p_den > p_noisy + 6.0, (p_noisy, p_den)


@pytest.mark.skipif(
    not (REPO / "weights/flagship_ema_f16.npz").exists(),
    reason="release weights not present",
)
def test_flagship_weights_structurally_valid():
    import sys

    sys.path.insert(0, str(REPO))
    from __graft_entry__ import FLAGSHIP
    from deepdenoiser_tpu.models import factory

    params = _load(REPO / "weights/flagship_ema_f16.npz")
    template = factory.init_params(FLAGSHIP, jax.random.PRNGKey(0), spatial=32)
    tshapes = {jax.tree_util.keystr(k): v.shape
               for k, v in jax.tree_util.tree_leaves_with_path(template)}
    pshapes = {jax.tree_util.keystr(k): v.shape
               for k, v in jax.tree_util.tree_leaves_with_path(params)}
    assert tshapes == pshapes
