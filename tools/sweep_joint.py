"""Joint-group-mode latency sweep (all 4 light groups in one network pass)."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from deepdenoiser_tpu import transforms
from deepdenoiser_tpu.config import InferenceConfig
from deepdenoiser_tpu.data import synthetic
from deepdenoiser_tpu.inference import pipeline
from deepdenoiser_tpu.models import factory
from deepdenoiser_tpu.models.factory import ModelConfig

H, W = 1080, 1920
K = 6


def measure(mcfg: ModelConfig, frame) -> float:
    params = factory.init_params(mcfg, jax.random.PRNGKey(0), spatial=64)
    icfg = InferenceConfig(tile=0, compute_dtype="bfloat16")
    denoise, grid = pipeline.make_joint_frame_denoiser(mcfg, icfg, H, W)

    @jax.jit
    def run_once(params, frame, salt):
        f = dict(frame)
        f["diffuse_direct"] = f["diffuse_direct"] + salt
        return denoise(params, f)["combined"].sum()

    def chain(k):
        t0 = time.perf_counter()
        s = jnp.zeros(())
        for _ in range(k):
            s = run_once(params, frame, s * 1e-30)
        float(s)
        return time.perf_counter() - t0

    chain(1)
    chain(1)
    samples = []
    for _ in range(3):
        t1 = chain(1)
        tk = chain(K)
        samples.append((tk - t1) / (K - 1))
    ms = 1e3 * float(np.median(samples))
    print(
        f"JOINT halo={grid.halo:3d} net={grid.net_h}x{grid.net_w} "
        f"bw={mcfg.base_width:3d} d={mcfg.depth} cpl={mcfg.convs_per_level} "
        f"s2d={mcfg.stem_stride == 2} -> {ms:7.2f} ms/frame", flush=True,
    )
    return ms


def main():
    cin = transforms.joint_input_channels()
    cout = transforms.joint_output_channels()
    base = dict(backbone="unet", in_channels=cin, out_channels=cout,
                compute_dtype="bfloat16")
    clean = synthetic.generate_clean_passes(H, W, seed=0)
    noisy = synthetic.add_mc_noise(clean, spp=8, seed=1)
    frame = {k: jax.device_put(jnp.asarray(v)) for k, v in noisy.items()}

    configs = [
        ModelConfig(**base, base_width=64, depth=3, convs_per_level=1, stem_stride=2),
        ModelConfig(**base, base_width=96, depth=3, convs_per_level=1, stem_stride=2),
        ModelConfig(**base, base_width=64, depth=3, convs_per_level=2, stem_stride=2),
        ModelConfig(**base, base_width=96, depth=3, convs_per_level=2, stem_stride=2),
        ModelConfig(**base, base_width=128, depth=3, convs_per_level=2, stem_stride=2),
    ]
    for mcfg in configs:
        try:
            measure(mcfg, frame)
        except Exception as e:
            print(f"FAILED bw{mcfg.base_width}: {type(e).__name__} {e}", flush=True)


if __name__ == "__main__":
    main()
