"""Latency sweep for the 1080p multi-pass pipeline on the real TPU.

Usage: python tools/sweep_bench.py [quick]
Prints per-config per-frame latency (chained-scalar-fetch methodology, see
bench.py). Drives FLAGSHIP selection; not part of the driver contract.
"""

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


def measure(mcfg: ModelConfig, tile: int, frame) -> float:
    params = factory.init_params(mcfg, jax.random.PRNGKey(0), spatial=64)
    icfg = InferenceConfig(tile=tile, compute_dtype="bfloat16")
    denoise, grid = pipeline.make_group_frame_denoiser(mcfg, icfg, H, W)

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
        f"tile={tile:4d} halo={grid.halo:3d} net={grid.net_h}x{grid.net_w} "
        f"tiles={grid.n_tiles:3d} bw={mcfg.base_width:3d} d={mcfg.depth} "
        f"cpl={mcfg.convs_per_level} s2d={mcfg.stem_stride == 2} "
        f"-> {ms:7.2f} ms/frame", flush=True,
    )
    return ms


def main():
    cin = transforms.group_input_channels()
    base = dict(backbone="unet", in_channels=cin, out_channels=6,
                compute_dtype="bfloat16")
    clean = synthetic.generate_clean_passes(H, W, seed=0)
    noisy = synthetic.add_mc_noise(clean, spp=8, seed=1)
    frame = {k: jax.device_put(jnp.asarray(v)) for k, v in noisy.items()}

    configs = [
        # round 3: whole-frame s2d, cpl=1 family (97.8 ms at bw64/d3)
        (ModelConfig(**base, base_width=48, depth=3, convs_per_level=1, stem_stride=2), 0),
        (ModelConfig(**base, base_width=96, depth=3, convs_per_level=1, stem_stride=2), 0),
        (ModelConfig(**base, base_width=128, depth=3, convs_per_level=1, stem_stride=2), 0),
        (ModelConfig(**base, base_width=64, depth=4, convs_per_level=1, stem_stride=2), 0),
        (ModelConfig(**base, base_width=96, depth=4, convs_per_level=1, stem_stride=2), 0),
    ]
    for mcfg, tile in configs:
        try:
            measure(mcfg, tile, frame)
        except Exception as e:
            print(f"FAILED {mcfg.base_width}/{tile}: {type(e).__name__} {e}", flush=True)


if __name__ == "__main__":
    main()
