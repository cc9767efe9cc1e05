"""Headline benchmark: full multi-pass 1080p denoise, frames/sec/chip.

BASELINE.json:2 — "1080p frames/sec/chip full multi-pass denoise"; north
star < 100 ms/frame on one TPU v5e chip (BASELINE.json:5) => baseline
throughput 10 fps. vs_baseline = measured_fps / 10.

Measures the COMPLETE on-device pipeline (one jitted program): per-pass
normalization + albedo demodulation for all 4 light groups, batched tiled
CNN forward (bf16), inverse transforms, recomposition to final RGB.

Timing methodology for the axon-tunneled TPU (see MEMORY: tpu-env-facts):
`jax.block_until_ready` does not block and device->host transfers are slow
through the relay, so each timed sample chains K jitted calls (serialized
on the device stream, each consuming the previous output so no dead-code
elimination) and fetches ONE scalar; per-frame time = (t_K - t_1) / (K-1),
which cancels the ~30 ms fetch round-trip.

Prints exactly ONE JSON line to stdout.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 1080, 1920
BASELINE_FPS = 10.0  # <100 ms/frame north star
K_CHAIN = 8
N_SAMPLES = 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    from __graft_entry__ import FLAGSHIP
    from deepdenoiser_tpu.config import InferenceConfig
    from deepdenoiser_tpu.data import synthetic
    from deepdenoiser_tpu.inference import pipeline
    from deepdenoiser_tpu.models import factory
    from deepdenoiser_tpu.ops import metrics

    log(f"device: {jax.devices()[0]}")

    params = factory.init_params(FLAGSHIP, jax.random.PRNGKey(0), spatial=64)
    icfg = InferenceConfig(tile=256, compute_dtype="bfloat16")
    denoise, grid = pipeline.make_group_frame_denoiser(FLAGSHIP, icfg, H, W)
    log(f"grid: {grid} (net tile {grid.net_size}, {grid.n_tiles} tiles x 4 groups)")

    log("generating synthetic 1080p pass set...")
    clean = synthetic.generate_clean_passes(H, W, seed=0)
    noisy = synthetic.add_mc_noise(clean, spp=8, seed=1)
    frame = {k: jax.device_put(jnp.asarray(v)) for k, v in noisy.items()}
    clean_combined = jax.device_put(jnp.asarray(clean["combined"]))

    @jax.jit
    def run_once(params, frame, salt):
        # `salt` feeds the input so sequential calls can't be CSE'd/cached.
        f = dict(frame)
        f["diffuse_direct"] = f["diffuse_direct"] + salt
        out = denoise(params, f)
        return out["combined"].sum()

    @jax.jit
    def quality(params, frame, clean_combined):
        out = denoise(params, frame)
        return metrics.psnr(
            metrics.tonemap_for_metrics(out["combined"])[None, ..., :],
            metrics.tonemap_for_metrics(clean_combined)[None, ..., :],
        )

    def chain(k: int) -> float:
        t0 = time.perf_counter()
        s = jnp.zeros(())
        for i in range(k):
            s = run_once(params, frame, s * 1e-30)
        float(s)  # one scalar fetch forces the whole chain
        return time.perf_counter() - t0

    log("compiling + warmup...")
    chain(1)
    chain(1)

    per_frame = []
    for _ in range(N_SAMPLES):
        t1 = chain(1)
        tk = chain(K_CHAIN)
        per_frame.append((tk - t1) / (K_CHAIN - 1))
    ms = 1e3 * float(np.median(per_frame))
    fps = 1e3 / ms
    log(f"per-frame: {ms:.2f} ms  ({fps:.2f} fps)  samples={[f'{1e3*x:.1f}' for x in per_frame]}")

    psnr = float(quality(params, frame, clean_combined))
    log(f"tonemapped PSNR vs clean (untrained net): {psnr:.2f} dB")

    print(
        json.dumps(
            {
                "metric": "1080p_full_multipass_denoise_throughput",
                "value": round(fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
