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
from pathlib import Path

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
    import argparse

    ap = argparse.ArgumentParser()
    # Default 32: measured quality-identical to the certified-halo pad at
    # both 1080p and 4K (31.31 dB / +6.12 both ways at 1080p; 30.68/.6184
    # both ways at 4K) while cutting padded-plane work ~25% — 59.6 -> 44.0
    # ms/frame. See docs/STATUS_R2.md "the 4K story".
    ap.add_argument("--border", type=int, default=32,
                    help="whole-frame reflect border (-1 = certified halo)")
    # flagship-hq (stride-1 UNet) is the shipped quality headline:
    # ~59 ms / 17 fps at +13.0 dB (SSIM .927) — VERDICT r2 item 3's
    # stretch goal. `--model flagship` restores the s2d speed model
    # (~36 ms / 27.6 fps at +6.2 dB) for comparison.
    ap.add_argument("--model", default="flagship-hq",
                    help="zoo preset to bench (release weights from weights/)")
    args = ap.parse_args()

    from deepdenoiser_tpu.config import InferenceConfig
    from deepdenoiser_tpu.data import synthetic
    from deepdenoiser_tpu.inference import pipeline
    from deepdenoiser_tpu.models import factory
    from deepdenoiser_tpu.ops import metrics

    log(f"device: {jax.devices()[0]}")

    root = Path(__file__).parent
    sys.path.insert(0, str(root))
    from tools.eval_zoo import load_model_params

    try:
        # load_model_params does the device_put ONCE — host-side numpy
        # params would be re-uploaded through the tunnel on every jitted
        # call (measured: 2 s/frame).
        mcfg, params, mode = load_model_params(args.model)
        trained = f"release weights ({args.model})"
    except FileNotFoundError:
        from tools.pretrain_flagship import MODELS

        mcfg, mode = MODELS[args.model], "joint"
        params = factory.init_params(mcfg, jax.random.PRNGKey(0), spatial=64)
        trained = None
    assert mode == "joint", f"bench covers joint-mode presets, got {mode!r}"
    log(f"weights: {trained or 'random init'}")

    icfg = InferenceConfig(tile=0, compute_dtype="bfloat16",
                           border=args.border)  # whole-frame
    denoise, grid = pipeline.make_joint_frame_denoiser(mcfg, icfg, H, W)
    log(f"grid: {grid} (net {grid.net_h}x{grid.net_w}, joint 4-group single pass)")

    log("generating synthetic 1080p pass set...")
    clean = synthetic.generate_clean_passes(H, W, seed=0)
    noisy = synthetic.add_mc_noise(clean, spp=4, seed=1)  # low-spp: the use case
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
        ref = metrics.tonemap_for_metrics(clean_combined)[None]
        return (
            metrics.psnr(metrics.tonemap_for_metrics(out["combined"])[None], ref),
            metrics.psnr(metrics.tonemap_for_metrics(frame["combined"])[None], ref),
            metrics.ssim(metrics.tonemap_for_metrics(out["combined"])[None], ref)[0],
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

    p_den, p_noisy, ssim_den = (float(x) for x in quality(params, frame, clean_combined))
    log(
        f"tonemapped vs clean: denoised {p_den:.2f} dB (SSIM {ssim_den:.4f}) "
        f"| noisy input {p_noisy:.2f} dB | gain {p_den - p_noisy:+.2f} dB"
    )

    # quality on the UNTOUCHED holdout family too (spheres — never trained
    # on; VERDICT r2 item 1's reporting requirement)
    from deepdenoiser_tpu.data import synthetic_spheres

    h_clean = synthetic_spheres.generate_clean_passes(H, W, seed=0)
    h_noisy = synthetic.add_mc_noise(h_clean, spp=4, seed=1)
    h_frame = {k: jax.device_put(jnp.asarray(v)) for k, v in h_noisy.items()}
    hp_den, hp_noisy, h_ssim = (
        float(x) for x in quality(
            params, h_frame, jax.device_put(jnp.asarray(h_clean["combined"]))
        )
    )
    log(
        f"holdout (spheres): denoised {hp_den:.2f} dB (SSIM {h_ssim:.4f}) "
        f"| noisy input {hp_noisy:.2f} dB | gain {hp_den - hp_noisy:+.2f} dB"
    )

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
