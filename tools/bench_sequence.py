"""BASELINE config #5 as an actual ANIMATION SEQUENCE: N temporally
coherent 4K frames (on-device Fourier-family generator with phase drift,
synthetic_jax.generate_clean_passes(t=i*dt)), denoised frame by frame with
per-frame latency + PSNR/SSIM series (VERDICT r2 item 5/7 — all previous
4K numbers were single-frame chained benches).

    python tools/bench_sequence.py [--frames 8] [--height 2160 --width 3840]
        [--model flagship] [--weights weights/flagship_ema_f16.npz]

Frames are generated ON DEVICE per step (a 4K multi-pass set is ~1.5 GB —
materializing N of them would blow HBM and the host tunnel), and denoised
immediately. Timing methodology matches bench.py / inference.sequence:
  * headline per-frame ms: all N frames CHAINED device-side (frame i's
    input salted by frame i-1's psnr * 1e-30), ONE scalar fetch, minus the
    separately measured fetch cost, / N — median of --reps chain samples;
  * per-frame series: fetch-synced pass with the fetch cost subtracted
    (noisier; the chained number is authoritative).
Generation cost is EXCLUDED from the timed region by splitting gen and
denoise into separate jits and pre-forcing each frame before its timed
denoise — except in the chained pass, where gen must re-run inside the
chain; its cost is measured separately and subtracted.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--height", type=int, default=2160)
    p.add_argument("--width", type=int, default=3840)
    p.add_argument("--spp", type=float, default=4.0)
    p.add_argument("--dt", type=float, default=0.35)
    p.add_argument("--model", default="flagship")
    p.add_argument("--weights", default="weights/flagship_ema_f16.npz")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--border", type=int, default=32)
    args = p.parse_args()

    from deepdenoiser_tpu.utils import tpu_guard

    tpu_guard.guard_latency_tool("bench_sequence.py")
    from tools.pretrain_flagship import MODELS
    from deepdenoiser_tpu.config import InferenceConfig
    from deepdenoiser_tpu.data import synthetic_jax as sj
    from deepdenoiser_tpu.inference import pipeline
    from deepdenoiser_tpu.ops import metrics
    from deepdenoiser_tpu.weights_io import load_release_params

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    mcfg = MODELS[args.model]
    assert mcfg.out_channels == 24, "sequence bench drives the joint pipeline"
    params = jax.device_put(load_release_params(args.weights))
    H, W = args.height, args.width
    icfg = InferenceConfig(tile=0, border=args.border, compute_dtype="bfloat16")
    denoise, grid = pipeline.make_joint_frame_denoiser(mcfg, icfg, H, W)
    print(f"grid: {grid}", file=sys.stderr)

    scene_key = jax.random.PRNGKey(11)

    @jax.jit
    def gen(t, salt):
        clean = sj.generate_clean_passes(scene_key, H, W, t=t)
        # fresh MC noise per frame (keyed by t); the clean signal drifts
        # coherently because the scene key is fixed
        nk = jax.random.fold_in(scene_key, (t * 1000.0).astype(jnp.int32) + 7)
        noisy = sj.add_mc_noise(nk, clean, args.spp)
        noisy["diffuse_direct"] = noisy["diffuse_direct"] + salt
        return noisy, clean["combined"]

    @jax.jit
    def den(params, frame, gt):
        out = denoise(params, frame)["combined"]
        tm = metrics.tonemap_for_metrics
        pred, ref, base = tm(out)[None], tm(gt)[None], tm(frame["combined"])[None]
        return (metrics.psnr_per_image(pred, ref)[0],
                metrics.ssim(pred, ref)[0],
                metrics.psnr_per_image(base, ref)[0])

    ts = [i * args.dt for i in range(args.frames)]
    zero = jnp.zeros(())

    # compile + warm both programs with the exact timed signatures
    f0, gt0 = gen(jnp.asarray(ts[0]), zero)
    p0, s0, b0 = den(params, f0, gt0)
    _ = float(p0)
    t0 = time.perf_counter()
    _ = float(p0)
    fetch_ms = 1e3 * (time.perf_counter() - t0)

    # generation-only chain cost (subtracted from the full chain)
    def gen_chain():
        salt = p0 * 1e-30
        t0 = time.perf_counter()
        for t in ts:
            f, _ = gen(jnp.asarray(t), salt)
            salt = f["combined"][0, 0, 0] * 1e-30
        _ = float(salt)
        return 1e3 * (time.perf_counter() - t0) - fetch_ms

    gen_ms = min(gen_chain() for _ in range(max(args.reps, 2)))

    # full chain: gen -> denoise -> psnr feeds the next frame's salt
    def full_chain():
        salt = p0 * 1e-30
        t0 = time.perf_counter()
        for t in ts:
            f, gt = gen(jnp.asarray(t), salt)
            psnr, _, _ = den(params, f, gt)
            salt = psnr * 1e-30
        _ = float(salt)
        return 1e3 * (time.perf_counter() - t0) - fetch_ms

    chains = [full_chain() for _ in range(max(args.reps, 2))]
    per_frame_ms = (float(np.median(chains)) - gen_ms) / args.frames

    # per-frame series (fetch-synced; noisier)
    series = []
    for t in ts:
        f, gt = gen(jnp.asarray(t), zero)
        jax.block_until_ready(f["combined"])
        _ = float(f["combined"][0, 0, 0])  # force gen before timing
        t0 = time.perf_counter()
        psnr, ssim, base = den(params, f, gt)
        psnr = float(psnr)
        ms = max(1e3 * (time.perf_counter() - t0) - fetch_ms, 0.0)
        series.append({
            "t": round(t, 3), "latency_ms": round(ms, 1),
            "psnr": round(psnr, 2), "ssim": round(float(ssim), 4),
            "noisy_psnr": round(float(base), 2),
            "gain_db": round(psnr - float(base), 2),
        })
        print(f"frame t={t:5.2f}  {ms:7.1f} ms  psnr {psnr:6.2f}  "
              f"gain {psnr - float(base):+5.2f} dB  ssim {float(ssim):.4f}",
              flush=True)

    report = {
        "model": args.model,
        "resolution": f"{W}x{H}",
        "n_frames": args.frames,
        "spp": args.spp,
        "per_frame_ms_chained": round(per_frame_ms, 1),
        "fps": round(1e3 / per_frame_ms, 2),
        "gen_chain_ms_total": round(gen_ms, 1),
        "fetch_overhead_ms": round(fetch_ms, 1),
        "psnr_mean": round(float(np.mean([s["psnr"] for s in series])), 2),
        "ssim_mean": round(float(np.mean([s["ssim"] for s in series])), 4),
        "gain_db_mean": round(float(np.mean([s["gain_db"] for s in series])), 2),
        "frames": series,
    }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
