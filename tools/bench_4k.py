"""BASELINE config #5: 4K animation-sequence batch denoise with per-frame
latency and PSNR/SSIM tracking.

    python tools/bench_4k.py [--frames 4] [--tile 0] [--spp 4]

Frames are synthesized ON DEVICE (data/synthetic_jax.py) — a 4K multi-pass
set is ~1.5 GB, far too large to feed through the tunneled host link — and
per-frame PSNR/SSIM are computed on device too; only scalars return.
Reported latency is denoise-only (generation excluded), forced by the
scalar fetch (~30 ms RTT included; see bench.py methodology).
tile=0 runs whole-frame; pass --tile 1088 to band-tile if HBM is tight.
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
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--height", type=int, default=2160)
    p.add_argument("--width", type=int, default=3840)
    p.add_argument("--tile", type=int, default=0)
    p.add_argument("--tile-batch", type=int, default=0,
                   help="chunk tiles through lax.map to bound HBM (banded mode)")
    p.add_argument("--halo", type=int, default=0,
                   help="override the certified halo (tiled modes)")
    p.add_argument("--border", type=int, default=32,
                   help="whole-frame reflect border; -1 = certified halo. "
                        "32 measures quality-identical at 4K (see "
                        "docs/STATUS_R2.md)")
    p.add_argument("--spp", type=float, default=4.0)
    p.add_argument("--model", default="flagship",
                   help="joint-mode zoo preset (release weights from weights/)")
    args = p.parse_args()

    from deepdenoiser_tpu.utils import tpu_guard

    tpu_guard.guard_latency_tool("bench_4k.py")
    from deepdenoiser_tpu.config import InferenceConfig
    from deepdenoiser_tpu.data import synthetic_jax as sj
    from deepdenoiser_tpu.inference import pipeline
    from deepdenoiser_tpu.ops import metrics
    from tools.eval_zoo import load_model_params

    H, W = args.height, args.width
    mcfg, params, mode = load_model_params(args.model)
    assert mode == "joint", "bench_4k drives the joint pipeline"
    print(f"model: {args.model} (release weights)", file=sys.stderr)

    icfg = InferenceConfig(tile=args.tile, tile_batch=args.tile_batch,
                           halo=args.halo, border=args.border,
                           compute_dtype="bfloat16")
    denoise, grid = pipeline.make_joint_frame_denoiser(mcfg, icfg, H, W)
    print(f"grid: {grid}", file=sys.stderr)

    @jax.jit
    def gen_clean(key):
        return sj.generate_clean_passes(key, H, W)

    @jax.jit
    def gen_noisy(key, clean):
        return sj.add_mc_noise(key, clean, args.spp)

    @jax.jit
    def den_only(params, noisy, salt):
        # denoise-ONLY latency (metrics excluded), chained-salt methodology
        # of bench.py: `salt` feeds the input so sequential calls can't be
        # CSE'd; one scalar fetch forces the whole chain.
        f = dict(noisy)
        f["diffuse_direct"] = f["diffuse_direct"] + salt
        return denoise(params, f)["combined"].sum()

    @jax.jit
    def quality(params, noisy, gt):
        out = denoise(params, noisy)
        pred = metrics.tonemap_for_metrics(out["combined"])[None]
        ref = metrics.tonemap_for_metrics(gt)[None]
        return (
            metrics.psnr_per_image(pred, ref)[0],
            metrics.ssim(pred, ref)[0],
            metrics.psnr_per_image(
                metrics.tonemap_for_metrics(noisy["combined"])[None], ref
            )[0],
        )

    print("generating 4K scene on device + compiling...", file=sys.stderr)
    key = jax.random.PRNGKey(0)
    clean = gen_clean(key)
    gt = clean["combined"]
    noisy0 = gen_noisy(jax.random.PRNGKey(100), clean)
    # warm up with the ARRAY-salt signature the timed loop uses (a Python
    # float salt would compile a different program and the recompile would
    # land inside the first timed chain)
    s0 = den_only(params, noisy0, jnp.zeros(()))
    _ = float(den_only(params, noisy0, s0 * 1e-30))

    K = 4
    lat, psnrs, ssims, psnr_noisy = [], [], [], []
    _ = [float(x) for x in quality(params, noisy0, gt)]  # compile quality too
    for i in range(args.frames):
        noisy = gen_noisy(jax.random.PRNGKey(100 + i), clean)
        # chain K denoises, subtract a 1-chain run: cancels the fetch RTT
        s = den_only(params, noisy, 0.0)
        float(s)  # force: settle generation + this call before timing
        t0 = time.perf_counter()
        s = den_only(params, noisy, s * 1e-30)
        float(s)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(K):
            s = den_only(params, noisy, s * 1e-30)
        float(s)
        tk = time.perf_counter() - t0
        lat.append(1e3 * (tk - t1) / (K - 1))
        pd, sd, pn = quality(params, noisy, gt)
        psnrs.append(float(pd))
        ssims.append(float(sd))
        psnr_noisy.append(float(pn))

    print(json.dumps({
        "model": args.model,
        "resolution": f"{W}x{H}",
        "spp": args.spp,
        "n_frames": args.frames,
        "latency_ms": [round(x, 1) for x in lat],
        "latency_ms_median": round(float(np.median(lat)), 1),
        "psnr_noisy_mean": round(float(np.mean(psnr_noisy)), 2),
        "psnr_mean": round(float(np.mean(psnrs)), 2),
        "ssim_mean": round(float(np.mean(ssims)), 4),
    }, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
