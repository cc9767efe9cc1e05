"""MFU / roofline accounting for the frame pipeline (SURVEY.md §5
tracing/profiling: the reference had TensorBoard only; the TPU-native
equivalent is XLA cost analysis against the chip's peak numbers).

    python tools/roofline.py [--model flagship-hq] [--height 1080 --width 1920]

Reports, from the COMPILED program's cost analysis and a measured
chained-call latency:
  * FLOPs/frame, HBM bytes/frame, arithmetic intensity (FLOPs/byte)
  * achieved TFLOP/s and GB/s; MFU (vs bf16 peak) and HBM utilization
  * the roofline verdict: compute-bound vs bandwidth-bound at this
    intensity, and the speed-of-light latency for each bound.

TPU v5e (v5 lite) peaks used: 197 TFLOP/s bf16 (MXU), 819 GB/s HBM.
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

PEAK_FLOPS = {"bfloat16": 197e12, "float32": 49e12}  # per v5e chip
PEAK_HBM_BPS = 819e9


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--tile", type=int, default=0)
    p.add_argument("--tile-batch", type=int, default=0)
    p.add_argument("--chain", type=int, default=8)
    p.add_argument("--measured-ms", type=float, default=0.0,
                   help="externally measured latency (bench.py / "
                        "bench_model.py); overrides the inline chain, which "
                        "under-measures at small sizes on the tunneled TPU")
    p.add_argument("--model", default="flagship",
                   help="zoo model name (tools/pretrain_flagship.py MODELS) "
                        "— the r2 roofline covered only the s2d flagship "
                        "(VERDICT r2 weak 7)")
    p.add_argument("--border", type=int, default=-1)
    args = p.parse_args()

    from tools.pretrain_flagship import MODELS
    from deepdenoiser_tpu.config import InferenceConfig
    from deepdenoiser_tpu.data import synthetic_jax as sj
    from deepdenoiser_tpu.inference import pipeline
    from deepdenoiser_tpu.models import factory

    mcfg = MODELS[args.model]
    if mcfg.out_channels != 24:
        raise SystemExit(f"--model {args.model}: roofline drives the joint "
                         "pipeline; pick a joint-mode (24-channel) model")
    H, W = args.height, args.width
    params = factory.init_params(mcfg, jax.random.PRNGKey(0), spatial=64)
    icfg = InferenceConfig(tile=args.tile, tile_batch=args.tile_batch,
                           border=args.border, compute_dtype="bfloat16")
    denoise, grid = pipeline.make_joint_frame_denoiser(mcfg, icfg, H, W)
    print(f"grid: {grid}", file=sys.stderr)

    clean = jax.jit(lambda k: sj.generate_clean_passes(k, H, W))(
        jax.random.PRNGKey(0)
    )
    noisy = jax.jit(lambda k, c: sj.add_mc_noise(k, c, 4.0))(
        jax.random.PRNGKey(1), clean
    )
    frame = {k: v for k, v in noisy.items()}

    def run_once(params, frame, salt):
        f = dict(frame)
        f["diffuse_direct"] = f["diffuse_direct"] + salt
        return denoise(params, f)["combined"].sum()

    jfn = jax.jit(run_once)
    compiled = jfn.lower(params, frame, jnp.zeros(())).compile()
    ca_list = compiled.cost_analysis()
    ca = ca_list[0] if isinstance(ca_list, (list, tuple)) else ca_list
    flops = float(ca.get("flops", 0.0))
    bytes_hbm = float(ca.get("bytes accessed", 0.0))

    # measured latency: chained calls, one scalar fetch (bench.py method);
    # median of 5 samples — a single (t1, tk) pair occasionally lands while
    # the device stream is still draining and under-measures badly (one r3
    # sample said 31 ms for a program eval_zoo's median put at 83 ms)
    import numpy as np

    s = jfn(params, frame, jnp.zeros(()))
    float(s)
    s = jfn(params, frame, s * 1e-30)
    float(s)
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        s = jfn(params, frame, s * 1e-30)
        float(s)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.chain):
            s = jfn(params, frame, s * 1e-30)
        float(s)
        tk = time.perf_counter() - t0
        samples.append((tk - t1) / (args.chain - 1))
    sec = max(float(np.median(samples)), 1e-9)
    if args.measured_ms > 0:
        sec = args.measured_ms / 1e3

    peak = PEAK_FLOPS["bfloat16"]
    ai = flops / max(bytes_hbm, 1.0)
    ridge = peak / PEAK_HBM_BPS
    mfu = flops / sec / peak
    hbm_util = bytes_hbm / sec / PEAK_HBM_BPS
    sol_compute_ms = 1e3 * flops / peak
    sol_hbm_ms = 1e3 * bytes_hbm / PEAK_HBM_BPS

    report = {
        "model": args.model,
        "resolution": f"{W}x{H}",
        "latency_ms": round(1e3 * sec, 2),
        "gflops_per_frame": round(flops / 1e9, 1),
        "hbm_gb_per_frame": round(bytes_hbm / 1e9, 3),
        "arithmetic_intensity": round(ai, 1),
        "ridge_point": round(ridge, 1),
        "achieved_tflops": round(flops / sec / 1e12, 2),
        "mfu": round(mfu, 4),
        "achieved_hbm_gbps": round(bytes_hbm / sec / 1e9, 1),
        "hbm_utilization": round(hbm_util, 4),
        "bound": "compute" if ai > ridge else "bandwidth",
        "speed_of_light_ms": round(max(sol_compute_ms, sol_hbm_ms), 2),
        "sol_compute_ms": round(sol_compute_ms, 2),
        "sol_hbm_ms": round(sol_hbm_ms, 2),
    }
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
