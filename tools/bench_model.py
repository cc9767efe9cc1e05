"""Per-model 1080p latency using EXACTLY bench.py's methodology (chained
salted calls, median of 5 samples, one scalar fetch per chain) — the
known-good measurement on the tunneled TPU. Quality is reported for the
same program. Used for the zoo ablation latency column (eval_zoo.py's
inline chains measured anomalously there; see MEMORY tpu-env-facts).

    python tools/bench_model.py --model tiramisu [--border 32] [--mode auto]
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
    p.add_argument("--model", required=True)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--border", type=int, default=32)
    p.add_argument("--tile", type=int, default=0)
    p.add_argument("--tile-batch", type=int, default=0)
    p.add_argument("--chain", type=int, default=8)
    p.add_argument("--samples", type=int, default=5)
    p.add_argument("--init", action="store_true",
                   help="random-init params instead of loading weights "
                        "(latency-only sweeps of untrained variants; the "
                        "reported quality numbers are meaningless)")
    args = p.parse_args()

    from deepdenoiser_tpu.utils import tpu_guard

    tpu_guard.guard_latency_tool(f"bench_model:{args.model}")
    from deepdenoiser_tpu.config import InferenceConfig
    from deepdenoiser_tpu.data import synthetic
    from deepdenoiser_tpu.inference import pipeline
    from deepdenoiser_tpu.ops import metrics
    from tools.eval_zoo import load_model_params

    H, W = args.height, args.width
    if args.init:
        from tools.pretrain_flagship import MODELS
        from deepdenoiser_tpu.config import TrainConfig
        from deepdenoiser_tpu.training import train as train_lib

        mcfg = MODELS[args.model]
        mode = {24: "joint", 6: "group", 3: "rgb"}[mcfg.out_channels]
        state = train_lib.create_state(
            mcfg, TrainConfig(ema_decay=0.0), jax.random.PRNGKey(0), spatial=96
        )
        params = jax.device_put(state.params)
    else:
        mcfg, params, mode = load_model_params(args.model)
    icfg = InferenceConfig(tile=args.tile, tile_batch=args.tile_batch,
                           compute_dtype="bfloat16", border=args.border)
    if mode == "joint":
        denoise, grid = pipeline.make_joint_frame_denoiser(mcfg, icfg, H, W)
    else:
        denoise, grid = pipeline.make_group_frame_denoiser(mcfg, icfg, H, W)
    print(f"{args.model}: grid {grid.net_h}x{grid.net_w} mode={mode} "
          f"device={jax.devices()[0]}", file=sys.stderr, flush=True)

    clean = synthetic.generate_clean_passes(H, W, seed=0)
    noisy = synthetic.add_mc_noise(clean, spp=4, seed=1)
    frame = {k: jax.device_put(jnp.asarray(v)) for k, v in noisy.items()}
    gt = jax.device_put(jnp.asarray(clean["combined"]))

    @jax.jit
    def run_once(params, frame, salt):
        f = dict(frame)
        f["diffuse_direct"] = f["diffuse_direct"] + salt
        return denoise(params, f)["combined"].sum()

    @jax.jit
    def quality(params, frame, gt):
        out = denoise(params, frame)
        tm = metrics.tonemap_for_metrics
        pred, ref = tm(out["combined"])[None], tm(gt)[None]
        return (
            metrics.psnr(pred, ref),
            metrics.psnr(tm(frame["combined"])[None], ref),
            metrics.ssim(pred, ref)[0],
        )

    def chain(k: int) -> float:
        t0 = time.perf_counter()
        s = jnp.zeros(())
        for _ in range(k):
            s = run_once(params, frame, s * 1e-30)
        float(s)
        return time.perf_counter() - t0

    chain(1)
    chain(1)
    per_frame = []
    for _ in range(args.samples):
        t1 = chain(1)
        tk = chain(args.chain)
        per_frame.append((tk - t1) / (args.chain - 1))
    ms = 1e3 * float(np.median(per_frame))
    pd, pn, sd = (float(x) for x in quality(params, frame, gt))
    print(json.dumps({
        "model": args.model, "mode": mode,
        "latency_ms": round(ms, 2),
        "samples_ms": [round(1e3 * x, 1) for x in per_frame],
        "psnr": round(pd, 2), "noisy_psnr": round(pn, 2),
        "gain_db": round(pd - pn, 2), "ssim": round(sd, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
