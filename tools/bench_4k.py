"""BASELINE config #5: 4K animation-sequence batch denoise with per-frame
latency and PSNR/SSIM tracking.

    python tools/bench_4k.py [--frames 4] [--tile 0]

Generates a short synthetic animation (per-frame seeds = temporal noise
decorrelation, static scene), denoises at 3840x2160 with the flagship, and
prints the sequence report (per-frame ms, PSNR, SSIM). tile=0 attempts
whole-frame; pass --tile 1088 to force banded tiling if HBM is tight.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--height", type=int, default=2160)
    p.add_argument("--width", type=int, default=3840)
    p.add_argument("--tile", type=int, default=0)
    p.add_argument("--spp", type=int, default=8)
    args = p.parse_args()

    from __graft_entry__ import FLAGSHIP
    from deepdenoiser_tpu.config import InferenceConfig
    from deepdenoiser_tpu.data import synthetic
    from deepdenoiser_tpu.inference import sequence
    from deepdenoiser_tpu.models import factory

    print(f"generating {args.frames} synthetic 4K frames...", file=sys.stderr)
    clean = synthetic.generate_clean_passes(args.height, args.width, seed=0)
    frames = [
        synthetic.add_mc_noise(clean, spp=args.spp, seed=100 + i)
        for i in range(args.frames)
    ]
    gts = [clean["combined"]] * args.frames

    params = factory.init_params(FLAGSHIP, jax.random.PRNGKey(0), spatial=64)
    try:
        from tools.export_release_weights import load_release_params

        wpath = Path(__file__).resolve().parents[1] / "weights/flagship_ema_f16.npz"
        if wpath.exists():
            params = jax.device_put(load_release_params(wpath))
            print("using release weights", file=sys.stderr)
    except Exception:
        pass

    icfg = InferenceConfig(tile=args.tile, compute_dtype="bfloat16")
    report = sequence.run_sequence(FLAGSHIP, icfg, params, frames, gts, mode="joint")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
