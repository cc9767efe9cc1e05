"""Family-generalization evaluation (de-circularized quality, VERDICT r1):
PSNR/SSIM gain of the shipped flagship on (a) the TRAINING families
(Fourier fields, data/synthetic.py; Voronoi scenes,
data/synthetic_holdout.py — in the training mix since round 3) and (b) the
structurally different UNTOUCHED holdout (ray-traced spheres,
data/synthetic_spheres.py), at matching Monte-Carlo noise levels. Prints a
table + one JSON line.

    python tools/eval_holdout.py [--height 1080 --width 1920] [--frames 3]
                                 [--spp 4 8] [--weights weights/flagship_ema_f16.npz]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import FLAGSHIP
from deepdenoiser_tpu.config import InferenceConfig
from deepdenoiser_tpu.data import (synthetic, synthetic_boxes,
                                   synthetic_holdout, synthetic_spheres)
from deepdenoiser_tpu.inference import sequence
from tools.export_release_weights import load_release_params

FAMILIES = {
    "train (fourier)": synthetic.generate_clean_passes,
    "train (voronoi, r3)": synthetic_holdout.generate_clean_passes,
    "holdout (spheres)": synthetic_spheres.generate_clean_passes,
    "holdout2 (boxes, r4)": synthetic_boxes.generate_clean_passes,
}


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--frames", type=int, default=3)
    p.add_argument("--spp", type=int, nargs="+", default=[4, 8])
    p.add_argument("--weights", default="weights/flagship_ema_f16.npz")
    p.add_argument("--tile", type=int, default=0)
    args = p.parse_args()

    params = jax.device_put(load_release_params(args.weights))
    icfg = InferenceConfig(tile=args.tile, compute_dtype="bfloat16")

    rows = []
    for fam_name, gen in FAMILIES.items():
        for spp in args.spp:
            frames, gts, noisy_psnr = [], [], []
            for f in range(args.frames):
                clean = gen(args.height, args.width, seed=1000 + f)
                noisy = synthetic.add_mc_noise(clean, spp=spp, seed=7 * f + spp)
                frames.append(noisy)
                gts.append(clean["combined"])
            rep = sequence.run_sequence(
                FLAGSHIP, icfg, params, frames, gts, mode="joint"
            )
            # noisy-input PSNR anchors the gain
            from deepdenoiser_tpu.ops import metrics

            @jax.jit
            def base_psnr(n, g):
                tm = metrics.tonemap_for_metrics
                return metrics.psnr(tm(n), tm(g))

            base = float(np.mean([
                float(base_psnr(jnp.asarray(f["combined"]), jnp.asarray(g)))
                for f, g in zip(frames, gts)
            ]))
            rows.append({
                "family": fam_name, "spp": spp,
                "noisy_psnr": round(base, 2),
                "denoised_psnr": round(rep["psnr_mean"], 2),
                "gain_db": round(rep["psnr_mean"] - base, 2),
                "ssim": round(rep["ssim_mean"], 4),
                "latency_ms": round(rep["latency_ms_median"], 1),
            })
            print(f"{fam_name:26s} spp={spp:<3d} noisy={base:6.2f} dB  "
                  f"denoised={rep['psnr_mean']:6.2f} dB  "
                  f"gain={rep['psnr_mean'] - base:+5.2f} dB  "
                  f"ssim={rep['ssim_mean']:.4f}", flush=True)

    print(json.dumps({"eval_holdout": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
