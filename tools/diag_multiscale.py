"""Multiscale voronoi-anomaly probe (VERDICT r3 weak #5 / item 10).

The 150k multiscale's voronoi gain (+2.58 dB) is anomalously weak vs its
fourier (+6.56) and holdout (+6.53) gains. Hypothesis: the coarse-scale
corrections — `out = fine + up(coarse - down(fine))` — hurt specifically
on voronoi's sharp cell edges (high-frequency structure the nearest-up
low-band swap can smear).

The probe exploits WEIGHT SHARING: the same checkpoint runs at any scale
count, so evaluating n_scales = 1/2/3 isolates the composition's
contribution per family with zero retraining.

    python tools/diag_multiscale.py [--height 512 --width 768]

Quality-only (CPU-forced): safe to run while the TPU trains.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")  # quality-only probe

import jax.numpy as jnp
import numpy as np


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=768)
    p.add_argument("--frames", type=int, default=2)
    p.add_argument("--spp", type=int, default=4)
    args = p.parse_args()

    from deepdenoiser_tpu.config import InferenceConfig
    from deepdenoiser_tpu.data import (synthetic, synthetic_boxes,
                                       synthetic_holdout, synthetic_spheres)
    from deepdenoiser_tpu.inference import pipeline
    from deepdenoiser_tpu.ops import metrics
    from tools.eval_zoo import load_model_params

    H, W = args.height, args.width
    mcfg3, params, mode = load_model_params("multiscale")
    assert mode == "joint"
    icfg = InferenceConfig(tile=0, compute_dtype="bfloat16")
    tm = metrics.tonemap_for_metrics

    families = {}
    for fam, gen in (("fourier", synthetic.generate_clean_passes),
                     ("voronoi", synthetic_holdout.generate_clean_passes),
                     ("spheres", synthetic_spheres.generate_clean_passes),
                     ("boxes", synthetic_boxes.generate_clean_passes)):
        frames = []
        for f in range(args.frames):
            clean = gen(H, W, seed=2000 + f)
            noisy = synthetic.add_mc_noise(clean, spp=args.spp, seed=31 * f)
            frames.append((noisy, clean["combined"]))
        families[fam] = frames

    rows = []
    for n_scales in (3, 2, 1):
        mcfg = dataclasses.replace(mcfg3, n_scales=n_scales)
        denoise, _ = pipeline.make_joint_frame_denoiser(mcfg, icfg, H, W)

        @jax.jit
        def qual(params, frame, gt, _d=denoise):
            out = _d(params, frame)
            pred, ref = tm(out["combined"])[None], tm(gt)[None]
            return (metrics.psnr_per_image(pred, ref)[0],
                    metrics.psnr_per_image(tm(frame["combined"])[None], ref)[0])

        row = {"n_scales": n_scales}
        for fam, frames in families.items():
            gains = []
            for noisy, gt in frames:
                fr = {k: jnp.asarray(v) for k, v in noisy.items()}
                pd, pn = qual(params, fr, jnp.asarray(gt))
                gains.append(float(pd) - float(pn))
            row[fam] = round(float(np.mean(gains)), 2)
        rows.append(row)
        print(f"n_scales={n_scales}: " +
              "  ".join(f"{f} {row[f]:+.2f}" for f in families), flush=True)

    print(json.dumps({"multiscale_diag": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
