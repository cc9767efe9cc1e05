"""Architecture ablation (SURVEY.md C12/C13/C14): trained zoo challengers
vs the flagship — 1080p denoise latency plus PSNR/SSIM gain on the
training synthetic family AND the structurally different holdout family.

    python tools/pretrain_flagship.py --model multiscale --steps 40000 --out checkpoints/multiscale
    ... (tiramisu, kpn) ...
    python tools/eval_zoo.py --models flagship multiscale tiramisu kpn

Prints one table row per model and a JSON summary. Flagship params come
from the release npz; challengers from their orbax checkpoints (EMA).
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

ROOT = Path(__file__).resolve().parents[1]


def load_model_params(name: str):
    """(ModelConfig, params, mode) for a zoo member."""
    from tools.pretrain_flagship import MODELS
    from tools.export_release_weights import load_release_params
    from deepdenoiser_tpu.config import TrainConfig
    from deepdenoiser_tpu.training import train as train_lib
    from deepdenoiser_tpu.training.checkpoint import CheckpointManager

    mcfg = MODELS[name]
    mode = {24: "joint", 6: "group", 3: "rgb"}[mcfg.out_channels]
    npz = ROOT / "weights" / f"{name.replace('-', '_')}_ema_f16.npz"
    if npz.exists():
        return mcfg, jax.device_put(load_release_params(npz)), mode
    ckpt = ROOT / "checkpoints" / name
    if ckpt.exists():
        state = train_lib.create_state(
            mcfg, TrainConfig(ema_decay=0.999), jax.random.PRNGKey(0), spatial=96
        )
        mgr = CheckpointManager(ckpt)
        restored = mgr.restore_latest(state)
        mgr.close()
        if restored is not None:
            st = restored[0]
            params = st.ema_params if st.ema_params is not None else st.params
            return mcfg, jax.device_put(params), mode
    raise FileNotFoundError(f"no weights for {name!r} (looked at {npz} and {ckpt})")


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", nargs="+",
                   default=["flagship", "flagship-hq", "tiramisu", "kpn"])
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--frames", type=int, default=2)
    p.add_argument("--spp", type=int, default=4)
    p.add_argument("--chain", type=int, default=6)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (quality-only: latency is "
                        "reported as null). NOTE: JAX_PLATFORMS=cpu in the "
                        "env does NOT stick on this box; and never share "
                        "the TPU with a live training run — a concurrent "
                        "client can wedge the trainer's stream permanently "
                        "(MEMORY tpu-env-facts)")
    p.add_argument("--mc-gt-spp", type=int, default=1024,
                   help="GT sample count for the traced MC family (residual "
                        "GT noise power = spp_noisy/spp_gt below the noisy "
                        "frame; 1024 vs 4 = -24 dB)")
    p.add_argument("--no-mc", action="store_true",
                   help="skip the traced Monte-Carlo family column "
                        "(data/mc_tracer.py — genuine N-sample estimates: "
                        "fireflies, penumbra variance; VERDICT r4 #2). "
                        "Generation is jitted and fast on the chip but "
                        "costs minutes on --cpu")
    p.add_argument("--quality-only", action="store_true",
                   help="skip the latency chains (latency prints as n/a). "
                        "The MEASUREMENT is contention-immune (PSNR/SSIM "
                        "are deterministic), but this is still a concurrent "
                        "chip client — a second client can wedge a live "
                        "trainer's stream permanently (MEMORY "
                        "tpu-env-facts), so prefer --cpu while training is "
                        "live; latency mode takes the tpu_guard lock and "
                        "refuses a contended chip (VERDICT r3 weak #8)")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not (args.cpu or args.quality_only):
        from deepdenoiser_tpu.utils import tpu_guard

        tpu_guard.guard_latency_tool("eval_zoo")
    elif not args.cpu:
        # quality-only still compiles on the chip: fail fast on a
        # wedge-locked chip instead of hanging (STATUS_R4 infra incidents)
        from deepdenoiser_tpu.utils import tpu_guard

        tpu_guard.require_live_chip("eval_zoo")
    args.chain = max(args.chain, 2)  # (tk - t1)/(chain - 1) needs chain >= 2

    from deepdenoiser_tpu.config import InferenceConfig
    from deepdenoiser_tpu.data import (synthetic, synthetic_boxes,
                                       synthetic_holdout, synthetic_spheres)
    from deepdenoiser_tpu.inference import pipeline
    from deepdenoiser_tpu.ops import metrics

    H, W = args.height, args.width
    icfg = InferenceConfig(tile=0, compute_dtype="bfloat16")

    # shared eval frames (host-generated once). 'train-family' = Fourier,
    # 'voronoi' = in the training mix since r3, 'holdout' = the untouched
    # spheres family (data/synthetic_spheres.py), 'holdout2' = the r4
    # untouched boxes family (data/synthetic_boxes.py) — two independent
    # never-trained families guard against selection leakage (VERDICT r3
    # missing #3).
    families = {}
    for fam, gen in (("train-family", synthetic.generate_clean_passes),
                     ("voronoi", synthetic_holdout.generate_clean_passes),
                     ("holdout", synthetic_spheres.generate_clean_passes),
                     ("holdout2", synthetic_boxes.generate_clean_passes)):
        frames = []
        for f in range(args.frames):
            clean = gen(H, W, seed=2000 + f)
            noisy = synthetic.add_mc_noise(clean, spp=args.spp, seed=31 * f)
            frames.append((noisy, clean["combined"]))
        families[fam] = frames
    if not args.no_mc:
        # traced Monte-Carlo family: the noisy frame is a GENUINE
        # args.spp-sample estimate (fireflies, penumbra-correlated
        # variance), GT = the same estimator at --mc-gt-spp
        from deepdenoiser_tpu.data import mc_tracer

        frames = []
        for f in range(args.frames):
            clean = mc_tracer.generate_clean_passes(
                H, W, seed=2000 + f, spp=args.mc_gt_spp)
            noisy = mc_tracer.generate_noisy_passes(
                H, W, seed=2000 + f, spp=args.spp, sample_seed=31 * f)
            frames.append((noisy, clean["combined"]))
            print(f"mc frame {f}: traced gt {args.mc_gt_spp} spp + noisy "
                  f"{args.spp} spp", file=sys.stderr, flush=True)
        families["mc"] = frames

    tm = metrics.tonemap_for_metrics
    rows = []
    for name in args.models:
        try:
            mcfg, params, mode = load_model_params(name)
        except FileNotFoundError as e:
            print(f"skip {name}: {e}", file=sys.stderr)
            continue
        if mode == "joint":
            denoise, _ = pipeline.make_joint_frame_denoiser(mcfg, icfg, H, W)
        else:
            denoise, _ = pipeline.make_group_frame_denoiser(mcfg, icfg, H, W)

        @jax.jit
        def den_only(params, frame, salt, _d=denoise):
            f = dict(frame)
            f["diffuse_direct"] = f["diffuse_direct"] + salt
            return _d(params, f)["combined"].sum()

        @jax.jit
        def qual(params, frame, gt, _d=denoise):
            out = _d(params, frame)
            pred, ref = tm(out["combined"])[None], tm(gt)[None]
            return (metrics.psnr_per_image(pred, ref)[0],
                    metrics.ssim(pred, ref)[0],
                    metrics.psnr_per_image(tm(frame["combined"])[None], ref)[0])

        lat_ms = None
        if not (args.cpu or args.quality_only):
            frame0 = {k: jax.device_put(jnp.asarray(v))
                      for k, v in families["train-family"][0][0].items()}
            s = den_only(params, frame0, jnp.zeros(()))
            float(s)
            s = den_only(params, frame0, s * 1e-30)
            float(s)
            # median of 5 chain samples: single (t1, tk) pairs occasionally
            # catch multi-second tunnel stalls (MEMORY tpu-env-facts)
            samples = []
            for _ in range(5):
                t0 = time.perf_counter()
                s = den_only(params, frame0, s * 1e-30)
                float(s)
                t1 = time.perf_counter() - t0
                t0 = time.perf_counter()
                for _ in range(args.chain):
                    s = den_only(params, frame0, s * 1e-30)
                float(s)
                tk = time.perf_counter() - t0
                samples.append(1e3 * (tk - t1) / (args.chain - 1))
            lat_ms = float(np.median(samples))

        row = {"model": name, "mode": mode,
               "latency_ms": round(lat_ms, 1) if lat_ms is not None else None}
        for fam, frames in families.items():
            gains, psnrs, ssims = [], [], []
            for noisy, gt in frames:
                fr = {k: jax.device_put(jnp.asarray(v)) for k, v in noisy.items()}
                pd, sd, pn = qual(params, fr, jax.device_put(jnp.asarray(gt)))
                psnrs.append(float(pd)); ssims.append(float(sd))
                gains.append(float(pd) - float(pn))
            key = fam.replace("-family", "")
            row[f"{key}_psnr"] = round(float(np.mean(psnrs)), 2)
            row[f"{key}_gain_db"] = round(float(np.mean(gains)), 2)
            row[f"{key}_ssim"] = round(float(np.mean(ssims)), 4)
        rows.append(row)
        lat_str = f"{lat_ms:7.1f}" if lat_ms is not None else "    n/a"
        mc_str = (f"  mc {row['mc_psnr']:.2f} dB ({row['mc_gain_db']:+.2f})"
                  if "mc_psnr" in row else "")
        print(f"{name:12s} mode={mode:5s} {lat_str} ms  "
              f"train {row['train_psnr']:.2f} dB ({row['train_gain_db']:+.2f})  "
              f"holdout {row['holdout_psnr']:.2f} dB ({row['holdout_gain_db']:+.2f})  "
              f"holdout2 {row['holdout2_psnr']:.2f} dB ({row['holdout2_gain_db']:+.2f})"
              f"{mc_str}",
              flush=True)

    print(json.dumps({"zoo": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
