"""Capture a jax.profiler trace of the 1080p frame pipeline (SURVEY.md §5
tracing/profiling).

    python tools/profile.py [--out /tmp/ddtrace] [--iters 3]

Writes a TensorBoard-loadable trace directory (xplane) covering N frame
denoises; inspect with `tensorboard --logdir <out>` or xprof. On the
tunneled dev TPU the trace covers host-side dispatch; on directly-attached
TPUs it includes device timelines.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/ddtrace")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    args = p.parse_args()

    from __graft_entry__ import FLAGSHIP
    from deepdenoiser_tpu.config import InferenceConfig
    from deepdenoiser_tpu.data import synthetic
    from deepdenoiser_tpu.inference import pipeline
    from deepdenoiser_tpu.models import factory

    params = factory.init_params(FLAGSHIP, jax.random.PRNGKey(0), spatial=64)
    icfg = InferenceConfig(tile=0, compute_dtype="bfloat16")
    denoise, _ = pipeline.make_joint_frame_denoiser(
        FLAGSHIP, icfg, args.height, args.width
    )
    clean = synthetic.generate_clean_passes(args.height, args.width, seed=0)
    noisy = synthetic.add_mc_noise(clean, spp=8, seed=1)
    frame = {k: jax.device_put(jnp.asarray(v)) for k, v in noisy.items()}

    # compile outside the trace
    out = denoise(params, frame)
    _ = float(out["combined"].sum())

    with jax.profiler.trace(args.out):
        for i in range(args.iters):
            with jax.profiler.TraceAnnotation(f"frame_{i}"):
                out = denoise(params, frame)
                _ = float(out["combined"].sum())
    print(f"trace written to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
