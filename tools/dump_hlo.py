"""Dump optimized HLO for the flagship frame pipeline (SURVEY.md §5:
"XLA dumped HLO for fusion verification" — the conv+activation+skip fusion
claim of BASELINE.json:5).

    python tools/dump_hlo.py [--out /tmp/flagship_hlo.txt] [--backend cpu]

Prints a fusion summary (op counts, fusion count) and writes the full
optimized module text. Use --backend cpu for a local view; on the TPU the
text comes back from the remote compiler when supported.
"""

from __future__ import annotations

import argparse
import collections
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/flagship_hlo.txt")
    p.add_argument("--backend", default=None, choices=[None, "cpu", "axon"])
    p.add_argument("--size", type=int, default=256)
    args = p.parse_args()

    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    import jax.numpy as jnp

    from __graft_entry__ import FLAGSHIP
    from deepdenoiser_tpu.config import InferenceConfig
    from deepdenoiser_tpu.inference import pipeline
    from deepdenoiser_tpu.models import factory
    from deepdenoiser_tpu import passes

    s = args.size
    params = factory.init_params(FLAGSHIP, jax.random.PRNGKey(0), spatial=64)
    icfg = InferenceConfig(tile=0, compute_dtype="bfloat16")
    denoise, _ = pipeline.make_joint_frame_denoiser(FLAGSHIP, icfg, s, s)

    frame = {
        name: jnp.zeros((s, s, passes.channels(name)), jnp.float32)
        for name in passes.ALL_PASSES
    }
    lowered = jax.jit(lambda pr, fr: denoise(pr, fr)).lower(params, frame)
    compiled = lowered.compile()
    text = compiled.as_text()
    Path(args.out).write_text(text)

    ops = collections.Counter(
        m.group(1) for m in re.finditer(r"^\s+\S+ = \S+ (\w+)\(", text, re.M)
    )
    fusions = ops.get("fusion", 0)
    convs = ops.get("convolution", 0)
    print(f"wrote {args.out} ({len(text)/1e6:.1f} MB)")
    print(f"op counts (incl. fused computations): fusion={fusions} "
          f"convolution={convs} (top: {ops.most_common(8)})")
    print("inspect the dump to verify normalize/activation/skip chains live "
          "inside fusion bodies adjacent to the convolutions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
