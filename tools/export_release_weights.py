"""Export compact release weights from a training checkpoint.

    python tools/export_release_weights.py [--ckpt checkpoints/flagship] \
        [--out weights/flagship_ema_f16.npz]

Saves the EMA parameters (fallback: raw params) as float16 in a flat npz —
~4x smaller than the orbax training checkpoint (no optimizer state, half
precision), small enough to version in git. bench.py and the demo load it
when present. The flagship computes in bfloat16, so fp16 storage costs no
inference quality.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

# Canonical implementations live in the package (deepdenoiser_tpu.weights_io)
# so the CLI can load release npz files; re-exported here for the tools that
# import from this script.
from deepdenoiser_tpu.weights_io import (  # noqa: F401
    flatten, load_release_params, unflatten,
)


def main() -> int:
    # Weight surgery needs no TPU; CPU avoids remote compiles for the
    # template init. ONLY when run as a script: setting this at module
    # import silently switched IMPORTERS' "TPU" benchmarks onto the host
    # CPU whenever the import preceded first device use (r2 post-mortem —
    # the zoo latency numbers measured ~500x slow because of this).
    jax.config.update("jax_platforms", "cpu")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", default="checkpoints/flagship")
    p.add_argument("--out", default="weights/flagship_ema_f16.npz")
    p.add_argument("--model", default="flagship")
    args = p.parse_args()

    from deepdenoiser_tpu.config import TrainConfig
    from deepdenoiser_tpu.training import train as train_lib
    from deepdenoiser_tpu.training.checkpoint import CheckpointManager
    from tools.pretrain_flagship import MODELS

    state = train_lib.create_state(
        MODELS[args.model], TrainConfig(ema_decay=0.999), jax.random.PRNGKey(0),
        spatial=64,
    )
    mgr = CheckpointManager(args.ckpt)
    restored = mgr.restore_latest(state)
    mgr.close()
    if restored is None:
        print(f"no checkpoint under {args.ckpt}", file=sys.stderr)
        return 1
    st = restored[0]
    params = st.ema_params if st.ema_params is not None else st.params
    flat = {k: v.astype(np.float16) for k, v in flatten(params).items()}
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(args.out, **flat)
    size = Path(args.out).stat().st_size / 1e6
    print(f"wrote {args.out} ({size:.1f} MB, step {int(st.step)}, "
          f"{sum(v.size for v in flat.values())/1e6:.2f}M params)")
    if restored[1]:
        print(f"checkpoint extra: {restored[1]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
