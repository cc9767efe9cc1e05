"""Measure the REAL data path's training throughput (VERDICT r4 missing #3;
BASELINE.json:10 "end-to-end training: EXR→feature pipeline, augmentation,
fwd/bwd").

Correctness of shards→Grain→encode→step is tested
(tests/test_pipeline_data.py::test_train_on_prepared_data); this tool
measures its THROUGHPUT against the on-device-synthesis path every shipped
model actually trained on, at matched batch/crop/model:

    python tools/bench_input_pipeline.py [--batch 16] [--crop 128]
        [--steps 150] [--model flagship-hq] [--shards DIR]

Measures, in order:
  * host_iter          — pure `next(grain_iterator)` rate (no device),
  * grain_2dispatch    — loop.fit's production path: jitted encode(batch)
                         + jitted step (two dispatches + one raw-crop
                         host→device transfer per step),
  * grain_fused        — encode+step compiled into ONE program (single
                         dispatch; isolates the tunnel round-trip cost),
  * synth_fused        — the pretrain_flagship.py path: on-device batch
                         synthesis + step in one program (the reference
                         rate: ~21-58 steps/s depending on model/crop).

Prints one JSON line. If --shards is not given, a small synthetic corpus
(4 frames × 2 spp variants, crop-`--crop` examples) is built under
/tmp/ddtpu_pipe_bench and reused across runs — the point is the per-step
host decode + transfer cost, which does not depend on corpus size.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np


def _build_corpus(root: Path, crop: int) -> Path:
    from deepdenoiser_tpu.config import DataConfig
    from deepdenoiser_tpu.data import prepare

    shard_dir = root / f"shards_c{crop}"
    if (shard_dir / "train" / "meta.json").exists():
        return shard_dir
    renders = root / "renders"
    if not (renders / "frame0000").exists():
        print("building synthetic render root...", file=sys.stderr, flush=True)
        prepare.generate_synthetic_render_root(
            renders, n_frames=4, height=3 * crop, width=3 * crop,
            spps=(4, 16), n_seeds=1, seed=7,
        )
    print("cutting shards...", file=sys.stderr, flush=True)
    dcfg = DataConfig(crop=crop, crops_per_frame=32, batch_size=16,
                      mode="joint", seed=0)
    prepare.prepare_dataset(renders, shard_dir, dcfg)
    return shard_dir


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--crop", type=int, default=128)
    p.add_argument("--steps", type=int, default=150)
    p.add_argument("--model", default="flagship-hq")
    p.add_argument("--shards", default=None)
    p.add_argument("--cpu", action="store_true",
                   help="CPU backend (functional smoke; rates meaningless)")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from deepdenoiser_tpu.utils import tpu_guard

        tpu_guard.guard_latency_tool("bench_input_pipeline")

    from deepdenoiser_tpu.config import DataConfig, TrainConfig
    from deepdenoiser_tpu.data import loader as loader_lib
    from deepdenoiser_tpu.data import synthetic_jax
    from deepdenoiser_tpu.training import train as train_lib
    from tools.pretrain_flagship import MODELS

    if args.shards:
        shard_dir = Path(args.shards)
    else:
        shard_dir = _build_corpus(Path("/tmp/ddtpu_pipe_bench"), args.crop)

    mcfg = MODELS[args.model]
    mode = {24: "joint", 6: "group", 3: "rgb"}[mcfg.out_channels]
    dcfg = DataConfig(crop=args.crop, batch_size=args.batch, mode=mode, seed=0)
    tcfg = TrainConfig(steps=args.steps, learning_rate=1e-4, ema_decay=0.999)

    result = {"batch": args.batch, "crop": args.crop, "model": args.model}

    # --- host-only iterator rate ------------------------------------------
    it = loader_lib.make_iterator(str(shard_dir / "train"), dcfg)
    next(it)  # prime (shard open, shuffle window)
    n_host = 60
    t0 = time.perf_counter()
    for _ in range(n_host):
        next(it)
    host_rate = n_host / (time.perf_counter() - t0)
    result["host_iter_batches_per_s"] = round(host_rate, 2)
    print(f"host iterator: {host_rate:.1f} batches/s", file=sys.stderr,
          flush=True)

    # --- production path: encode + step as loop.fit dispatches them -------
    state = train_lib.create_state(mcfg, tcfg, jax.random.PRNGKey(0),
                                   spatial=args.crop)
    encode = jax.jit(loader_lib.make_batch_encoder(dcfg))
    base_step = train_lib.make_train_step(mcfg, tcfg, None)
    step2 = jax.jit(base_step, donate_argnums=0)

    def timed_loop(step_once, state, label):
        it = loader_lib.make_iterator(str(shard_dir / "train"), dcfg)
        state, mets = step_once(state, next(it))  # compile
        float(mets["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, mets = step_once(state, next(it))
        float(mets["loss"])  # close the chain with one fetch
        rate = args.steps / (time.perf_counter() - t0)
        print(f"{label}: {rate:.1f} steps/s", file=sys.stderr, flush=True)
        return rate, state

    rate2, _ = timed_loop(lambda st, raw: step2(st, encode(raw)),
                          state, "grain 2-dispatch (loop.fit path)")
    result["grain_2dispatch_steps_per_s"] = round(rate2, 2)

    # --- fused: encode+step in ONE dispatched program ----------------------
    fused = jax.jit(lambda st, raw: base_step(st, loader_lib.make_batch_encoder(dcfg)(raw)),
                    donate_argnums=0)
    state = train_lib.create_state(mcfg, tcfg, jax.random.PRNGKey(0),
                                   spatial=args.crop)
    rate1, _ = timed_loop(fused, state, "grain fused (1 dispatch)")
    result["grain_fused_steps_per_s"] = round(rate1, 2)

    # --- reference: on-device synthesis, one program (pretrain path) ------
    state = train_lib.create_state(mcfg, tcfg, jax.random.PRNGKey(0),
                                   spatial=args.crop)
    synth_step = jax.jit(
        lambda st, key: base_step(
            st, synthetic_jax.training_batch(key, args.batch, args.crop,
                                             mode, "mixed")),
        donate_argnums=0,
    )
    key = jax.random.PRNGKey(1)
    key, k = jax.random.split(key)
    state, mets = synth_step(state, k)
    float(mets["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        key, k = jax.random.split(key)
        state, mets = synth_step(state, k)
    float(mets["loss"])
    synth_rate = args.steps / (time.perf_counter() - t0)
    print(f"synth fused: {synth_rate:.1f} steps/s", file=sys.stderr, flush=True)
    result["synth_fused_steps_per_s"] = round(synth_rate, 2)

    result["grain_vs_synth"] = round(
        max(rate1, rate2) / max(synth_rate, 1e-9), 3)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
