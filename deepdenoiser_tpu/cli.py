"""Public CLI: train / prepare-data / denoise (+ synth-data, eval)
(upstream: the argparse front door of TensorFlow/DeepDenoiser.py and
TrainingData.py — SURVEY.md L8; subcommand set fixed by BASELINE.json:5).

    deepdenoiser prepare-data --renders R --out shards/ [--config c.json]
    deepdenoiser synth-data   --out renders/ [--frames 4 --size 128]
    deepdenoiser train        --config c.json --workdir runs/x --shards shards/
    deepdenoiser denoise      --config c.json --checkpoint runs/x/checkpoints \\
                              --frame frame_dir_or_multilayer.exr --out out.exr
    deepdenoiser eval         --config c.json --checkpoint ... --renders R
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path
from typing import Optional

import numpy as np


def _load_config(path: Optional[str], preset: Optional[str]):
    from deepdenoiser_tpu import config as config_lib

    if path:
        return config_lib.load(path)
    if preset:
        return config_lib.PRESETS[preset]
    return config_lib.ExperimentConfig()


def cmd_prepare_data(args) -> int:
    from deepdenoiser_tpu.data import prepare

    cfg = _load_config(args.config, args.preset)
    metas = prepare.prepare_dataset(args.renders, args.out, cfg.data)
    for split, meta in metas.items():
        print(f"{split}: {meta.n_examples} examples, {len(meta.shard_sizes)} shards")
    return 0


def cmd_synth_data(args) -> int:
    from deepdenoiser_tpu.data import prepare

    prepare.generate_synthetic_render_root(
        args.out, n_frames=args.frames, height=args.size, width=args.size,
        spps=tuple(args.spp), n_seeds=args.seeds, seed=args.seed,
    )
    print(f"wrote {args.frames} synthetic frames under {args.out}")
    return 0


def cmd_train(args) -> int:
    from deepdenoiser_tpu.training import loop

    cfg = _load_config(args.config, args.preset)
    if args.steps:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, steps=args.steps)
        )
    loop.fit(cfg, args.workdir, shard_dir=args.shards)
    return 0


def _load_frame(path: Path):
    from deepdenoiser_tpu.data import exr

    if path.is_dir():
        return exr.load_frame_dir(path, strict=False)
    return exr.load_multilayer_exr(path)


def cmd_denoise(args) -> int:
    import jax
    import jax.numpy as jnp

    from deepdenoiser_tpu import config as config_lib
    from deepdenoiser_tpu.data import exr
    from deepdenoiser_tpu.inference import pipeline
    from deepdenoiser_tpu.training import train as train_lib
    from deepdenoiser_tpu.training.checkpoint import CheckpointManager

    from deepdenoiser_tpu.training.loop import _validate_channels

    cfg = _validate_channels(_load_config(args.config, args.preset))
    frame = _load_frame(Path(args.frame))
    h, w = next(iter(frame.values())).shape[:2]

    mcfg = cfg.model
    if args.weights:
        from deepdenoiser_tpu import weights_io

        params = weights_io.load_release_params(args.weights)
    else:
        state = train_lib.create_state(mcfg, cfg.train, jax.random.PRNGKey(0),
                                       spatial=cfg.data.crop)
        mgr = CheckpointManager(args.checkpoint)
        restored = mgr.restore_latest(state)
        if restored is None:
            print(f"WARNING: no checkpoint under {args.checkpoint}; "
                  "denoising with random weights", file=sys.stderr)
            params = state.params
        else:
            st = restored[0]
            params = st.ema_params if (args.ema and st.ema_params is not None) else st.params
        mgr.close()

    mode = args.mode or cfg.data.mode
    if args.mode and args.mode != cfg.data.mode:
        # surface the mismatch up front instead of a deep Flax shape error
        from deepdenoiser_tpu.data import loader as loader_lib

        try:
            want = loader_lib.input_channels(
                dataclasses.replace(cfg.data, mode=args.mode)
            )
        except ValueError as e:
            # e.g. a use_flags config overridden to group/rgb mode
            print(f"error: --mode {args.mode} is incompatible with this "
                  f"config: {e}", file=sys.stderr)
            return 2
        if mcfg.in_channels != want:
            print(
                f"error: --mode {args.mode} needs {want} input channels but "
                f"the config/checkpoint model has {mcfg.in_channels} "
                f"(trained with mode={cfg.data.mode!r})",
                file=sys.stderr,
            )
            return 2
    scales = dict(cfg.data.pass_scales) or None  # stats-driven norm (C7→C4)
    if mode == "group":
        denoise, _ = pipeline.make_group_frame_denoiser(
            mcfg, cfg.infer, h, w, scales=scales
        )
    elif mode == "joint":
        denoise, _ = pipeline.make_joint_frame_denoiser(
            mcfg, cfg.infer, h, w,
            groups=tuple(cfg.data.groups), use_flags=cfg.data.use_flags,
            scales=scales,
        )
    else:
        denoise, _ = pipeline.make_rgb_frame_denoiser(
            mcfg, cfg.infer, h, w, scales=scales
        )
    out = denoise(params, {k: jnp.asarray(v) for k, v in frame.items()})
    out_np = {k: np.asarray(v) for k, v in out.items()}

    out_path = Path(args.out)
    if args.passes:
        exr.save_frame_dir(out_path, out_np)
        print(f"wrote denoised pass directory {out_path}")
    else:
        exr.write_exr(out_path, out_np["combined"])
        print(f"wrote {out_path}")
    return 0


def cmd_eval(args) -> int:
    """Full-frame PSNR/SSIM against ground truth over a render root."""
    import jax
    import jax.numpy as jnp

    from deepdenoiser_tpu.data import exr, prepare
    from deepdenoiser_tpu.inference import pipeline, sequence
    from deepdenoiser_tpu.training import train as train_lib
    from deepdenoiser_tpu.training.checkpoint import CheckpointManager

    from deepdenoiser_tpu.training.loop import _validate_channels

    cfg = _validate_channels(_load_config(args.config, args.preset))
    if args.weights:
        from deepdenoiser_tpu import weights_io

        params = weights_io.load_release_params(args.weights)
    else:
        state = train_lib.create_state(cfg.model, cfg.train, jax.random.PRNGKey(0),
                                       spatial=cfg.data.crop)
        mgr = CheckpointManager(args.checkpoint)
        restored = mgr.restore_latest(state)
        if restored is None:
            print(f"WARNING: no checkpoint under {args.checkpoint}; "
                  "evaluating random weights", file=sys.stderr)
            params = state.params
        else:
            st = restored[0]
            # shipped-checkpoint policy is EMA; evaluate what ships
            params = st.ema_params if (args.ema and st.ema_params is not None) else st.params
        mgr.close()

    report = sequence.evaluate_render_root(
        cfg.model, cfg.infer, params, args.renders, mode=cfg.data.mode,
        scales=dict(cfg.data.pass_scales) or None,
        groups=tuple(cfg.data.groups), use_flags=cfg.data.use_flags,
    )
    print(json.dumps(report, indent=2))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="deepdenoiser",
                                description="TPU-native Monte-Carlo render denoiser")
    sub = p.add_subparsers(dest="command", required=True)

    from deepdenoiser_tpu import config as config_lib

    def common(sp):
        sp.add_argument("--config", help="experiment config JSON")
        sp.add_argument("--preset", choices=sorted(config_lib.PRESETS))

    sp = sub.add_parser("prepare-data", help="EXR render root -> training shards")
    common(sp)
    sp.add_argument("--renders", required=True)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_prepare_data)

    sp = sub.add_parser("synth-data", help="generate a synthetic render root")
    sp.add_argument("--out", required=True)
    sp.add_argument("--frames", type=int, default=4)
    sp.add_argument("--size", type=int, default=128)
    sp.add_argument("--spp", type=int, nargs="+", default=[4, 16])
    sp.add_argument("--seeds", type=int, default=1)
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=cmd_synth_data)

    sp = sub.add_parser("train", help="train (auto-resumes from workdir)")
    common(sp)
    sp.add_argument("--workdir", required=True)
    sp.add_argument("--shards", required=True)
    sp.add_argument("--steps", type=int)
    sp.set_defaults(fn=cmd_train)

    def weight_source(sp):
        sp.add_argument("--checkpoint",
                        help="orbax training workdir checkpoint directory")
        sp.add_argument("--weights",
                        help="release npz weight file (weights/*.npz) — "
                             "already EMA; overrides --checkpoint")

    sp = sub.add_parser(
        "denoise", help="denoise a full frame",
        epilog="Note: presets default infer.border=32 (measured "
               "quality-identical on the synthetic families at 1080p/4K); "
               "set border=-1 in a config JSON to restore the certified "
               "receptive-field pad for border-critical content.")
    common(sp)
    weight_source(sp)
    sp.add_argument("--frame", required=True,
                    help="frame EXR directory or multilayer EXR file")
    sp.add_argument("--out", required=True)
    sp.add_argument("--mode", choices=["group", "joint", "rgb"])
    sp.add_argument("--passes", action="store_true",
                    help="write all denoised passes, not just combined")
    sp.add_argument("--ema", action="store_true",
                    help="use EMA weights from the checkpoint (release npz "
                         "weights are already EMA)")
    sp.set_defaults(fn=cmd_denoise)

    sp = sub.add_parser("eval", help="PSNR/SSIM + latency over a render root")
    common(sp)
    weight_source(sp)
    sp.add_argument("--ema", action=argparse.BooleanOptionalAction, default=True,
                    help="evaluate EMA params (default: on — the shipped-"
                         "checkpoint policy; --no-ema for raw params)")
    sp.add_argument("--renders", required=True)
    sp.set_defaults(fn=cmd_eval)

    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if getattr(args, "fn", None) in (cmd_denoise, cmd_eval):
        if not args.checkpoint and not args.weights:
            print("error: one of --checkpoint or --weights is required",
                  file=sys.stderr)
            return 2
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
