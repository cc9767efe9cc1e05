"""The training driver loop (upstream: tf.estimator train_and_evaluate in
DeepDenoiser.py — SURVEY.md C16): wires config -> data -> jitted step ->
checkpoints -> metrics, with automatic resume and SIGTERM-safe saving.

Design: the host loop only (1) pulls raw batches from Grain, (2) calls two
compiled programs (encode+step fused by jit), (3) occasionally reads scalar
metrics. Everything else is on-device. Auto-resume restores params,
optimizer, step AND the Grain iterator state, so a preempted run continues
byte-identically (SURVEY.md §5 failure recovery).
"""

from __future__ import annotations

import dataclasses
import json
import signal
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

from deepdenoiser_tpu import config as config_lib
from deepdenoiser_tpu.config import ExperimentConfig
from deepdenoiser_tpu.data import loader as loader_lib
from deepdenoiser_tpu.parallel import mesh as mesh_lib
from deepdenoiser_tpu.training import train as train_lib
from deepdenoiser_tpu.training.checkpoint import CheckpointManager


class MetricLogger:
    """JSONL + stdout scalar logging, plus TensorBoard summaries via
    clu.metric_writers when available (the reference's estimator emitted
    TensorBoard scalars — SURVEY.md §5 observability)."""

    def __init__(self, workdir: Path, name: str = "train"):
        workdir.mkdir(parents=True, exist_ok=True)
        self._f = open(workdir / f"metrics_{name}.jsonl", "a")
        self._name = name
        self._tb = None
        try:
            from clu import metric_writers

            self._tb = metric_writers.SummaryWriter(str(workdir / "tb" / name))
        except Exception:
            pass  # clu/tensorboard unavailable: JSONL remains authoritative

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        scalars = {k: float(v) for k, v in metrics.items()}
        rec = {"step": step, "time": time.time()}
        rec.update(scalars)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.write_scalars(step, scalars)
        msg = " ".join(f"{k}={v:.5g}" for k, v in scalars.items())
        print(f"[{self._name} step {step}] {msg}", flush=True)

    def log_images(self, step: int, images: Dict[str, np.ndarray]) -> None:
        """TensorBoard image summaries ((N,H,W,C) float [0,1] or uint8)."""
        if self._tb is not None:
            self._tb.write_images(step, images)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def _validate_channels(cfg: ExperimentConfig) -> ExperimentConfig:
    want_in = loader_lib.input_channels(cfg.data)
    want_out = loader_lib.output_channels(cfg.data)
    m = cfg.model
    if m.in_channels != want_in or m.out_channels != want_out:
        m = dataclasses.replace(m, in_channels=want_in, out_channels=want_out)
        cfg = dataclasses.replace(cfg, model=m)
    return cfg


def fit(
    cfg: ExperimentConfig,
    workdir: str | Path,
    shard_dir: Optional[str] = None,
    use_mesh: Optional[bool] = None,
    max_steps: Optional[int] = None,
) -> train_lib.TrainState:
    """Run (or resume) training to cfg.train.steps."""
    cfg = _validate_channels(cfg)
    workdir = Path(workdir)
    workdir.mkdir(parents=True, exist_ok=True)

    shard_dir = shard_dir or cfg.data.shard_dir
    if cfg.data.stats_normalize and not cfg.data.pass_scales:
        # Statistics-driven normalization (SURVEY.md C7→C4): derive the
        # scales from the training corpus stats ONCE and freeze them into
        # the config that is saved below + checkpointed, so resume and
        # inference both encode exactly as training did.
        from deepdenoiser_tpu.data import shards as shards_lib

        meta = shards_lib.ShardMeta.from_json(
            (Path(shard_dir) / "train" / "meta.json").read_text()
        )
        cfg = dataclasses.replace(
            cfg,
            data=dataclasses.replace(
                cfg.data, pass_scales=loader_lib.derive_pass_scales(meta)
            ),
        )
    config_lib.save(cfg, workdir / "config.json")

    tcfg, dcfg, mcfg = cfg.train, cfg.data, cfg.model
    n_dev = len(jax.devices())
    if use_mesh is None:
        use_mesh = tcfg.data_parallel and n_dev > 1
    mesh = mesh_lib.make_mesh(n_dev) if use_mesh else None
    if mesh is not None and dcfg.batch_size % n_dev != 0:
        raise ValueError(
            f"batch_size {dcfg.batch_size} not divisible by {n_dev} devices"
        )

    encode = jax.jit(loader_lib.make_batch_encoder(dcfg))
    step_fn = train_lib.make_train_step(mcfg, tcfg, mesh)
    eval_fn = train_lib.make_full_eval_step(mcfg, dcfg, tcfg.loss, mesh)
    preview_fn = train_lib.make_eval_preview(mcfg, dcfg)

    state = train_lib.create_state(mcfg, tcfg, jax.random.PRNGKey(dcfg.seed),
                                   spatial=dcfg.crop)
    ckpt = CheckpointManager(workdir / tcfg.checkpoint_dir, keep=tcfg.keep_checkpoints)
    train_it = loader_lib.make_iterator(str(Path(shard_dir) / "train"), dcfg,
                                        training=True)

    restored = ckpt.restore_latest(state)
    if restored is not None:
        state, extra = restored
        if "data_iter" in extra:
            train_it.set_state(extra["data_iter"])
        print(f"resumed from step {int(state.step)}", flush=True)
    if mesh is not None:
        # restored/created arrays may be committed to one device;
        # replicate them over the mesh for the sharded step
        state = jax.device_put(state, mesh_lib.replicated(mesh))

    logger = MetricLogger(workdir, "train")
    eval_logger = MetricLogger(workdir, "eval")

    stop = {"now": False}

    def _sigterm(_sig, _frm):
        stop["now"] = True

    old_handler = signal.signal(signal.SIGTERM, _sigterm)

    def save(step_num: int, force: bool = False):
        if ckpt.latest_step() == step_num:
            return  # already saved at this step
        ckpt.save(
            step_num, state,
            extra={"data_iter": train_it.get_state(),
                   "config": config_lib.to_dict(cfg)},
            force=force,
        )

    target = min(tcfg.steps, max_steps) if max_steps else tcfg.steps
    step_num = int(state.step)
    try:
        while step_num < target and not stop["now"]:
            batch = encode(next(train_it))
            if mesh is not None:
                batch = mesh_lib.shard_batch(batch, mesh)
            state, mets = step_fn(state, batch)
            step_num += 1

            if step_num % tcfg.log_every == 0 or step_num == target:
                logger.log(step_num, mets)
            if step_num % tcfg.eval_every == 0 and (Path(shard_dir) / "validation" / "meta.json").exists():
                emets, raw0 = _run_eval(eval_fn, state, shard_dir, dcfg, mesh)
                if emets:
                    eval_logger.log(step_num, emets)
                if raw0 is not None:
                    _log_preview(preview_fn, state, raw0, step_num,
                                 eval_logger, workdir)
            if step_num % tcfg.checkpoint_every == 0:
                save(step_num)
        save(step_num, force=True)
    finally:
        ckpt.wait()
        ckpt.close()
        logger.close()
        eval_logger.close()
        signal.signal(signal.SIGTERM, old_handler)
    if stop["now"]:
        print(f"SIGTERM: saved at step {step_num} and exiting", flush=True)
    return state


def _run_eval(eval_fn, state, shard_dir, dcfg, mesh, max_batches: int = 8):
    """Eval over raw validation batches (encode/decode happen inside the
    jitted eval step). Returns (mean metrics, first raw batch for previews)."""
    agg: Dict[str, list] = {}
    first_raw = None
    ds = loader_lib.make_dataset(str(Path(shard_dir) / "validation"), dcfg,
                                 training=False)
    for i, raw in enumerate(ds):
        if i >= max_batches:
            break
        if raw["source/combined"].shape[0] != dcfg.batch_size:
            break  # static shapes only
        batch = {k: np.asarray(v) for k, v in raw.items()}
        if first_raw is None:
            first_raw = batch
        if mesh is not None:
            batch = mesh_lib.shard_batch(batch, mesh)
        mets = eval_fn(state, batch)
        for k, v in mets.items():
            agg.setdefault(k, []).append(float(v))
    return {k: float(np.mean(v)) for k, v in agg.items()}, first_raw


def _log_preview(preview_fn, state, raw, step, logger: MetricLogger, workdir: Path):
    """noisy | denoised | GT tonemapped strips: one row per example, written
    to TensorBoard (when available) and workdir/previews/ as PNG."""
    from deepdenoiser_tpu.utils import images as img_lib

    noisy, den, gt = (np.asarray(x) for x in preview_fn(state, raw))
    rows = [
        img_lib.side_by_side(
            img_lib.tonemap_srgb(noisy[i]),
            img_lib.tonemap_srgb(den[i]),
            img_lib.tonemap_srgb(gt[i]),
        )
        for i in range(noisy.shape[0])
    ]
    strip = np.concatenate(rows, axis=0)
    logger.log_images(step, {"noisy_denoised_gt": strip[None]})
    img_lib.save_png(workdir / "previews" / f"step_{step:08d}.png", strip)
