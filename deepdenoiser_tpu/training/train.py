"""Jitted train/eval steps with data-parallel gradient allreduce.

TPU-native rebuild of the reference's estimator loop (upstream:
TensorFlow/DeepDenoiser.py model_fn/train_and_evaluate — SURVEY.md C16):
the whole step — forward, backward, cross-chip gradient pmean, Adam update,
EMA — is ONE compiled XLA program with donated buffers; the host only feeds
batches and reads scalar metrics (SURVEY.md §3.1 "rebuild equivalent").

DP runs through shard_map over a 1-D 'data' mesh: batch sharded, params
replicated, `jax.lax.pmean` emitting the ICI allreduce (BASELINE config #4).
The same step function works unsharded on one chip (mesh=None).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from deepdenoiser_tpu.config import TrainConfig
from deepdenoiser_tpu.models import factory
from deepdenoiser_tpu.models.factory import ModelConfig
from deepdenoiser_tpu.ops import losses, metrics

Array = jax.Array
Batch = Dict[str, Array]  # {'x': (N,H,W,Cin), 'y': (N,H,W,Cout)}


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    opt_state: Any
    ema_params: Any  # None when EMA disabled


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.learning_rate,
            warmup_steps=cfg.warmup_steps,
            decay_steps=max(cfg.steps, cfg.warmup_steps + 1),
        )
    elif cfg.schedule == "constant":
        sched = optax.join_schedules(
            [
                optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps),
                optax.constant_schedule(cfg.learning_rate),
            ],
            [cfg.warmup_steps],
        )
    else:
        raise ValueError(f"unknown schedule {cfg.schedule!r}")
    chain = []
    if cfg.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if cfg.weight_decay > 0:
        chain.append(
            optax.adamw(sched, b1=cfg.beta1, b2=cfg.beta2, weight_decay=cfg.weight_decay)
        )
    else:
        chain.append(optax.adam(sched, b1=cfg.beta1, b2=cfg.beta2))
    return optax.chain(*chain)


def create_state(
    model_cfg: ModelConfig, train_cfg: TrainConfig, rng: jax.Array, spatial: int = 64
) -> TrainState:
    params = factory.init_params(model_cfg, rng, spatial=spatial)
    tx = make_optimizer(train_cfg)
    opt_state = tx.init(params)
    # EMA starts as a COPY (donation would alias the same buffer twice)
    ema = jax.tree.map(jnp.copy, params) if train_cfg.ema_decay > 0 else None
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state, ema_params=ema
    )


def _loss_and_metrics(
    model_apply: Callable,
    loss_cfg: losses.LossConfig,
    params,
    batch: Batch,
    scale_weight: float = 0.0,
    distill_weight: float = 0.0,
) -> Tuple[Array, Dict[str, Array]]:
    mask = batch.get("mask")
    if scale_weight > 0.0:
        # Per-scale supervision (SURVEY.md C13): the model returns composed
        # outputs finest->coarsest; each coarse scale is scored against the
        # avg-downsampled target (masks broadcast across space unchanged).
        from deepdenoiser_tpu.models import layers as layers_lib

        outs = model_apply(params, batch["x"], return_scales=True)
        pred = outs[0]
        loss = losses.pass_loss(loss_cfg, pred, batch["y"], mask)
        tgt = batch["y"]
        extra = jnp.zeros((), jnp.float32)
        for o in outs[1:]:
            tgt = layers_lib.avg_downsample(tgt, 2)
            extra = extra + losses.pass_loss(loss_cfg, o, tgt, mask)
        loss = loss + scale_weight * extra / max(len(outs) - 1, 1)
    else:
        pred = model_apply(params, batch["x"])
        loss = losses.pass_loss(loss_cfg, pred, batch["y"], mask)
    if distill_weight > 0.0 and "y_teacher" in batch:
        # Knowledge distillation: blend the ground-truth loss with a loss
        # against a frozen teacher's prediction on the SAME noisy input
        # (teacher forward runs outside this step — the batch carries it).
        loss = (1.0 - distill_weight) * loss + distill_weight * losses.pass_loss(
            loss_cfg, pred, batch["y_teacher"], mask
        )
    mets = {
        "loss": loss,
        "psnr_encoded": metrics.psnr(pred, batch["y"], data_range=4.0),
    }
    return loss, mets


def _apply_update(
    tx: optax.GradientTransformation,
    ema_decay: float,
    state: TrainState,
    grads,
    mets: Dict[str, Array],
) -> Tuple[TrainState, Dict[str, Array]]:
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_ema = state.ema_params
    if new_ema is not None:
        new_ema = jax.tree.map(
            lambda e, p: e * ema_decay + p * (1.0 - ema_decay), new_ema, new_params
        )
    mets = dict(mets)
    mets["grad_norm"] = optax.global_norm(grads)
    new_state = TrainState(
        step=state.step + 1, params=new_params, opt_state=new_opt, ema_params=new_ema
    )
    return new_state, mets


def make_train_step(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    mesh: Optional[Mesh] = None,
) -> Callable[[TrainState, Batch], Tuple[TrainState, Dict[str, Array]]]:
    """Build the jitted train step. With a mesh, the batch is consumed
    sharded over 'data' and gradients are pmean'ed across chips inside the
    compiled program (the XLA allreduce rides ICI)."""
    model = factory.build_model(model_cfg)
    tx = make_optimizer(train_cfg)
    loss_cfg = train_cfg.loss
    scale_w = (
        train_cfg.scale_supervision_weight if model_cfg.n_scales > 1 else 0.0
    )
    distill_w = train_cfg.distill_weight

    def local_step(state: TrainState, batch: Batch, axis: Optional[str]):
        (loss, mets), grads = jax.value_and_grad(
            lambda p: _loss_and_metrics(
                model.apply, loss_cfg, p, batch, scale_w, distill_w
            ),
            has_aux=True,
        )(state.params)
        if axis is not None:
            grads = jax.lax.pmean(grads, axis)
            mets = jax.lax.pmean(mets, axis)
        return _apply_update(tx, train_cfg.ema_decay, state, grads, mets)

    if mesh is None:
        return jax.jit(
            functools.partial(local_step, axis=None), donate_argnums=(0,)
        )

    sharded = jax.shard_map(
        functools.partial(local_step, axis="data"),
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_full_eval_step(
    model_cfg: ModelConfig,
    data_cfg,
    loss_cfg: losses.LossConfig,
    mesh: Optional[Mesh] = None,
):
    """Jitted eval over RAW batches, for BOTH raw and EMA params (prefix
    'ema_'): encoded-space loss/PSNR plus TONEMAPPED PSNR/SSIM of the
    decoded+recomposed prediction — the same quality numbers the inference
    side reports, so training-time tracking is directly comparable
    (upstream analogue: estimator eval metrics — SURVEY.md §5).
    'noisy_psnr_tm' (input vs GT) anchors the gain."""
    from deepdenoiser_tpu.data import loader as loader_lib

    model = factory.build_model(model_cfg)
    encode = loader_lib.make_batch_encoder(data_cfg)
    decode = loader_lib.make_eval_decoder(data_cfg)
    tm = metrics.tonemap_for_metrics

    def local_eval(state: TrainState, raw: Batch, axis: Optional[str]):
        batch = encode(raw)
        mets: Dict[str, Array] = {}
        ref_rgb = noisy_rgb = None
        for prefix, params in (("", state.params), ("ema_", state.ema_params)):
            if params is None:
                continue
            pred = model.apply(params, batch["x"])
            mets[prefix + "loss"] = losses.pass_loss(
                loss_cfg, pred, batch["y"], batch.get("mask")
            )
            mets[prefix + "psnr_encoded"] = metrics.psnr(
                pred, batch["y"], data_range=4.0
            )
            pred_rgb, ref_rgb, noisy_rgb = decode(raw, pred)
            mets[prefix + "psnr_tm"] = metrics.psnr(tm(pred_rgb), tm(ref_rgb))
            mets[prefix + "ssim_tm"] = metrics.ssim(tm(pred_rgb), tm(ref_rgb)).mean()
        mets["noisy_psnr_tm"] = metrics.psnr(tm(noisy_rgb), tm(ref_rgb))
        if axis is not None:
            mets = jax.lax.pmean(mets, axis)
        return mets

    if mesh is None:
        return jax.jit(functools.partial(local_eval, axis=None))
    sharded = jax.shard_map(
        functools.partial(local_eval, axis="data"),
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_eval_preview(model_cfg: ModelConfig, data_cfg, max_images: int = 4):
    """Jitted fn(state, raw_batch) -> (noisy_rgb, denoised_rgb, gt_rgb) for
    the first max_images examples — EMA params when kept. Feeds the
    TensorBoard noisy|denoised|GT image strips (SURVEY.md §5: the reference
    estimator emitted image summaries)."""
    from deepdenoiser_tpu.data import loader as loader_lib

    model = factory.build_model(model_cfg)
    encode = loader_lib.make_batch_encoder(data_cfg)
    decode = loader_lib.make_eval_decoder(data_cfg)

    @jax.jit
    def preview(state: TrainState, raw: Batch):
        batch = encode(raw)
        params = state.ema_params if state.ema_params is not None else state.params
        pred = model.apply(params, batch["x"])
        pred_rgb, ref_rgb, noisy_rgb = decode(raw, pred)
        k = min(max_images, pred_rgb.shape[0])
        return noisy_rgb[:k], pred_rgb[:k], ref_rgb[:k]

    return preview


def make_eval_step(
    model_cfg: ModelConfig,
    loss_cfg: losses.LossConfig,
    mesh: Optional[Mesh] = None,
    use_ema: bool = False,
):
    """Jitted eval step: loss + encoded-space PSNR, averaged across chips."""
    model = factory.build_model(model_cfg)

    def local_eval(state: TrainState, batch: Batch, axis: Optional[str]):
        params = state.ema_params if (use_ema and state.ema_params is not None) else state.params
        _, mets = _loss_and_metrics(model.apply, loss_cfg, params, batch)
        if axis is not None:
            mets = jax.lax.pmean(mets, axis)
        return mets

    if mesh is None:
        return jax.jit(functools.partial(local_eval, axis=None))
    sharded = jax.shard_map(
        functools.partial(local_eval, axis="data"),
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)
