"""Loss library (upstream: TensorFlow/LossDifference.py — SURVEY.md C15).

The reference's LossDifferenceEnum family: L1 / L2 / SMAPE-style relative
error, composed per pass with optional finite-difference gradient terms and
MS-SSIM mixing, maskable by feature flags. All pure functions over NHWC
arrays; fp32 accumulation regardless of model compute dtype.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from deepdenoiser_tpu.ops import metrics

Array = jax.Array


class LossKind(str, enum.Enum):
    L1 = "l1"
    L2 = "l2"
    SMAPE = "smape"
    HUBER = "huber"


def difference(kind: LossKind | str, pred: Array, target: Array, eps: float = 1e-2) -> Array:
    """Elementwise difference map (no reduction)."""
    kind = LossKind(kind)
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    if kind is LossKind.L1:
        return jnp.abs(p - t)
    if kind is LossKind.L2:
        return (p - t) ** 2
    if kind is LossKind.SMAPE:
        return jnp.abs(p - t) / (jnp.abs(p) + jnp.abs(t) + eps)
    if kind is LossKind.HUBER:
        d = jnp.abs(p - t)
        return jnp.where(d <= 1.0, 0.5 * d * d, d - 0.5)
    raise ValueError(kind)


def _spatial_gradients(x: Array) -> Tuple[Array, Array]:
    """Forward differences along H and W (NHWC), zero-padded at the edge so
    shapes stay static."""
    dy = jnp.pad(x[:, 1:] - x[:, :-1], ((0, 0), (0, 1), (0, 0), (0, 0)))
    dx = jnp.pad(x[:, :, 1:] - x[:, :, :-1], ((0, 0), (0, 0), (0, 1), (0, 0)))
    return dy, dx


def gradient_difference(kind: LossKind | str, pred: Array, target: Array) -> Array:
    """Mean difference of spatial gradients — the reference's 'variation'
    term; sharpens edges the plain photometric losses blur."""
    pdy, pdx = _spatial_gradients(pred.astype(jnp.float32))
    tdy, tdx = _spatial_gradients(target.astype(jnp.float32))
    return difference(kind, pdy, tdy) + difference(kind, pdx, tdx)


@dataclasses.dataclass(frozen=True)
class LossConfig:
    kind: str = "smape"
    gradient_weight: float = 0.5
    gradient_kind: str = "l1"
    ms_ssim_weight: float = 0.0  # >0 mixes in (1 - MS-SSIM); needs >=176px crops at 5 scales
    ms_ssim_scales: int = 3
    eps: float = 1e-2


def pass_loss(
    cfg: LossConfig,
    pred: Array,
    target: Array,
    mask: Optional[Array] = None,
) -> Array:
    """Scalar loss for one predicted pass (NHWC). `mask` (N,1,1,1 or NHW1)
    zeroes examples/pixels whose pass is absent (feature flags, C3)."""
    diff = difference(cfg.kind, pred, target, cfg.eps)
    if cfg.gradient_weight > 0:
        diff = diff + cfg.gradient_weight * gradient_difference(
            cfg.gradient_kind, pred, target
        )
    if mask is not None:
        diff = diff * mask
        denom = jnp.maximum(jnp.broadcast_to(mask, diff.shape).sum(), 1.0)
        total = diff.sum() / denom
    else:
        total = diff.mean()

    if cfg.ms_ssim_weight > 0:
        tm_p = metrics.tonemap_for_metrics(pred)
        tm_t = metrics.tonemap_for_metrics(target)
        ms = metrics.ms_ssim(tm_p, tm_t, n_scales=cfg.ms_ssim_scales).mean()
        total = total + cfg.ms_ssim_weight * (1.0 - ms)
    return total


def multi_pass_loss(
    cfg: LossConfig,
    preds: Mapping[str, Array],
    targets: Mapping[str, Array],
    weights: Optional[Mapping[str, float]] = None,
    masks: Optional[Mapping[str, Array]] = None,
) -> Tuple[Array, Dict[str, Array]]:
    """Weighted sum of per-pass losses. Returns (total, per-pass scalars)."""
    per_pass: Dict[str, Array] = {}
    total = jnp.zeros((), jnp.float32)
    for name, pred in preds.items():
        w = float(weights.get(name, 1.0)) if weights else 1.0
        mask = masks.get(name) if masks else None
        lp = pass_loss(cfg, pred, targets[name], mask)
        per_pass[name] = lp
        total = total + w * lp
    return total, per_pass
