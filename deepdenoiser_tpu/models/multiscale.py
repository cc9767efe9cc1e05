"""Multi-scale prediction wrapper (upstream: TensorFlow/MultiScalePrediction.py — SURVEY.md C13).

Builds an input pyramid (2x average-pool per scale), runs the backbone
with SHARED weights at every scale, and composes coarse→fine: the coarse
prediction replaces the low-frequency band of the finer one,

    out_s = pred_s + up(out_{s+1} - down(pred_s))

so large-radius noise (low-frequency MC blotches) is corrected by the
coarse scales while fine scales keep detail — `compose_scales` in the
reference. Weight sharing keeps the parameter count flat and lets one
compiled backbone serve all scales.
"""

from __future__ import annotations

from typing import List

import jax
from flax import linen as nn

from deepdenoiser_tpu.models import layers

Array = jax.Array


def compose_scales(fine_pred: Array, coarse_out: Array) -> Array:
    """fine + up(coarse - down(fine)): swap in the coarse low band."""
    down_fine = layers.avg_downsample(fine_pred, 2)
    return fine_pred + layers.nearest_upsample(coarse_out - down_fine, 2)


class MultiScale(nn.Module):
    """Runs `backbone` over an n_scales pyramid with shared weights.

    return_scales=True returns the COMPOSED output at every scale,
    finest→coarsest — the per-scale supervision targets (r2 diagnosed the
    trained multiscale as worse-than-noisy; upstream supervises each
    scale's composed output, not just the finest — VERDICT r2 item 2)."""

    backbone: nn.Module
    n_scales: int = 3

    @nn.compact
    def __call__(self, x: Array, return_scales: bool = False):
        assert self.n_scales >= 1
        pyramid: List[Array] = [x]
        for _ in range(self.n_scales - 1):
            pyramid.append(layers.avg_downsample(pyramid[-1], 2))

        # Shared-weight backbone: instantiate once, call per scale.
        preds = [self.backbone(lvl) for lvl in pyramid]

        out = preds[-1]
        composed = [out]  # coarsest first
        for s in range(self.n_scales - 2, -1, -1):
            out = compose_scales(preds[s], out)
            composed.append(out)
        if return_scales:
            return composed[::-1]  # finest -> coarsest
        return out


def multiscale_rf_state(backbone_rf_fn, n_scales: int, s=None):
    """Per-side RF bounds of the multi-scale composition.

    `backbone_rf_fn(state) -> state` applies the backbone's ops. Scale i's
    path: i pyramid avg-pools → backbone → i nearest-upsamples back; the
    compose step additionally passes every non-coarsest prediction through
    one extra pool+upsample (the `down(fine)` correction term). Paths merge
    by per-side max.
    """
    from deepdenoiser_tpu.models.layers import RFState

    if s is None:
        s = RFState()
    total = None
    for i in range(n_scales):
        p = s
        for _ in range(i):
            p = p.pool(2)
        p = backbone_rf_fn(p)
        for _ in range(i):
            p = p.upsample(2)
        if i < n_scales - 1:  # compose_scales' down→up of the fine pred
            p = p.pool(2).upsample(2)
        total = p if total is None else total.max_with(p)
    return total


def multiscale_receptive_field(backbone_rf: int, n_scales: int) -> int:
    """Scalar convenience bound (use multiscale_rf_state for halo sizing)."""
    f = 2 ** (n_scales - 1)
    return (backbone_rf - 1) * f + 2 * f


def multiscale_spatial_multiple(backbone_multiple: int, n_scales: int) -> int:
    return backbone_multiple * 2 ** (n_scales - 1)
