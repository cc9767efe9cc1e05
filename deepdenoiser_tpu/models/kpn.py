"""Kernel-predicting head (upstream: TensorFlow/KernelPrediction.py — SURVEY.md C14).

KPCN-style: instead of regressing radiance directly, the backbone emits
per-pixel k×k filter logits; a softmax normalizes them (guaranteeing the
output is a convex combination of noisy neighbors — unconditionally stable
and energy preserving), and the filter is applied to the noisy signal.

The application is implemented as extract-patches (lax.conv_general_
dilated_patches, which XLA lowers to an efficient im2col on TPU) followed
by an einsum — all MXU/VPU work, no gathers.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


def apply_per_pixel_kernels(noisy: Array, weights: Array, kernel_size: int) -> Array:
    """Filter `noisy` (N,H,W,C) with per-pixel weights (N,H,W,k*k).

    Weights are applied to every channel of `noisy` (one spatial kernel
    shared across channels, as in KPCN).

    Implemented as SHIFT-ACCUMULATE: out = Σ_{dy,dx} shifted(noisy) ⊙
    w[dy,dx] over the zero-padded plane — a static k² loop of fused
    elementwise multiply-adds in fp32. Identical math to im2col+einsum but
    with O(1) extra memory; the previous conv_general_dilated_patches
    formulation materialized an (N,H,W,C·k²) patch tensor (~3.5 GB fp32 for
    a 4-group 1080p stack at k=5) which stalled whole-frame compiles.
    """
    n, h, w, c = noisy.shape
    k = kernel_size
    k2 = k * k
    assert weights.shape == (n, h, w, k2), (weights.shape, (n, h, w, k2))
    pad = k // 2
    # zero padding matches the patch extractor's SAME semantics exactly
    padded = jnp.pad(
        noisy.astype(jnp.float32), ((0, 0), (pad, pad), (pad, pad), (0, 0))
    )
    wf = weights.astype(jnp.float32)
    out = jnp.zeros((n, h, w, c), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            out = out + (
                padded[:, dy : dy + h, dx : dx + w, :]
                * wf[..., dy * k + dx : dy * k + dx + 1]
            )
    return out


class KernelPredictionHead(nn.Module):
    """Wraps a backbone: backbone features → softmax k×k kernels → filter.

    `signal_channels` selects which leading channels of the raw input are
    the noisy signal to filter (the rest are auxiliary features). If the
    signal is a stack of passes (e.g. demod direct + indirect = 6ch), one
    kernel field is predicted per 3-channel slot (`n_slots`).

    `logit_norm` (round-3 stability fix): RMS-normalize the logits over the
    kernel axis and scale by a bounded learned temperature before the
    softmax. Two independent 40k mixed-corpus runs collapsed the same way
    without it: the un-normalized backbone drifted into an activation
    explosion (logits reached ±2.5e12), the softmax saturated exactly
    one-hot in fp32, gradients through the head became exactly zero, and
    the model froze permanently at box-blur/passthrough quality. RMS
    normalization makes the head invariant to backbone activation scale —
    the cliff cannot exist — and the sigmoid-bounded temperature
    (τ ∈ (0, 16), init 3) keeps kernel sharpness learnable without ever
    underflowing the softmax. Off by default so pre-r3 checkpoints (no
    temperature param) keep loading.
    """

    backbone: nn.Module
    kernel_size: int = 5
    n_slots: int = 1
    use_pallas: bool = False  # VMEM filter apply (ops/kpn_pallas.py)
    logit_norm: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    TEMP_MAX = 16.0
    TEMP_INIT = 3.0

    @nn.compact
    def __call__(self, x: Array, signal: Array) -> Array:
        if self.use_pallas:
            from deepdenoiser_tpu.ops.kpn_pallas import (
                apply_per_pixel_kernels_pallas as apply_kernels,
            )
        else:
            apply_kernels = apply_per_pixel_kernels
        k2 = self.kernel_size * self.kernel_size
        feats = self.backbone(x)  # (N,H,W,n_slots*k2) — backbone out_channels must match
        assert feats.shape[-1] == self.n_slots * k2, (
            f"backbone must emit {self.n_slots * k2} channels, got {feats.shape[-1]}"
        )
        assert signal.shape[-1] == 3 * self.n_slots, (
            f"signal must have {3 * self.n_slots} channels, got {signal.shape[-1]}"
        )
        if self.logit_norm:
            # init so sigmoid(t0) * TEMP_MAX == TEMP_INIT
            t0 = float(np.log(self.TEMP_INIT / (self.TEMP_MAX - self.TEMP_INIT)))
            t_raw = self.param(
                "kernel_temp",
                nn.initializers.constant(t0),
                (self.n_slots,),
                jnp.float32,
            )
            taus = self.TEMP_MAX * jax.nn.sigmoid(t_raw)
        outs = []
        for s in range(self.n_slots):
            logits = feats[..., s * k2 : (s + 1) * k2].astype(jnp.float32)
            if self.logit_norm:
                rms = jnp.sqrt(jnp.mean(logits * logits, axis=-1, keepdims=True) + 1e-8)
                logits = logits / rms * taus[s]
            weights = jax.nn.softmax(logits, axis=-1)
            outs.append(
                apply_kernels(
                    signal[..., 3 * s : 3 * (s + 1)].astype(jnp.float32),
                    weights,
                    self.kernel_size,
                )
            )
        return jnp.concatenate(outs, axis=-1)


def kpn_receptive_field(backbone_rf: int, kernel_size: int) -> int:
    return backbone_rf + kernel_size - 1
