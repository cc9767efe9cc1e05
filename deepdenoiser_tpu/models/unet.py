"""U-Net backbone (upstream: TensorFlow/UNet.py — SURVEY.md C11).

Encoder/decoder with skip connections; configurable depth/width/activation.
NHWC, bf16-capable, stride-2 conv down / resize-conv up so every FLOP-heavy
op lands on the MXU. Spatial dims must be divisible by 2**depth (the tiling
engine pads tiles to satisfy this — static shapes, no dynamic padding).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from deepdenoiser_tpu.models import layers
from deepdenoiser_tpu.models.layers import RFState

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class UNetSpec:
    base_width: int = 64
    depth: int = 3  # number of downsamplings
    convs_per_level: int = 2
    kernel: int = 3
    act: str = "relu"
    width_growth: float = 2.0  # channel multiplier per level
    max_width: int = 512
    # 2 = space-to-depth stem: the entire net runs at half resolution
    # (pixel-shuffle in/out). Quarter the activation HBM traffic and 4x the
    # stem's MXU input channels — the key latency lever on v5e.
    stem_stride: int = 1
    # rematerialize conv stacks in the backward pass (jax.checkpoint):
    # trades ~1/3 more FLOPs for O(depth) less live activation memory —
    # enables large-crop / full-frame training.
    remat: bool = False

    def width(self, level: int) -> int:
        return min(int(self.base_width * self.width_growth**level), self.max_width)

    def rf_state(self, s: RFState = RFState()) -> RFState:
        """Per-side RF bounds of the deepest encoder→bottleneck→decoder path
        (the widest path; skip paths are subsets of it)."""
        if self.stem_stride == 2:
            s = s.pool(2)  # space-to-depth: window [2p, 2p+1]
        for _ in range(self.convs_per_level):  # stem level
            s = s.conv(self.kernel)
        for _ in range(self.depth):  # encoder
            s = s.down_conv(self.kernel)  # DownSample (stride-2, XLA SAME)
            for _ in range(self.convs_per_level):
                s = s.conv(self.kernel)
        for _ in range(self.depth):  # decoder
            s = s.upsample(2).conv(self.kernel)  # UpSample conv
            for _ in range(self.convs_per_level):
                s = s.conv(self.kernel)
        if self.stem_stride == 2:
            s = s.upsample(2)  # depth-to-space
        return s

    def receptive_field(self) -> int:
        return self.rf_state().r

    @property
    def spatial_multiple(self) -> int:
        return 2**self.depth * self.stem_stride


class UNet(nn.Module):
    """features-in → out_channels-out U-Net. Output layer is linear.

    head_zero_init: start the head at exactly zero — with residual
    prediction the model begins as the identity and learns corrections
    smoothly (avoids the early collapse where the fastest loss reduction
    is killing the random output through saturated activations).
    """

    spec: UNetSpec
    out_channels: int
    head_zero_init: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        spec = self.spec
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        n, h, w, _ = x.shape
        m = spec.spatial_multiple
        assert h % m == 0 and w % m == 0, (
            f"UNet input {h}x{w} must be divisible by {m}; pad tiles first"
        )

        x = x.astype(self.dtype)
        if spec.stem_stride == 2:
            x = layers.space_to_depth(x, 2)
        # Explicit names keep the param tree IDENTICAL with remat on or off
        # (nn.remat would otherwise rename scopes to remat(Checkpoint...)),
        # so checkpoints transfer freely between memory modes.
        StackCls = nn.remat(layers.ConvStack) if spec.remat else layers.ConvStack
        stack_idx = 0

        def stack(t, width):
            nonlocal stack_idx
            t = StackCls(
                width, spec.convs_per_level, spec.kernel, spec.act, **kw,
                name=f"ConvStack_{stack_idx}",
            )(t)
            stack_idx += 1
            return t

        # Stem
        x = stack(x, spec.width(0))

        # Encoder
        skips = []
        for level in range(1, spec.depth + 1):
            skips.append(x)
            x = layers.DownSample(spec.width(level), spec.kernel, spec.act, **kw)(x)
            x = stack(x, spec.width(level))

        # Decoder. The skip join is concat-FREE: the stack's first conv
        # applies its kernel split along input channels (identical math;
        # a channel concat at sub-128-lane offsets lowers to full-res
        # iota/select masking on TPU — see layers._ManualConv).
        for level in range(spec.depth - 1, -1, -1):
            x = layers.UpSample(spec.width(level), spec.kernel, spec.act, **kw)(x)
            x = stack((x, skips[level]), spec.width(level))

        # Linear head, fp32 output for stable losses/inverse-transforms
        head_ch = self.out_channels * (spec.stem_stride**2)
        head_kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.head_zero_init:
            head_kw["kernel_init"] = nn.initializers.zeros
        out = nn.Conv(head_ch, (1, 1), **head_kw)(x)
        if spec.stem_stride == 2:
            out = layers.depth_to_space(out, 2)
        return out.astype(jnp.float32)
