"""FC-DenseNet "Tiramisu" backbone (upstream: TensorFlow/Tiramisu.py — SURVEY.md C12).

Dense blocks + transition down/up, the '100-layers Tiramisu' family as the
alternative backbone to the U-Net. Channel-concat dense connectivity is
cheap on TPU (concats fuse into the consuming conv's im2col); transitions
use 1x1 conv + 2x2 avg-pool down and resize-conv up.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List

import jax
import jax.numpy as jnp
from flax import linen as nn

from deepdenoiser_tpu.models import layers
from deepdenoiser_tpu.models.layers import RFState

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class TiramisuSpec:
    growth_rate: int = 16
    layers_per_block: int = 4
    depth: int = 3  # number of transition-downs
    stem_width: int = 48
    kernel: int = 3
    act: str = "relu"
    # 2 = space-to-depth stem (the UNet latency lever applied to the
    # Tiramisu): the whole dense stack runs at half resolution — ~4x fewer
    # full-res conv FLOPs, pixel-shuffle in/out.
    stem_stride: int = 1
    # >0 bounds the up-path concat width: after [upsample, skip] concat, a
    # 1x1 conv compresses to this many channels before the dense block —
    # the r2 roofline found tiramisu inference HBM-bound on dense concats
    # (30.8 GB per 768^2 frame); 1x1 bottlenecks cut the full-res traffic
    # without touching the receptive field (VERDICT r2 item 4).
    up_compress: int = 0

    def rf_state(self, s: RFState = RFState()) -> RFState:
        k, n = self.kernel, self.layers_per_block
        if self.stem_stride == 2:
            s = s.pool(2)  # space-to-depth window
        s = s.conv(k)  # stem
        for _ in range(n):  # entry dense block
            s = s.conv(k)
        for _ in range(self.depth):  # down path
            s = s.pool(2)  # transition down (1x1 conv adds nothing)
            for _ in range(n):
                s = s.conv(k)
        for _ in range(self.depth):  # up path
            s = s.upsample(2).conv(k)  # transition up conv
            for _ in range(n):
                s = s.conv(k)
        if self.stem_stride == 2:
            s = s.upsample(2)  # depth-to-space
        return s

    def receptive_field(self) -> int:
        return self.rf_state().r

    @property
    def spatial_multiple(self) -> int:
        return 2**self.depth * self.stem_stride


class DenseBlock(nn.Module):
    growth_rate: int
    n_layers: int
    kernel: int
    act: str
    dtype: Any
    param_dtype: Any

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """Returns concat of the n_layers new feature maps (not the input)."""
        feats: List[Array] = []
        for _ in range(self.n_layers):
            inp = jnp.concatenate([x] + feats, axis=-1) if feats else x
            y = layers.ConvBlock(
                self.growth_rate, self.kernel, act=self.act,
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(inp)
            feats.append(y)
        return jnp.concatenate(feats, axis=-1)


class Tiramisu(nn.Module):
    spec: TiramisuSpec
    out_channels: int
    head_zero_init: bool = False  # exact-identity start for residual mode
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        spec = self.spec
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        n, h, w, _ = x.shape
        m = spec.spatial_multiple
        assert h % m == 0 and w % m == 0, (
            f"Tiramisu input {h}x{w} must be divisible by {m}; pad tiles first"
        )
        x = x.astype(self.dtype)
        if spec.stem_stride == 2:
            x = layers.space_to_depth(x, 2)

        db = lambda t: DenseBlock(  # noqa: E731
            spec.growth_rate, spec.layers_per_block, spec.kernel, spec.act, **kw
        )(t)

        stem = layers.ConvBlock(spec.stem_width, spec.kernel, act=spec.act, **kw)(x)
        x = jnp.concatenate([stem, db(stem)], axis=-1)

        skips = []
        for _ in range(spec.depth):
            skips.append(x)
            # transition down: 1x1 conv compress + 2x2 avg pool
            x = layers.ConvBlock(x.shape[-1] // 2, 1, act=spec.act, **kw)(x)
            x = layers.avg_downsample(x, 2)
            x = jnp.concatenate([x, db(x)], axis=-1)

        for skip in reversed(skips):
            # transition up: resize-conv to the skip's channel budget / 2
            x = layers.UpSample(
                max(spec.growth_rate * spec.layers_per_block, skip.shape[-1] // 2),
                spec.kernel, spec.act, **kw,
            )(x)
            x = jnp.concatenate([x, skip], axis=-1)
            if spec.up_compress > 0 and x.shape[-1] > spec.up_compress:
                x = layers.ConvBlock(spec.up_compress, 1, act=spec.act, **kw)(x)
            x = jnp.concatenate([x, db(x)], axis=-1)

        head_ch = self.out_channels * (spec.stem_stride**2)
        head_kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.head_zero_init:
            head_kw["kernel_init"] = nn.initializers.zeros
        out = nn.Conv(head_ch, (1, 1), **head_kw)(x)
        if spec.stem_stride == 2:
            out = layers.depth_to_space(out, 2)
        return out.astype(jnp.float32)
