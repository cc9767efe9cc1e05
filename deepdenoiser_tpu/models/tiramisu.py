"""FC-DenseNet "Tiramisu" backbone (upstream: TensorFlow/Tiramisu.py — SURVEY.md C12).

Dense blocks + transition down/up, the '100-layers Tiramisu' family as the
alternative backbone to the U-Net. Dense connectivity is CONCAT-FREE on
TPU: feature maps flow as tuples and every conv applies its kernel split
along input channels (layers._ManualConv) — numerically identical to the
channel concatenate with the identical param tree, but the quadratically
many concat materializations (the r2 roofline's diagnosed HBM bottleneck,
30.8 GB per 768^2 frame) never hit HBM. Transitions use 1x1 conv +
2x2 avg-pool down and sub-pixel resize-conv up.
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
    # Flow features as tuples + kernel-split convs instead of channel
    # concats (identical math & param tree either way). MEASURED SLOWER on
    # v5e for the dense stack — tiramisu-fast 1080p: 191.9 ms concat-free
    # vs 153.8 ms with concats — because splitting a dense layer's conv
    # into many narrow (16-ch) convs starves the 128-lane MXU, while XLA
    # fuses the concat into the consumer conv's im2col anyway. Kept as a
    # measured A/B switch; contrast with the UNet decoder where ONE wide
    # concat per level made the split a win (models/unet.py).
    concat_free: bool = False
    # Middle ground: each dense layer consumes (base, concat(feats)) as a
    # 2-tuple — the WIDE block input is never re-copied into the
    # per-layer concats while the narrow grown features still concatenate
    # for MXU lane width. Identical math and param tree. ALSO measured
    # slower on v5e (tiramisu-fast 1080p: 158.7 vs 153.3 ms) — XLA already
    # fuses these concats well; splitting only fragments the convs.
    dense_base_split: bool = False
    # >0: dense-layer count for the two FULL-RESOLUTION blocks only (the
    # entry block and the last up-path block); the coarser blocks keep
    # layers_per_block. At 1080p the full-res convs dominate the frame
    # time while the coarse scales are nearly free, so thinning only the
    # top level buys latency at minimal capacity loss (r3 latency sweep).
    layers_top: int = 0

    @property
    def _layers_top(self) -> int:
        return self.layers_top or self.layers_per_block

    def rf_state(self, s: RFState = RFState()) -> RFState:
        k, n = self.kernel, self.layers_per_block
        if self.stem_stride == 2:
            s = s.pool(2)  # space-to-depth window
        s = s.conv(k)  # stem
        for _ in range(self._layers_top):  # entry dense block (full res)
            s = s.conv(k)
        for _ in range(self.depth):  # down path
            s = s.pool(2)  # transition down (1x1 conv adds nothing)
            for _ in range(n):
                s = s.conv(k)
        for i in range(self.depth):  # up path (coarse -> fine)
            s = s.upsample(2).conv(k)  # transition up conv
            n_here = self._layers_top if i == self.depth - 1 else n
            for _ in range(n_here):
                s = s.conv(k)
        if self.stem_stride == 2:
            s = s.upsample(2)  # depth-to-space
        return s

    def receptive_field(self) -> int:
        return self.rf_state().r

    @property
    def spatial_multiple(self) -> int:
        return 2**self.depth * self.stem_stride


def _channels(x) -> int:
    """Channel count of a tensor or of a tuple's virtual concatenation."""
    if isinstance(x, jax.Array):
        return int(x.shape[-1])
    return sum(int(t.shape[-1]) for t in x)


def _join(concat_free: bool, *parts):
    """Dense-connectivity join: a tuple (kernel-split consumption, no
    concat buffer) or a real channel concat — numerically identical."""
    flat: List[Array] = []
    for p in parts:
        flat.extend(p) if isinstance(p, tuple) else flat.append(p)
    if concat_free:
        return tuple(flat)
    return flat[0] if len(flat) == 1 else jnp.concatenate(flat, axis=-1)


class DenseBlock(nn.Module):
    growth_rate: int
    n_layers: int
    kernel: int
    act: str
    dtype: Any
    param_dtype: Any
    concat_free: bool = False
    base_split: bool = False  # TiramisuSpec.dense_base_split

    @nn.compact
    def __call__(self, x):
        """Returns the n_layers new feature maps joined (not the input).

        Each layer consumes (x, f_1, .., f_{i-1}); with `concat_free` the
        join is a tuple consumed via ConvBlock's kernel split — identical
        math and param tree as concatenating (see TiramisuSpec.concat_free
        for the v5e measurement). With `base_split`, only the wide base
        `x` is split out; the grown features still concatenate."""
        feats: List[Array] = []
        base_split = self.base_split and not self.concat_free
        base = (x,) if isinstance(x, jax.Array) else tuple(x)
        for i in range(self.n_layers):
            if base_split:
                inp = base if i == 0 else base + (_join(False, *feats),)
            else:
                inp = _join(self.concat_free, x, *feats)
            y = layers.ConvBlock(
                self.growth_rate, self.kernel, act=self.act,
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(inp)
            feats.append(y)
        return _join(self.concat_free, *feats)


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

        db = lambda t, n_layers=spec.layers_per_block: DenseBlock(  # noqa: E731
            spec.growth_rate, n_layers, spec.kernel, spec.act,
            **kw, concat_free=spec.concat_free,
            base_split=spec.dense_base_split,
        )(t)

        # With spec.concat_free, feature maps flow as tuples below — every
        # jnp.concatenate the dense connectivity implies is applied
        # virtually inside the next conv's kernel split
        # (layers._ManualConv): identical function and param tree.
        # `tj` joins at block boundaries: tuple when EITHER tuple mode is
        # on (dense_base_split keeps block outputs as (base.., feats)
        # 2-tuples so the wide base is never recopied; convs consume
        # tuples via kernel split either way).
        cf = spec.concat_free
        tj = cf or spec.dense_base_split
        stem = layers.ConvBlock(spec.stem_width, spec.kernel, act=spec.act, **kw)(x)
        x = _join(tj, stem, db(stem, spec._layers_top))

        skips = []
        for _ in range(spec.depth):
            skips.append(x)
            # transition down: 1x1 conv compress + 2x2 avg pool
            x = layers.ConvBlock(_channels(x) // 2, 1, act=spec.act, **kw)(x)
            x = layers.avg_downsample(x, 2)
            x = _join(tj, x, db(x))

        for level, skip in enumerate(reversed(skips)):
            # transition up: resize-conv to the skip's channel budget / 2
            up = layers.UpSample(
                max(spec.growth_rate * spec.layers_per_block, _channels(skip) // 2),
                spec.kernel, spec.act, **kw,
            )(x)
            x = _join(tj, up, skip)
            if spec.up_compress > 0 and _channels(x) > spec.up_compress:
                x = layers.ConvBlock(spec.up_compress, 1, act=spec.act, **kw)(x)
            n_here = (
                spec._layers_top if level == spec.depth - 1
                else spec.layers_per_block
            )
            x = _join(tj, x, db(x, n_here))

        head_ch = self.out_channels * (spec.stem_stride**2)
        head_kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.head_zero_init:
            head_kw["kernel_init"] = nn.initializers.zeros
        out = layers._ManualConv(head_ch, 1, name="Conv_0", **head_kw)(x)
        if spec.stem_stride == 2:
            out = layers.depth_to_space(out, 2)
        return out.astype(jnp.float32)
