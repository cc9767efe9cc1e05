"""Shared conv building blocks (upstream: TensorFlow/Conv2dUtilities.py — SURVEY.md C10).

Everything is NHWC (the TPU-native conv layout), supports a bfloat16
compute dtype with float32 params, and uses ops XLA fuses well:
conv + bias + activation chains, stride-2 convs for downsampling, and
nearest-resize + conv for upsampling (no transposed-conv checkerboard,
and resize lowers to a cheap gather on TPU).

Receptive-field accounting: every block exposes its (kernel, stride)
footprint through the `rf` helpers so architectures can compute their
exact receptive field analytically — the tiling engine (inference/tiled.py)
derives halo widths from it, making the seam-free guarantee provable
instead of eyeballed (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import dataclasses
import math
from fractions import Fraction
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array
Dtype = Any

ACTIVATIONS: dict[str, Callable[[Array], Array]] = {
    "relu": nn.relu,
    # NOTE: the iota/select_n ops traffic_breakdown attributes to this
    # where-based lowering are fully fused on TPU — replacing it with the
    # exactly-equal max(x, 0.2x) measured latency-neutral at 1080p.
    "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.2),
    "elu": nn.elu,
    "gelu": nn.gelu,
    "silu": nn.silu,
    "none": lambda x: x,
}


def activation(name: str) -> Callable[[Array], Array]:
    try:
        return ACTIVATIONS[name]
    except KeyError as e:
        raise KeyError(f"unknown activation {name!r}; known: {sorted(ACTIVATIONS)}") from e


# ---------------------------------------------------------------------------
# Receptive-field algebra
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RFState:
    """Certified per-side receptive-field bounds along one spatial axis.

    An output pixel p depends on input pixels within [a*p - bl, a*p + br]
    where `a` is the coordinate scale (jump). We compose ops with interval
    arithmetic, using the EXACT padding conventions of this codebase:

      conv(k) stride 1, SAME, odd k  -> centered window, ±(k-1)/2 * a
      down_conv(k) stride 2, SAME    -> XLA pads low=pad_total//2; for even
                                        inputs and k=3 pad_total=1 so the
                                        window is [2p, 2p+2]: RIGHT-reaching
      pool2 (reshape-mean, k=s=2)    -> window [2p, 2p+1]: right-reaching
      upsample2 (nearest, floor p/2) -> LEFT-biased by up to one new pixel

    The asymmetry is real (measured in tests/test_models.py) — a centered
    r/2 halo under-covers one side and seams appear. Halo sizing must use
    max(bl, br), which `halo` provides.

    Fractions keep the arithmetic exact until the final ceil.
    """

    a: Fraction = Fraction(1)
    bl: Fraction = Fraction(0)
    br: Fraction = Fraction(0)

    def conv(self, kernel: int, stride: int = 1) -> "RFState":
        if stride == 1:
            assert kernel % 2 == 1, "stride-1 convs assumed odd (SAME centered)"
            d = Fraction(kernel - 1, 2) * self.a
            return RFState(self.a, self.bl + d, self.br + d)
        if stride == 2:
            return self.down_conv(kernel)
        raise NotImplementedError(f"stride {stride}")

    def down_conv(self, kernel: int) -> "RFState":
        # XLA SAME, stride 2, even input: pad_low = (k-2)//2, window
        # [2p - pad_low, 2p - pad_low + k - 1].
        pad_low = (kernel - 2) // 2
        lo = -pad_low
        hi = kernel - 1 - pad_low
        return RFState(
            self.a * 2, self.bl - lo * self.a, self.br + hi * self.a
        )

    def pool(self, kernel: int, stride: Optional[int] = None) -> "RFState":
        s = stride if stride is not None else kernel
        assert s == kernel == 2, "only 2x2/2 pooling used"
        # reshape-mean window [2p, 2p+1]
        return RFState(self.a * 2, self.bl, self.br + self.a)

    def upsample(self, factor: int) -> "RFState":
        assert factor == 2, "only 2x nearest upsampling used"
        # q = floor(p/2) in [(p-1)/2, p/2]
        a2 = self.a / 2
        return RFState(a2, self.bl + a2, self.br)

    def max_with(self, other: "RFState") -> "RFState":
        """Combine parallel paths (skip connections / pyramid scales)."""
        return RFState(self.a, max(self.bl, other.bl), max(self.br, other.br))

    @property
    def r(self) -> int:
        """Total receptive-field span in input pixels."""
        return math.ceil(self.bl + self.br) + 1

    @property
    def halo(self) -> int:
        """Certified one-sided halo (input pixels) for seam-free tiling."""
        return math.ceil(max(self.bl, self.br))


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


class _ManualConv(nn.Module):
    """nn.Conv twin with the SAME param tree (scope/"kernel"/"bias", same
    shapes and initializers) but explicit lax application, so callers can
    transform how the kernel is applied without touching checkpoints.

    Modes (all numerically equal to the nn.Conv they replace):
      * split input pair: conv(concat(a, b), K) == conv(a, K[:, :, :Ca])
        + conv(b, K[:, :, Ca:]) — removes the channel concatenate, whose
        sub-128-lane offsets XLA lowers to iota/select masking passes over
        full-resolution tensors (measured 40 GB/frame on the stride-1 UNet,
        10x the conv bytes; tools/traffic_breakdown.py).
      * subpixel x2 ("resize-conv" as sub-pixel conv): nearest-up(2) then
        3x3 SAME conv == 3x3 SAME conv AT LOW RES emitting 4F channels
        (sub-kernels K_r[s] = sum_t [floor((r+t-1)/2)==s] K[t] per axis)
        followed by depth_to_space — all heavy work at quarter resolution,
        and the 6-D broadcast layout the naive resize materializes never
        exists. Exact incl. zero-SAME boundaries.
    """

    features: int
    kernel: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, xs, subpixel: bool = False) -> Array:
        xs = (xs,) if isinstance(xs, jax.Array) else tuple(xs)
        in_ch = sum(int(x.shape[-1]) for x in xs)
        k = self.kernel
        kern = self.param(
            "kernel",
            self.kernel_init,
            (k, k, in_ch, self.features),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            self.param_dtype,
        )
        dt = self.dtype
        xs = tuple(x.astype(dt) for x in xs)
        kern = kern.astype(dt)

        def conv(x, kk):
            return jax.lax.conv_general_dilated(
                x, kk, (self.stride, self.stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        if subpixel:
            assert k == 3 and self.stride == 1, "subpixel mode is 3x3/s1"
            # m[r, t, s]: does tap t of the high-res kernel read low-res
            # offset s-1 for output parity r? (nearest-up duplication)
            m = np.zeros((2, 3, 3), np.float32)
            m[0, 0, 0] = m[0, 1, 1] = m[0, 2, 1] = 1.0
            m[1, 0, 1] = m[1, 1, 1] = m[1, 2, 2] = 1.0
            mj = jnp.asarray(m, dt)
            off = 0
            out = None
            for x in xs:
                cx = x.shape[-1]
                # (s, x, c, r, q, f) -> kernel (s, x, c, 4F) with channel
                # blocks ordered (r*2+q)*F + f for depth_to_space
                ksub = jnp.einsum(
                    "rts,qux,tucf->sxcrqf", mj, mj,
                    kern[:, :, off : off + cx, :],
                ).reshape(k, k, cx, 4 * self.features)
                y = conv(x, ksub)
                out = y if out is None else out + y
                off += cx
            out = depth_to_space(out, 2)
        else:
            out = None
            off = 0
            for x in xs:
                cx = x.shape[-1]
                y = conv(x, kern[:, :, off : off + cx, :])
                out = y if out is None else out + y
                off += cx
        return out + bias.astype(dt)


class ConvBlock(nn.Module):
    """kxk conv + bias + activation. XLA fuses the chain into one kernel.

    `x` may be a tuple of tensors — treated exactly as their channel
    concatenation, applied concat-free via _ManualConv's kernel split."""

    features: int
    kernel: int = 3
    stride: int = 1
    act: str = "relu"
    subpixel: bool = False  # x2 up via sub-pixel conv (see _ManualConv)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Array:
        if isinstance(x, jax.Array) and not self.subpixel:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding="SAME",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x)
        else:  # tuple input and/or subpixel: manual kernel application
            x = _ManualConv(
                self.features, self.kernel, self.stride,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="Conv_0",
            )(x, subpixel=self.subpixel)
        return activation(self.act)(x)


class ConvStack(nn.Module):
    """n_convs back-to-back ConvBlocks at fixed width.

    The first block accepts a tuple input (e.g. (upsampled, skip)) and
    consumes it concat-free — see _ManualConv."""

    features: int
    n_convs: int = 2
    kernel: int = 3
    act: str = "relu"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Array:
        for _ in range(self.n_convs):
            x = ConvBlock(
                self.features, self.kernel, act=self.act,
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(x)
        return x


class DownSample(nn.Module):
    """Stride-2 conv downsample (keeps everything on the MXU)."""

    features: int
    kernel: int = 3
    act: str = "relu"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return ConvBlock(
            self.features, self.kernel, stride=2, act=self.act,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x)


def nearest_upsample(x: Array, factor: int = 2) -> Array:
    """Nearest-neighbor 2x upsample via reshape-broadcast (cheap on TPU;
    avoids gather). NHWC."""
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, factor, w, factor, c))
    return x.reshape(n, h * factor, w * factor, c)


class UpSample(nn.Module):
    """Nearest-resize + conv upsample (no checkerboard artifacts).

    For the standard 3x3/x2 case this computes the IDENTICAL function as
    a sub-pixel conv at low resolution + pixel shuffle (_ManualConv
    subpixel mode): the naive resize-then-conv materializes full-res
    6-D broadcast layouts that dominated the stride-1 UNet's HBM traffic
    (tools/traffic_breakdown.py). Same param tree either way, so
    checkpoints are interchangeable; `subpixel=False` restores the naive
    lowering for A/B measurement."""

    features: int
    kernel: int = 3
    act: str = "relu"
    factor: int = 2
    subpixel: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Array:
        if self.subpixel and self.kernel == 3 and self.factor == 2:
            return ConvBlock(
                self.features, self.kernel, act=self.act, subpixel=True,
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(x)
        if isinstance(x, jax.Array):
            x = nearest_upsample(x, self.factor)
        else:  # tuple input (concat-free): upsample each part
            x = tuple(nearest_upsample(t, self.factor) for t in x)
        return ConvBlock(
            self.features, self.kernel, act=self.act,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x)


def avg_downsample(x: Array, factor: int = 2) -> Array:
    """Average-pool downsample used to build input pyramids. NHWC."""
    n, h, w, c = x.shape
    assert h % factor == 0 and w % factor == 0, (h, w, factor)
    x = x.reshape(n, h // factor, factor, w // factor, factor, c)
    return x.mean(axis=(2, 4))


def _s2d_reshape(x: Array, factor: int) -> Array:
    n, h, w, c = x.shape
    x = x.reshape(n, h // factor, factor, w // factor, factor, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // factor, w // factor, factor * factor * c)


def _d2s_reshape(x: Array, factor: int) -> Array:
    n, h, w, c = x.shape
    co = c // (factor * factor)
    x = x.reshape(n, h, w, factor, factor, co)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * factor, w * factor, co)


def space_to_depth(x: Array, factor: int = 2, use_conv: bool = True) -> Array:
    """(N, H, W, C) -> (N, H/f, W/f, C*f*f). Moves resolution into channels
    so the whole network runs at reduced spatial size: 1/f² the activation
    HBM traffic and f²·C input channels feeding the MXU instead of C.

    Implemented as a one-hot strided conv by default: the naive
    reshape→transpose→reshape materializes a 6D intermediate whose TPU
    tiled layout pads the tiny minor dims up to 5x (measured in HLO dumps);
    the conv form stays in well-tiled NHWC throughout and is numerically
    exact (one-hot weights)."""
    n, h, w, c = x.shape
    assert h % factor == 0 and w % factor == 0, (h, w, factor)
    if not use_conv:
        return _s2d_reshape(x, factor)
    f = factor
    k = np.zeros((f, f, c, f * f * c), dtype=np.float32)
    for dy in range(f):
        for dx in range(f):
            for ch in range(c):
                k[dy, dx, ch, (dy * f + dx) * c + ch] = 1.0
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(k, x.dtype), window_strides=(f, f), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def depth_to_space(x: Array, factor: int = 2, use_conv: bool = True) -> Array:
    """Inverse of space_to_depth (pixel shuffle); one-hot transposed conv
    by default (same layout rationale as space_to_depth)."""
    n, h, w, c = x.shape
    assert c % (factor * factor) == 0
    if not use_conv:
        return _d2s_reshape(x, factor)
    f = factor
    co = c // (f * f)
    k = np.zeros((f, f, c, co), dtype=np.float32)
    for dy in range(f):
        for dx in range(f):
            for o in range(co):
                # conv_transpose applies the kernel spatially flipped
                k[f - 1 - dy, f - 1 - dx, (dy * f + dx) * co + o, o] = 1.0
    return jax.lax.conv_transpose(
        x, jnp.asarray(k, x.dtype), strides=(f, f), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
