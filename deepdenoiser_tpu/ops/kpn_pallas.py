"""Pallas kernel-prediction filter application.

The XLA path (models/kpn.py) materializes im2col patches: a (N,H,W,C*k*k)
HBM tensor — 75x the image size for k=5, C=3 — then contracts. This kernel
computes the same convex combination entirely in VMEM: per row-block it
DMAs the (block + halo) rows of the noisy image once and accumulates the
k*k shifted, weight-multiplied windows on the VPU. HBM traffic drops from
O(k²·C·HW) to O((C + k²)·HW) — the filter application becomes bandwidth-
optimal (every input byte is read once).

Layout: NHWC buffers are processed as (H, W*C) flattened views — an x-shift
by dx pixels is a lane shift by C*dx, so the k*k taps are static slices of
a VMEM scratch block. Weights arrive transposed to (k², H, W) (one cheap
XLA transpose) so each tap is a contiguous (BH, W) block broadcast over C
lanes via pltpu.repeat.

Parity vs the XLA path: tests/test_pallas.py (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BLOCK_H = 8


def _kernel(noisy_ref, w_ref, out_ref, scratch, sem, *, k: int, c: int, bh: int, w: int):
    """Grid: (H / bh,). noisy_ref: full padded image in ANY/HBM (width
    (w + k - 1) * c lanes), w_ref: (k², bh, w) VMEM block, out_ref:
    (bh, w*c) VMEM block; w is the UNPADDED output width."""
    i = pl.program_id(0)
    # DMA the halo'd row band: rows [i*bh, i*bh + bh + k - 1)
    dma = pltpu.make_async_copy(
        noisy_ref.at[pl.ds(i * bh, bh + k - 1), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    acc = jnp.zeros((bh, w * c), jnp.float32)
    for t in range(k * k):
        dy, dx = t // k, t % k
        window = scratch[dy : dy + bh, dx * c : dx * c + w * c]
        # channel interleave: (bh, w) -> (bh, w*c) as [t0,t0,t0, t1,...]
        # (pltpu.repeat TILES rather than interleaves, so broadcast+reshape)
        tap = jnp.broadcast_to(w_ref[t][:, :, None], (bh, w, c)).reshape(bh, w * c)
        acc = acc + tap * window
    out_ref[:] = acc


def _apply_single(noisy: Array, weights_t: Array, k: int, interpret) -> Array:
    """noisy (H, W, C) f32, weights_t (k², H, W) f32 -> (H, W, C)."""
    h, w, c = noisy.shape
    p = k // 2
    bh = _BLOCK_H
    hp = -(-h // bh) * bh  # rows padded to block multiple
    # pad: rows p + (hp - h) + p ; cols p both sides; flatten to (H', W'*C)
    padded = jnp.pad(noisy, ((p, hp - h + p), (p, p), (0, 0)))
    flat = padded.reshape(hp + 2 * p, (w + 2 * p) * c)
    wt = jnp.pad(weights_t, ((0, 0), (0, hp - h), (0, 0)))

    grid = (hp // bh,)
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, c=c, bh=bh, w=w),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((k * k, bh, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bh, w * c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, w * c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bh + k - 1, (w + 2 * p) * c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(flat, wt)
    return out.reshape(hp, w, c)[:h]


def apply_per_pixel_kernels_pallas(
    noisy: Array, weights: Array, kernel_size: int, interpret=None
) -> Array:
    """Drop-in Pallas twin of kpn.apply_per_pixel_kernels.

    noisy (N,H,W,C), weights (N,H,W,k²) softmax-normalized -> (N,H,W,C).
    NOTE: tap ordering matches conv_general_dilated_patches: index
    t = dy*k + dx over the kernel window, top-left first.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"  # CI on CPU
    n, h, w, c = noisy.shape
    k = kernel_size
    assert weights.shape == (n, h, w, k * k)
    # pad weights' tap dim is already complete; transpose to (N, k², H, W)
    weights_t = jnp.transpose(weights.astype(jnp.float32), (0, 3, 1, 2))
    fn = functools.partial(_apply_single, k=k, interpret=interpret)
    return jax.vmap(lambda x, wt: fn(x.astype(jnp.float32), wt))(noisy, weights_t)
