"""Pallas kernel-prediction filter application.

The XLA path (models/kpn.py) is a k² static shift-accumulate — already a
fused elementwise chain. This kernel computes the same convex combination
entirely in VMEM with the DMA pipeline under explicit control: per row
block it copies the (block + halo) rows of one channel plane once and
accumulates the k² shifted, weight-multiplied windows on the VPU, so
every input byte crosses HBM exactly once regardless of how XLA chooses
to fuse.

Layout (r3 rewrite): PLANAR. Channels go to the front on the XLA side
((N,H,W,C) -> (N·C, H, W)), so the kernel only ever touches 2-D
(rows, lanes) blocks: an x-shift by dx is a static lane-offset slice and
a y-shift a sublane slice of the halo'd scratch. The first version
flattened channels into lanes ((H, W·C) views) and interleaved the
per-pixel weights across channels with a broadcast+reshape — Mosaic
rejects that shape cast on real TPU hardware ("infer-vector-layout:
unsupported shape cast", vector<8x1920x3> -> vector<8x5760>, observed on
v5e 2026-08-17). The planar form has no cross-lane reshapes at all.

Layout rule learned on-chip: batch a pallas_call only over LEADING axes —
vmap over a non-leading axis of the ANY-memspace operand produces a
squeezed mid-axis block spec that TPU lowering rejects.

Parity vs the XLA path: tests/test_pallas.py (interpret mode on CPU);
on-chip compile + latency verdict: tools/check_pallas_tpu.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BLOCK_H = 8


def _kernel(noisy_ref, w_ref, out_ref, scratch, sem, *, k: int, bh: int, w: int):
    """Grid: (H / bh,). noisy_ref: full padded plane in ANY/HBM
    (width w + k - 1 lanes), w_ref: (k², bh, w) VMEM block, out_ref:
    (bh, w) VMEM block; w is the UNPADDED output width."""
    i = pl.program_id(0)
    # DMA the halo'd row band: rows [i*bh, i*bh + bh + k - 1)
    dma = pltpu.make_async_copy(
        noisy_ref.at[pl.ds(i * bh, bh + k - 1), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    acc = jnp.zeros((bh, w), jnp.float32)
    for t in range(k * k):
        dy, dx = t // k, t % k
        acc = acc + w_ref[t] * scratch[dy : dy + bh, dx : dx + w]
    out_ref[:] = acc


def _apply_plane(noisy: Array, weights_t: Array, k: int, interpret) -> Array:
    """noisy (H, W) f32 single plane, weights_t (k², H, W) f32 -> (H, W)."""
    h, w = noisy.shape
    p = k // 2
    bh = _BLOCK_H
    hp = -(-h // bh) * bh  # rows padded to block multiple
    padded = jnp.pad(noisy, ((p, hp - h + p), (p, p)))
    wt = jnp.pad(weights_t, ((0, 0), (0, hp - h), (0, 0)))

    grid = (hp // bh,)
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, bh=bh, w=w),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((k * k, bh, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bh, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bh + k - 1, w + 2 * p), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded, wt)
    return out[:h]


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
    weights_t = jnp.transpose(weights.astype(jnp.float32), (0, 3, 1, 2))
    fn = functools.partial(_apply_plane, k=k, interpret=interpret)
    # vmap over (N, C) — LEADING axes only: batching a pallas_call over a
    # non-leading axis of the ANY-memspace input makes a squeezed mid-axis
    # block spec, which TPU lowering rejects ("memory space ANY only
    # supports blocks having the same block shape as the array", observed
    # on v5e 2026-08-17). Channels therefore move to the front on the XLA
    # side; the per-example weights broadcast over C via in_axes=None.
    planes = jnp.transpose(noisy.astype(jnp.float32), (0, 3, 1, 2))  # (N,C,H,W)
    per_ex = jax.vmap(fn, in_axes=(0, None), out_axes=0)  # over C
    out = jax.vmap(per_ex)(planes, weights_t)  # over N -> (N,C,H,W)
    return jnp.transpose(out, (0, 2, 3, 1))
