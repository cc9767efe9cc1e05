"""Multi-chip spatial parallelism: frame rows sharded over a 'spatial' mesh
axis with ppermute halo exchange (SURVEY.md §2b — the sequence-parallel /
ring-attention analogue for conv receptive fields; rebuild component N4's
multi-chip mode).

Each device owns a contiguous band of frame rows. Before the CNN runs, the
band's first/last `halo` rows are exchanged with mesh neighbors via
jax.lax.ppermute (one hop over ICI, both directions concurrently); frame-
border devices take their missing halo from the canonical reflect-padded
plane instead. Band origins are aligned to the model's downsampling
multiple, so outputs equal the single-device whole-frame run EXACTLY — the
same certified-halo argument as inference/tiled.py, verified on an 8-fake-
device CPU mesh in tests/test_halo.py.

Scaling shape: per-chip work drops ~1/n while the exchanged bytes stay
O(halo * W) per step — the classic band-parallel stencil decomposition.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from deepdenoiser_tpu.inference import tiled

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def plan_bands(
    height: int, width: int, n_shards: int, halo: int, multiple: int
) -> Tuple[tiled.TileGrid, int]:
    """A 1 x 1 'grid' describing the padded plane, plus the band height b.

    The plane core is padded to n_shards * b rows (b % multiple == 0), so
    every band origin is grid-aligned.
    """
    hp = _round_up(halo, multiple)
    b = _round_up(-(-height // n_shards), multiple)
    if b < hp:
        # ppermute exchanges with the IMMEDIATE ring neighbor only; a halo
        # taller than one band would need rows from two hops away and the
        # slice band[-hp:] would silently truncate (shape blow-up later).
        raise ValueError(
            f"band height {b} < halo {hp}: frame of {height} rows is too "
            f"short for {n_shards} spatial shards of this model (needs "
            f"height >= {n_shards * hp}); use fewer shards or tiles"
        )
    core_h = n_shards * b
    core_w = _round_up(width, multiple)
    grid = tiled.TileGrid(height, width, core_h, core_w, hp, 1, 1)
    return grid, b


def make_spatial_apply(
    apply_fn: Callable[[Array], Array],
    mesh: Mesh,
    height: int,
    width: int,
    halo: int,
    multiple: int,
    axis: str = "spatial",
) -> Callable[[Array], Array]:
    """Build f(frame (H,W,C)) -> (H,W,Cout) sharded band-parallel over
    `axis`. apply_fn: (1, Hb, Wp, C) -> (1, Hb, Wp, Cout)."""
    n = mesh.shape[axis]
    grid, b = plan_bands(height, width, n, halo, multiple)
    hp = grid.halo

    def worker(band: Array, top: Array, bottom: Array) -> Array:
        # band: (b, Wp, C); top/bottom: the plane's global halo strips.
        i = jax.lax.axis_index(axis)
        fwd = [(j, j + 1) for j in range(n - 1)]
        bwd = [(j + 1, j) for j in range(n - 1)]
        recv_top = jax.lax.ppermute(band[-hp:], axis, fwd)  # from i-1
        recv_bot = jax.lax.ppermute(band[:hp], axis, bwd)  # from i+1
        top_halo = jnp.where(i == 0, top, recv_top)
        bot_halo = jnp.where(i == n - 1, bottom, recv_bot)
        x = jnp.concatenate([top_halo, band, bot_halo], axis=0)[None]
        y = apply_fn(x)[0]
        return y[hp : hp + b]

    sharded = jax.shard_map(
        worker,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )

    def f(frame: Array) -> Array:
        plane = tiled.pad_plane(frame, grid)  # (core_h + 2hp, Wp + 2hp, C)
        core = plane[hp : hp + grid.tile_h]
        top = plane[:hp]
        bottom = plane[hp + grid.tile_h :]
        out = sharded(core, top, bottom)  # (core_h, Wp+2hp, Cout)
        return out[: grid.height, hp : hp + grid.width]

    return jax.jit(f)


def make_spatial_apply_batched(
    apply_fn: Callable[[Array], Array],
    mesh: Mesh,
    height: int,
    width: int,
    halo: int,
    multiple: int,
    axis: str = "spatial",
) -> Callable[[Array], Array]:
    """Batched variant: f(frames (G,H,W,C)) -> (G,H,W,Cout), rows sharded
    over `axis`. The G leading dim (e.g. the four light groups) rides along
    replicated-free — each device processes its row band of EVERY group in
    one network call, keeping the MXU batch large."""
    n = mesh.shape[axis]
    grid, b = plan_bands(height, width, n, halo, multiple)
    hp = grid.halo

    def worker(band: Array, top: Array, bottom: Array) -> Array:
        # band: (G, b, Wp, C); top/bottom: (G, hp, Wp, C) global strips.
        i = jax.lax.axis_index(axis)
        fwd = [(j, j + 1) for j in range(n - 1)]
        bwd = [(j + 1, j) for j in range(n - 1)]
        recv_top = jax.lax.ppermute(band[:, -hp:], axis, fwd)
        recv_bot = jax.lax.ppermute(band[:, :hp], axis, bwd)
        top_halo = jnp.where(i == 0, top, recv_top)
        bot_halo = jnp.where(i == n - 1, bottom, recv_bot)
        x = jnp.concatenate([top_halo, band, bot_halo], axis=1)
        y = apply_fn(x)
        return y[:, hp : hp + b]

    sharded = jax.shard_map(
        worker,
        mesh=mesh,
        in_specs=(P(None, axis), P(), P()),
        out_specs=P(None, axis),
        check_vma=False,
    )

    def f(frames: Array) -> Array:
        plane = jax.vmap(lambda fr: tiled.pad_plane(fr, grid))(frames)
        core = plane[:, hp : hp + grid.tile_h]
        top = plane[:, :hp]
        bottom = plane[:, hp + grid.tile_h :]
        out = sharded(core, top, bottom)
        return out[:, : grid.height, hp : hp + grid.width]

    return jax.jit(f)
