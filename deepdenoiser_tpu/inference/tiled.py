"""Tiled full-frame inference with certified halos (SURVEY.md N4).

TPU-shaped design, replacing the reference's per-crop python loop
(SURVEY.md §3.3) with ONE jitted program per frame:

  * static tile grid — (rows x cols) tiles of core size t, each padded by
    halo hp on every side to network size T = t + 2*hp;
  * the whole grid is gathered into a (n_tiles, T, T, C) batch and the
    CNN runs batched (optionally chunked via lax.map to bound HBM);
  * core regions are cropped and reassembled by reshape/transpose — no
    scatter, no dynamic shapes, everything fuses under jit.

Frame-border semantics: the frame is REFLECT-padded by the halo into a
canonical "padded plane" (pad_plane); the network conceptually runs on that
plane and the result is cropped back. Reflected context at borders is
standard denoiser practice (zero borders darken edges) — and, crucially, it
makes tiled and untiled runs see IDENTICAL data in every output pixel's
receptive field. (Zero-margin tiles would NOT match an untiled SAME-padded
run: biases make intermediate-layer activations nonzero inside a zero
margin, while SAME padding re-injects zeros at every layer.)

Seam-free EXACTNESS (not approximation) then holds because:
  1. hp >= the model's certified one-sided receptive-field bound
     (models.factory.halo — per-side interval arithmetic, empirically
     validated in tests/test_models.py), so a core pixel's RF never
     reaches a tile edge: its entire RF is real padded-plane data in both
     paths;
  2. t % m == 0 and hp % m == 0 (m = the model's downsampling multiple),
     so every tile origin is congruent 0 mod m and stride-2 grids inside
     tiles coincide with the whole-frame grids. Misaligned tiles would
     give *different* (not just seamed) results.

tests/test_tiled.py asserts tiled == whole_frame_reference equality
(BASELINE config #2's guarantee).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class TileGrid:
    """Static tiling plan for one frame geometry. Tiles are rectangular
    (tile_h x tile_w cores); the square-tile API sets both equal, and
    whole-frame mode (tile=0) uses one frame-sized tile — no interior
    halo waste, the fastest plan whenever the frame fits in HBM."""

    height: int
    width: int
    tile_h: int
    tile_w: int
    halo: int  # per-side halo hp
    rows: int
    cols: int

    @property
    def tile(self) -> int:
        assert self.tile_h == self.tile_w, "square-tile accessor on rect grid"
        return self.tile_h

    @property
    def net_h(self) -> int:
        return self.tile_h + 2 * self.halo

    @property
    def net_w(self) -> int:
        return self.tile_w + 2 * self.halo

    @property
    def net_size(self) -> int:
        assert self.tile_h == self.tile_w
        return self.tile_h + 2 * self.halo

    @property
    def n_tiles(self) -> int:
        return self.rows * self.cols

    @property
    def padded_hw(self) -> Tuple[int, int]:
        return self.rows * self.tile_h, self.cols * self.tile_w


def plan_grid(height: int, width: int, tile: int, halo: int, multiple: int) -> TileGrid:
    """Choose an aligned tiling plan. Tile sides and halo are rounded up so
    that tile % multiple == 0 and halo % multiple == 0 (grid-alignment
    invariants above). tile == 0 selects whole-frame mode: one tile of the
    frame's rounded-up dimensions."""
    halo = _round_up(halo, multiple)
    if tile == 0:
        th = _round_up(height, multiple)
        tw = _round_up(width, multiple)
        return TileGrid(height, width, th, tw, halo, 1, 1)
    tile = _round_up(max(tile, multiple), multiple)
    rows = -(-height // tile)
    cols = -(-width // tile)
    return TileGrid(height, width, tile, tile, halo, rows, cols)


def pad_plane(frame: Array, grid: TileGrid) -> Array:
    """The canonical padded plane both execution paths run on:
    reflect-pad halo on top/left, halo + grid rounding on bottom/right.
    Falls back to edge-replication when the frame is smaller than the pad
    (np.pad reflect requires pad < dim)."""
    h, w, _ = frame.shape
    assert (h, w) == (grid.height, grid.width), (frame.shape, grid)
    ph, pw = grid.padded_hw
    hp = grid.halo
    pads = ((hp, ph - h + hp), (hp, pw - w + hp), (0, 0))
    max_pad = max(pads[0] + pads[1])
    mode = "reflect" if max_pad < min(h, w) else "edge"
    return jnp.pad(frame, pads, mode=mode)


def whole_frame_reference(apply_fn: Callable[[Array], Array], frame: Array, grid: TileGrid) -> Array:
    """Untiled execution of the canonical semantics: run the network over
    the full padded plane in one call, crop the frame region. The ground
    truth the tiled path must match exactly; also usable directly when the
    frame fits in HBM."""
    hp = grid.halo
    y = apply_fn(pad_plane(frame, grid)[None])[0]
    return y[hp : hp + grid.height, hp : hp + grid.width]


def extract_tiles(frame: Array, grid: TileGrid) -> Array:
    """frame (H, W, C) -> tiles (rows*cols, Th, Tw, C) from the padded plane."""
    c = frame.shape[-1]
    padded = pad_plane(frame, grid)
    if grid.n_tiles == 1:
        return padded[None]

    ys = jnp.arange(grid.rows, dtype=jnp.int32) * grid.tile_h
    xs = jnp.arange(grid.cols, dtype=jnp.int32) * grid.tile_w
    sy = jnp.repeat(ys, grid.cols)
    sx = jnp.tile(xs, grid.rows)

    def take(y0, x0):
        return jax.lax.dynamic_slice(padded, (y0, x0, 0), (grid.net_h, grid.net_w, c))

    return jax.vmap(take)(sy, sx)


def stitch_tiles(tiles_out: Array, grid: TileGrid) -> Array:
    """(rows*cols, Th, Tw, C) core crops -> (H, W, C)."""
    hp, th, tw = grid.halo, grid.tile_h, grid.tile_w
    core = tiles_out[:, hp : hp + th, hp : hp + tw, :]
    c = core.shape[-1]
    core = core.reshape(grid.rows, grid.cols, th, tw, c)
    full = core.transpose(0, 2, 1, 3, 4).reshape(grid.rows * th, grid.cols * tw, c)
    return full[: grid.height, : grid.width, :]


def make_tiled_apply(
    apply_fn: Callable[[Array], Array],
    grid: TileGrid,
    out_channels: int,
    tile_batch: int = 0,
    batch_dims: int = 0,
    feather: bool = False,
) -> Callable[[Array], Array]:
    """Build `f(frame) -> denoised frame` running apply_fn over the tile grid.

    apply_fn: (N, T, T, Cin) -> (N, T, T, Cout) — the jittable network.
    tile_batch: chunk size for lax.map (0 = single batch, best for TPU
      unless HBM-bound).
    batch_dims=1 makes f accept (G, H, W, C) stacks (e.g. all pass-groups
      at once) and run them as one fused tile batch — bigger batches keep
      the MXU fed.
    feather: cosine overlap blending instead of exact center-crop
      stitching (InferenceConfig.stitch='feather'); with certified halos
      both are whole-frame-exact, with smaller halos feathering degrades
      gracefully. Not available in the HBM-bounded lazy path.
    """
    if feather and batch_dims == 0 and tile_batch and tile_batch < grid.n_tiles:
        raise ValueError("feathered stitching is unsupported in the "
                         "HBM-bounded lazy-chunk mode (tile_batch with "
                         "batch_dims=0); use exact stitching there")
    stitch = stitch_tiles_feathered if feather else stitch_tiles

    def run_tiles(tiles: Array) -> Array:
        if tile_batch and tile_batch < tiles.shape[0]:
            n = tiles.shape[0]
            nchunks = -(-n // tile_batch)
            pad = nchunks * tile_batch - n
            tiles_p = jnp.pad(tiles, ((0, pad), (0, 0), (0, 0), (0, 0)))
            chunks = tiles_p.reshape(nchunks, tile_batch, *tiles.shape[1:])
            outs = jax.lax.map(apply_fn, chunks)
            outs = outs.reshape(nchunks * tile_batch, *outs.shape[2:])[:n]
            return outs
        return apply_fn(tiles)

    if batch_dims == 0 and tile_batch and tile_batch < grid.n_tiles:
        # HBM-bounded mode: tiles are sliced from the padded plane INSIDE
        # the lax.map body (never all materialized at once), and each
        # chunk's output is core-cropped immediately. Peak live memory is
        # plane + one chunk of net tiles + the core outputs — this is the
        # path for frames whose full tile set exceeds HBM (e.g. 4K).
        def f_lazy(frame: Array) -> Array:
            c = frame.shape[-1]
            # Flatten to (H, W*C): TPU tiled layouts pad the minor dim to
            # 128 lanes, which blows a 41-channel 4K plane up 3x; with W*C
            # minor the padding is negligible. Channel-minor row-major means
            # an x-slice of w tiles is a contiguous lane slice of w*c.
            padded = pad_plane(frame, grid)
            ph, pw = padded.shape[0], padded.shape[1]
            plane2d = padded.reshape(ph, pw * c)
            n = grid.n_tiles
            nchunks = -(-n // tile_batch)
            idx = jnp.arange(nchunks * tile_batch, dtype=jnp.int32) % n
            sy = (idx // grid.cols) * grid.tile_h
            sx = (idx % grid.cols) * grid.tile_w * c
            starts = (
                sy.reshape(nchunks, tile_batch), sx.reshape(nchunks, tile_batch)
            )

            def chunk_fn(se):
                cy, cx = se

                def take(y0, x0):
                    t = jax.lax.dynamic_slice(
                        plane2d, (y0, x0), (grid.net_h, grid.net_w * c)
                    )
                    return t.reshape(grid.net_h, grid.net_w, c)

                tiles = jax.vmap(take)(cy, cx)
                out = apply_fn(tiles)
                hp = grid.halo
                return out[:, hp : hp + grid.tile_h, hp : hp + grid.tile_w, :]

            cores = jax.lax.map(chunk_fn, starts)
            cores = cores.reshape(nchunks * tile_batch, grid.tile_h,
                                  grid.tile_w, out_channels)[:n]
            full = cores.reshape(grid.rows, grid.cols, grid.tile_h,
                                 grid.tile_w, out_channels)
            full = full.transpose(0, 2, 1, 3, 4).reshape(
                grid.rows * grid.tile_h, grid.cols * grid.tile_w, out_channels
            )
            return full[: grid.height, : grid.width, :]

        return f_lazy

    if batch_dims == 0:

        def f(frame: Array) -> Array:
            tiles = extract_tiles(frame, grid)
            return stitch(run_tiles(tiles), grid)

        return f

    def f_batched(frames: Array) -> Array:
        g = frames.shape[0]
        tiles = jax.vmap(lambda fr: extract_tiles(fr, grid))(frames)
        tiles = tiles.reshape(g * grid.n_tiles, grid.net_h, grid.net_w, -1)
        outs = run_tiles(tiles)
        outs = outs.reshape(g, grid.n_tiles, grid.net_h, grid.net_w, out_channels)
        return jax.vmap(lambda t_: stitch(t_, grid))(outs)

    return f_batched


# ---------------------------------------------------------------------------
# Feathered blending (sub-certified halos; quality/throughput trade-off)
# ---------------------------------------------------------------------------


def _feather_window(t: int, hp: int) -> np.ndarray:
    """Partition-of-unity 1D weight over a T=t+2hp tile: cosine ramps in the
    overlap, flat core. Adjacent tiles' windows sum to exactly 1."""
    T = t + 2 * hp
    w = np.ones(T, dtype=np.float32)
    if hp > 0:
        ramp = 0.5 - 0.5 * np.cos(np.pi * (np.arange(2 * hp) + 0.5) / (2 * hp))
        w[: 2 * hp] = ramp
        w[-2 * hp :] = ramp[::-1]
    return w


def stitch_tiles_feathered(tiles_out: Array, grid: TileGrid) -> Array:
    """Overlap-blend stitching: cosine partition-of-unity over the 2*halo
    overlap regions. Use when halo < certified RF bound (faster tiles,
    approximate seams); with certified halos, center-crop stitching is
    exact and cheaper."""
    hp, th, tw = grid.halo, grid.tile_h, grid.tile_w
    c = tiles_out.shape[-1]
    wh = _feather_window(th, hp)
    ww = _feather_window(tw, hp)
    w2 = jnp.asarray(np.outer(wh, ww), dtype=tiles_out.dtype)[..., None]

    ph, pw = grid.rows * th + 2 * hp, grid.cols * tw + 2 * hp
    acc = jnp.zeros((ph, pw, c), tiles_out.dtype)
    wacc = jnp.zeros((ph, pw, 1), tiles_out.dtype)

    tiles_w = tiles_out * w2[None]
    nh, nw = grid.net_h, grid.net_w

    def body(i, carry):
        acc, wacc = carry
        r = i // grid.cols
        col = i % grid.cols
        y0, x0 = r * th, col * tw
        acc = jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(acc, (y0, x0, 0), (nh, nw, c)) + tiles_w[i], (y0, x0, 0)
        )
        wacc = jax.lax.dynamic_update_slice(
            wacc, jax.lax.dynamic_slice(wacc, (y0, x0, 0), (nh, nw, 1)) + w2, (y0, x0, 0)
        )
        return acc, wacc

    acc, wacc = jax.lax.fori_loop(0, grid.n_tiles, body, (acc, wacc))
    out = acc / jnp.maximum(wacc, 1e-8)
    return out[hp : hp + grid.height, hp : hp + grid.width, :]
