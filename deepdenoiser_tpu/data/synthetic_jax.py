"""On-device synthetic pass-set generators (JAX twins of synthetic.py).

Purpose: data-free-from-the-host training. Generating training batches
INSIDE the jitted step removes the host->device feed entirely — on a
tunneled TPU (slow PCIe/relay link, see MEMORY tpu-env-facts) the input
pipeline would otherwise dominate the step time. Keyed by jax.random so
every batch is fresh and deterministic in key.

TWO structurally different signal families (the round-2 holdout study
showed single-family training memorizes that family's statistics):

  * Fourier:  band-limited random sinusoid fields — smooth, globally
    correlated signal (generate_clean_passes, same as data/synthetic.py);
  * Voronoi:  piecewise-constant albedo cells with hard edges, per-cell
    planar depth, directional light + penumbra shadow + blurred bounce
    (generate_voronoi_passes — the JAX twin of the round-2 holdout family
    data/synthetic_holdout.py, promoted into training for round 3).

Both share the recomposition identity and the same spp-scaled signal-
proportional MC noise model. `randomize_scene` adds scene-scale (depth)
and exposure (radiance) randomization so normalizers see varied absolute
scales. `training_batch(..., family='mixed')` interleaves the families.

The UNTOUCHED holdout for quality reporting is now the third family,
data/synthetic_spheres.py (eval-only; never imported here).

Used by tools/pretrain_flagship.py and the training-throughput bench.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from deepdenoiser_tpu import passes
from deepdenoiser_tpu.passes import LIGHT_GROUPS

Array = jax.Array


def _smooth_field(key: Array, h: int, w: int, c: int, octaves: int = 4,
                  base_freq: float = 2.0, t=0.0) -> Array:
    """Band-limited sinusoid field. `t` drifts each octave's phase at a
    key-determined velocity — the SAME key at different t gives a
    temporally coherent animation (BASELINE config #5's drift source)."""
    yy = jnp.linspace(0.0, 1.0, h)[:, None, None]
    xx = jnp.linspace(0.0, 1.0, w)[None, :, None]
    out = jnp.zeros((h, w, c))
    total = 0.0
    amp = 1.0
    for o in range(octaves):
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        freq = base_freq * (2.0**o)
        fy = jax.random.uniform(k1, (1, 1, c), minval=-freq, maxval=freq)
        fx = jax.random.uniform(k2, (1, 1, c), minval=-freq, maxval=freq)
        ph = jax.random.uniform(k3, (1, 1, c), maxval=2 * jnp.pi)
        vel = jax.random.uniform(k4, (1, 1, c), minval=-1.0, maxval=1.0)
        ph = ph + vel * t
        out = out + amp * jnp.sin(2 * jnp.pi * (fy * yy + fx * xx) + ph)
        total += amp
        amp *= 0.55
    return 0.5 * (out / total + 1.0)


def generate_clean_passes(
    key: Array, h: int, w: int,
    groups: Sequence[str] = LIGHT_GROUPS, hdr_scale: float = 4.0,
    t=0.0,
) -> Dict[str, Array]:
    """Fourier-family pass set; fixed key + varying `t` animates the scene
    smoothly (static frames = any fixed t; the per-octave velocity draw
    shifts this module's random stream relative to rounds 1-2)."""
    out: Dict[str, Array] = {}
    for g in groups:
        d_name, i_name, c_name = passes.group_passes(g)
        key, kc, km, kd, ki = jax.random.split(key, 5)
        color = _smooth_field(kc, h, w, 3, t=t)
        mask = _smooth_field(km, h, w, 1, t=t) > 0.85
        color = jnp.where(mask, color * 0.01, color)
        out[c_name] = color
        out[d_name] = hdr_scale * _smooth_field(kd, h, w, 3, t=t) ** 2.0
        out[i_name] = 0.4 * hdr_scale * _smooth_field(ki, h, w, 3, t=t) ** 2.0
    key, ke, kv, kn, kz, ka = jax.random.split(key, 6)
    out["emission"] = 0.2 * _smooth_field(ke, h, w, 3, t=t) ** 4.0
    out["environment"] = 0.1 * _smooth_field(kv, h, w, 3, t=t)
    n = _smooth_field(kn, h, w, 3, t=t) * 2.0 - 1.0
    out["normal"] = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6)
    out["depth"] = 20.0 * _smooth_field(kz, h, w, 1, t=t) ** 1.5
    out["alpha"] = jnp.clip(_smooth_field(ka, h, w, 1, t=t) * 1.6, 0.0, 1.0)
    out["combined"] = _recompose(out, groups)
    return out


def _recompose(d: Dict[str, Array], groups) -> Array:
    acc = None
    for g in groups:
        dn, inn, cn = passes.group_passes(g)
        t = d[cn] * (d[dn] + d[inn])
        acc = t if acc is None else acc + t
    for extra in passes.COMPOSITE_EXTRA:
        if extra in d:
            acc = acc + d[extra]
    return acc


def _box_blur(x: Array, r: int) -> Array:
    """Separable box blur with edge clamping, (h, w, c) -> (h, w, c).

    Semantics match synthetic_holdout._box_blur (edge-pad r, mean over the
    2r+1 window) but run as two depthwise convs — the cumsum formulation
    lowers to sequential scans on TPU and dominated the training step
    (13 st/s vs 60); convs ride the vector/matrix units."""
    if r <= 0:
        return x
    h, w, c = x.shape
    k = 2 * r + 1
    win = jnp.full((k,), 1.0 / k, x.dtype)
    # H pass then W pass, depthwise (feature_group_count=c), edge-padded
    out = jnp.pad(x, ((r, r), (0, 0), (0, 0)), mode="edge")[None]
    out = jax.lax.conv_general_dilated(
        out, jnp.broadcast_to(win[:, None, None, None], (k, 1, 1, c)),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    out = jnp.pad(out[0], ((0, 0), (r, r), (0, 0)), mode="edge")[None]
    out = jax.lax.conv_general_dilated(
        out, jnp.broadcast_to(win[None, :, None, None], (1, k, 1, c)),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    return out[0]


def generate_voronoi_passes(
    key: Array, h: int, w: int,
    groups: Sequence[str] = LIGHT_GROUPS, n_cells: int = 16,
    light_scale: float = 4.0,
) -> Dict[str, Array]:
    """Voronoi-cell scene family, recomposition-consistent (JAX twin of
    data/synthetic_holdout.generate_clean_passes; structure documented
    there). Promoted from holdout to TRAINING in round 3."""
    out: Dict[str, Array] = {}
    key, ks = jax.random.split(key)
    sites = jax.random.uniform(ks, (n_cells, 2)) * jnp.asarray([h, w], jnp.float32)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    d2 = (yy[..., None] - sites[:, 0]) ** 2 + (xx[..., None] - sites[:, 1]) ** 2
    labels = jnp.argmin(d2, axis=-1)  # (h, w) int
    # One-hot matmul replaces per-pixel gathers: (h,w,K) @ (K,m) rides the
    # MXU, where attr[labels] gathers were a training-throughput bottleneck.
    onehot = jax.nn.one_hot(labels, n_cells, dtype=jnp.float32)

    def cell(attr: Array) -> Array:  # (K, m) -> (h, w, m)
        return onehot @ attr

    # --- geometry: per-cell base normals + blurred-noise bump texture ----
    key, kn, kb = jax.random.split(key, 3)
    base_n = jax.random.normal(kn, (n_cells, 3))
    base_n = base_n.at[:, 2].set(jnp.abs(base_n[:, 2]) + 1.5)
    base_n = base_n / jnp.linalg.norm(base_n, axis=-1, keepdims=True)
    bump = _box_blur(jax.random.normal(kb, (h, w, 3)), 1)
    n = cell(base_n) + 0.15 * bump
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6)
    out["normal"] = n

    # per-cell planar depth: discontinuities at cell borders
    key, kd0, kgy, kgx = jax.random.split(key, 4)
    yyn = jnp.linspace(-0.5, 0.5, h)[:, None]
    xxn = jnp.linspace(-0.5, 0.5, w)[None, :]
    d0 = jax.random.uniform(kd0, (n_cells,), minval=2.0, maxval=30.0)
    gy = jax.random.uniform(kgy, (n_cells,), minval=-8.0, maxval=8.0)
    gx = jax.random.uniform(kgx, (n_cells,), minval=-8.0, maxval=8.0)
    plane = cell(jnp.stack([d0, gy, gx], axis=-1))
    depth = plane[..., 0] + plane[..., 1] * yyn + plane[..., 2] * xxn
    out["depth"] = jnp.maximum(depth, 0.05)[..., None]

    key, ka = jax.random.split(key)
    see_through = (jax.random.uniform(ka, (n_cells, 1)) < 0.12).astype(jnp.float32)
    alpha = 1.0 - 0.6 * cell(see_through)
    out["alpha"] = jnp.clip(_box_blur(alpha, 2), 0.0, 1.0)

    # --- illumination: directional lambert + penumbra shadow + bounce ----
    key, kl, ko, kc = jax.random.split(key, 4)
    light = jax.random.normal(kl, (3,))
    light = light.at[2].set(jnp.abs(light[2]) + 1.0)
    light = light / jnp.linalg.norm(light)
    lambert = jnp.maximum((n * light).sum(-1), 0.0)[..., None]
    sy_sx = jax.random.normal(ko, (2,))
    c = jax.random.uniform(kc, (), minval=-0.2, maxval=0.2)
    occluded = ((sy_sx[0] * yyn + sy_sx[1] * xxn + c) > 0).astype(jnp.float32)
    penumbra = max(3, min(h, w) // 24)
    vis = 1.0 - 0.85 * _box_blur(occluded[..., None], penumbra)
    bounce = _box_blur(lambert, max(4, min(h, w) // 12))

    # --- per-group albedo + radiance -------------------------------------
    for g in groups:
        d_name, i_name, c_name = passes.group_passes(g)
        key, kcc, kdk, ktd, kti, kin = jax.random.split(key, 6)
        cell_col = jax.random.uniform(kcc, (n_cells, 3), minval=0.05, maxval=0.95)
        dark = jax.random.uniform(kdk, (n_cells, 1)) < 0.1
        cell_col = jnp.where(dark, cell_col * 0.01, cell_col)
        out[c_name] = cell(cell_col)
        tint_d = jax.random.uniform(ktd, (3,), minval=0.5, maxval=1.5)
        tint_i = jax.random.uniform(kti, (3,), minval=0.2, maxval=0.8)
        intensity = light_scale * jax.random.uniform(kin, (), minval=0.3, maxval=1.0)
        out[d_name] = intensity * lambert * vis * tint_d
        out[i_name] = 0.5 * intensity * bounce * tint_i

    # --- emission / environment ------------------------------------------
    key, ke, kec, kst, ksb = jax.random.split(key, 5)
    emissive = jax.random.uniform(ke, (n_cells, 1)) < 0.08
    em_col = jax.random.uniform(kec, (n_cells, 3), minval=0.5, maxval=3.0)
    em_col = jnp.where(emissive, em_col, 0.0)
    out["emission"] = cell(em_col)
    sky_top = jax.random.uniform(kst, (3,), minval=0.02, maxval=0.3)
    sky_bot = jax.random.uniform(ksb, (3,), maxval=0.1)
    t = jnp.linspace(0.0, 1.0, h)[:, None, None]
    out["environment"] = jnp.broadcast_to(
        (1 - t) * sky_top + t * sky_bot, (h, w, 3)
    )
    out["combined"] = _recompose(out, groups)
    return out


def randomize_scene(
    key: Array, clean: Dict[str, Array],
    groups: Sequence[str] = LIGHT_GROUPS,
) -> Dict[str, Array]:
    """Scene-scale + exposure randomization (round-3 generalization lever).

    Radiance passes (direct/indirect/emission/environment/combined) share
    one exposure factor 2^U(-2,2); depth gets an independent scale
    2^U(-2,2). Recomposition is linear in radiance at fixed color, so
    scaling `combined` by the same factor preserves the identity exactly.
    """
    ke, kz = jax.random.split(key)
    exposure = 2.0 ** jax.random.uniform(ke, (), minval=-2.0, maxval=2.0)
    zscale = 2.0 ** jax.random.uniform(kz, (), minval=-2.0, maxval=2.0)
    out = {}
    for name, x in clean.items():
        p = passes.get(name)
        if p.kind is passes.PassKind.RADIANCE:
            out[name] = x * exposure
        elif p.kind is passes.PassKind.DEPTH:
            out[name] = x * zscale
        else:
            out[name] = x
    return out


def add_mc_noise(
    key: Array, clean: Dict[str, Array], spp: float,
    groups: Sequence[str] = LIGHT_GROUPS, base_sigma: float = 1.0,
) -> Dict[str, Array]:
    # Noise model matches data/synthetic.add_mc_noise: only direct/indirect
    # radiance is MC-noisy; emission/environment are (near-)deterministic in
    # Cycles and pass through the recomposition undenoised, so the fixture
    # keeps them clean (see the numpy twin's docstring for the r3 history).
    sigma = base_sigma / jnp.sqrt(spp)
    noisy: Dict[str, Array] = {}
    for name in sorted(clean):
        x = clean[name]
        p = passes.get(name)
        key, k = jax.random.split(key)
        if p.role in (passes.Role.DIRECT, passes.Role.INDIRECT):
            noise = jax.random.normal(k, x.shape)
            noisy[name] = jnp.maximum(x + sigma * (x + 0.05) * noise, 0.0)
        elif p.kind is passes.PassKind.COLOR:
            noise = jax.random.normal(k, x.shape)
            noisy[name] = jnp.clip(x + 0.02 * sigma * noise, 0.0, 1.0)
        else:
            noisy[name] = x
    noisy["combined"] = _recompose(noisy, groups)
    return noisy


# GT sample count for traced MC training targets: 256 spp sits 18 dB under
# a 4-spp input realization (noise power ~ 1/spp) — residual target noise is
# zero-mean per pixel, so the regression's minimizer is unchanged
# (Noise2Noise argument) while GT tracing stays ~36x cheaper than the
# eval-grade 1024 spp.
MC_TRAIN_GT_SPP = 256
_MC_FULL_SHAPE = (1080, 1920)  # virtual full frame the windows crop from


def _encode_pair(noisy: Dict[str, Array], clean: Dict[str, Array],
                 mode: str) -> Dict[str, Array]:
    """(noisy passes, clean passes) -> {'x','y'} with the host pipeline's
    encode semantics (data/loader.py make_batch_encoder): targets are
    demodulated by the NOISY albedo the network sees."""
    from deepdenoiser_tpu import transforms

    if mode == "joint":
        x = transforms.encode_joint_inputs(noisy)
        ys = []
        for g in LIGHT_GROUPS:
            dn, inn, cn = passes.group_passes(g)
            albedo = noisy[cn]
            ys.append(transforms.normalize(
                dn, transforms.demodulate(clean[dn], albedo)))
            ys.append(transforms.normalize(
                inn, transforms.demodulate(clean[inn], albedo)))
        y = jnp.concatenate(ys, axis=-1)
    elif mode == "group":
        x = transforms.encode_group_inputs(noisy, "diffuse")
        dn, inn, cn = passes.group_passes("diffuse")
        albedo = noisy[cn]
        y = jnp.concatenate([
            transforms.normalize(dn, transforms.demodulate(clean[dn], albedo)),
            transforms.normalize(inn, transforms.demodulate(clean[inn], albedo)),
        ], axis=-1)
    else:  # rgb
        x = transforms.encode_rgb_inputs(noisy)
        y = transforms.normalize("combined", clean["combined"])
    return {"x": x, "y": y}


def _mc_one(k: Array, crop: int, mode: str, spp: int) -> Dict[str, Array]:
    """One traced-MC training example: a random crop-window of a virtual
    1080p frame, noisy = a genuine `spp`-sample estimate, GT = the same
    estimator at MC_TRAIN_GT_SPP (data/mc_tracer.py). Exposure/scene-scale
    randomization applies the SAME factors to both realizations."""
    from deepdenoiser_tpu.data import mc_tracer

    k_scene, k_wy, k_wx, k_gt, k_noise, k_rand = jax.random.split(k, 6)
    scene = mc_tracer.make_scene_jax(k_scene)
    fh, fw = _MC_FULL_SHAPE
    oy = jax.random.randint(k_wy, (), 0, fh - crop + 1)
    ox = jax.random.randint(k_wx, (), 0, fw - crop + 1)
    clean = mc_tracer.render(scene, crop, crop, MC_TRAIN_GT_SPP, k_gt,
                             LIGHT_GROUPS, (oy, ox), (fh, fw))
    noisy = mc_tracer.render(scene, crop, crop, spp, k_noise,
                             LIGHT_GROUPS, (oy, ox), (fh, fw))
    clean = randomize_scene(k_rand, clean)
    noisy = randomize_scene(k_rand, noisy)  # same key -> same factors
    return _encode_pair(noisy, clean, mode)


def _mc_subbatch(keys: Array, crop: int, mode: str) -> Dict[str, Array]:
    """Traced-MC examples at the two eval sample counts (spp must be static
    for the sample fori_loop): first half spp 4, second half spp 16."""
    n = keys.shape[0]
    n4 = max(n - n // 2, 1)
    parts = [jax.vmap(lambda k: _mc_one(k, crop, mode, 4))(keys[:n4])]
    if n > n4:
        parts.append(jax.vmap(lambda k: _mc_one(k, crop, mode, 16))(keys[n4:]))
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def training_batch(
    key: Array, batch: int, crop: int, mode: str = "joint",
    family: str = "fourier",
) -> Dict[str, Array]:
    """(key, n, s) -> {'x','y'} encoded training batch, fully on device.

    One fresh scene per example (crop-sized fields), one noisy realization
    at a random spp in [2, 64] — matching the host pipeline's encode
    semantics (data/loader.py make_batch_encoder).

    `family`: 'fourier' (round-1/2 behavior, no scene randomization, so old
    checkpoints/benches reproduce), 'voronoi', or 'mixed' — the round-3
    corpus: half Fourier + half Voronoi, both scene-scale/exposure
    randomized (randomize_scene). 'mc' = all examples traced Monte-Carlo
    (data/mc_tracer.py: true N-sample estimates — fireflies, penumbra
    variance — at spp 4/16, GT at MC_TRAIN_GT_SPP); 'mixed-mc' = thirds
    fourier/voronoi/mc. Holdout hygiene: the MC scenes share the sphere
    geometry CLASS with the spheres holdout (nothing else — materials,
    lighting and the noise itself differ), so when training with an mc
    family the boxes holdout (data/synthetic_boxes.py) is the untouched
    arbiter (mc_tracer.py docstring note)."""
    keys = jax.random.split(key, batch)

    def one(k, gen, rand):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        clean = gen(k1, crop, crop)
        if rand:
            clean = randomize_scene(k4, clean)
        spp = 2.0 ** jax.random.uniform(k2, (), minval=1.0, maxval=6.0)
        noisy = add_mc_noise(k3, clean, spp)
        return _encode_pair(noisy, clean, mode)

    if family == "fourier":
        return jax.vmap(lambda k: one(k, generate_clean_passes, False))(keys)
    if family == "voronoi":
        return jax.vmap(lambda k: one(k, generate_voronoi_passes, True))(keys)
    if family == "mc":
        return _mc_subbatch(keys, crop, mode)
    if family == "mixed":
        n_v = batch // 2
        if n_v == 0:
            return jax.vmap(lambda k: one(k, generate_clean_passes, True))(keys)
        four = jax.vmap(lambda k: one(k, generate_clean_passes, True))(keys[n_v:])
        vor = jax.vmap(lambda k: one(k, generate_voronoi_passes, True))(keys[:n_v])
        return jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), four, vor
        )
    if family == "mixed-mc":
        n_f = max(batch // 3, 1)
        n_v = max(batch // 3, 1)
        n_m = batch - n_f - n_v
        if n_m < 1:
            raise ValueError(f"mixed-mc needs batch >= 3, got {batch}")
        four = jax.vmap(lambda k: one(k, generate_clean_passes, True))(keys[:n_f])
        vor = jax.vmap(lambda k: one(k, generate_voronoi_passes, True))(
            keys[n_f:n_f + n_v])
        mc = _mc_subbatch(keys[n_f + n_v:], crop, mode)
        return jax.tree.map(
            lambda a, b, c: jnp.concatenate([a, b, c], axis=0), four, vor, mc
        )
    raise ValueError(f"unknown family {family!r}")
