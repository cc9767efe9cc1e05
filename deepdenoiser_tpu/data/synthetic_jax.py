"""On-device synthetic pass-set generator (JAX twin of synthetic.py).

Purpose: data-free-from-the-host training. Generating training batches
INSIDE the jitted step removes the host->device feed entirely — on a
tunneled TPU (slow PCIe/relay link, see MEMORY tpu-env-facts) the input
pipeline would otherwise dominate the step time. Same construction as
data/synthetic.py: band-limited random Fourier fields, recomposition-
consistent pass sets, spp-scaled signal-proportional Monte-Carlo noise —
but keyed by jax.random so every batch is fresh and deterministic in key.

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
                  base_freq: float = 2.0) -> Array:
    yy = jnp.linspace(0.0, 1.0, h)[:, None, None]
    xx = jnp.linspace(0.0, 1.0, w)[None, :, None]
    out = jnp.zeros((h, w, c))
    total = 0.0
    amp = 1.0
    for o in range(octaves):
        key, k1, k2, k3 = jax.random.split(key, 4)
        freq = base_freq * (2.0**o)
        fy = jax.random.uniform(k1, (1, 1, c), minval=-freq, maxval=freq)
        fx = jax.random.uniform(k2, (1, 1, c), minval=-freq, maxval=freq)
        ph = jax.random.uniform(k3, (1, 1, c), maxval=2 * jnp.pi)
        out = out + amp * jnp.sin(2 * jnp.pi * (fy * yy + fx * xx) + ph)
        total += amp
        amp *= 0.55
    return 0.5 * (out / total + 1.0)


def generate_clean_passes(
    key: Array, h: int, w: int,
    groups: Sequence[str] = LIGHT_GROUPS, hdr_scale: float = 4.0,
) -> Dict[str, Array]:
    out: Dict[str, Array] = {}
    for g in groups:
        d_name, i_name, c_name = passes.group_passes(g)
        key, kc, km, kd, ki = jax.random.split(key, 5)
        color = _smooth_field(kc, h, w, 3)
        mask = _smooth_field(km, h, w, 1) > 0.85
        color = jnp.where(mask, color * 0.01, color)
        out[c_name] = color
        out[d_name] = hdr_scale * _smooth_field(kd, h, w, 3) ** 2.0
        out[i_name] = 0.4 * hdr_scale * _smooth_field(ki, h, w, 3) ** 2.0
    key, ke, kv, kn, kz, ka = jax.random.split(key, 6)
    out["emission"] = 0.2 * _smooth_field(ke, h, w, 3) ** 4.0
    out["environment"] = 0.1 * _smooth_field(kv, h, w, 3)
    n = _smooth_field(kn, h, w, 3) * 2.0 - 1.0
    out["normal"] = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6)
    out["depth"] = 20.0 * _smooth_field(kz, h, w, 1) ** 1.5
    out["alpha"] = jnp.clip(_smooth_field(ka, h, w, 1) * 1.6, 0.0, 1.0)
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


def add_mc_noise(
    key: Array, clean: Dict[str, Array], spp: float,
    groups: Sequence[str] = LIGHT_GROUPS, base_sigma: float = 1.0,
) -> Dict[str, Array]:
    sigma = base_sigma / jnp.sqrt(spp)
    noisy: Dict[str, Array] = {}
    for name in sorted(clean):
        x = clean[name]
        p = passes.get(name)
        key, k = jax.random.split(key)
        if p.kind is passes.PassKind.RADIANCE and name != "combined":
            noise = jax.random.normal(k, x.shape)
            noisy[name] = jnp.maximum(x + sigma * (x + 0.05) * noise, 0.0)
        elif p.kind is passes.PassKind.COLOR:
            noise = jax.random.normal(k, x.shape)
            noisy[name] = jnp.clip(x + 0.02 * sigma * noise, 0.0, 1.0)
        else:
            noisy[name] = x
    noisy["combined"] = _recompose(noisy, groups)
    return noisy


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def training_batch(
    key: Array, batch: int, crop: int, mode: str = "joint"
) -> Dict[str, Array]:
    """(key, n, s) -> {'x','y'} encoded training batch, fully on device.

    One fresh scene per example (crop-sized fields), one noisy realization
    at a random spp in [2, 64] — matching the host pipeline's encode
    semantics (data/loader.py make_batch_encoder)."""
    from deepdenoiser_tpu import transforms

    def one(k):
        k1, k2, k3 = jax.random.split(k, 3)
        clean = generate_clean_passes(k1, crop, crop)
        spp = 2.0 ** jax.random.uniform(k2, (), minval=1.0, maxval=6.0)
        noisy = add_mc_noise(k3, clean, spp)
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

    return jax.vmap(one)(jax.random.split(key, batch))
