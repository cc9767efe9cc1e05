"""Genuine Monte-Carlo render-pass generator — an on-device JAX mini path
tracer (VERDICT r4 missing #2).

Every quality number through round 4 was measured against
`synthetic.add_mc_noise` — zero-mean signal-proportional GAUSSIAN noise.
Real Cycles Monte-Carlo noise at low spp is none of that: it is
heavy-tailed (fireflies from rarely-hit bright emitters), spatially
correlated with integrand variance (penumbrae are noisy, flat-lit walls
are not), and non-Gaussian at 4 spp. This module produces noisy passes
that ARE N-sample Monte-Carlo estimates (SURVEY.md §0 "several low sample
counts"; BASELINE.json:7):

  * primary visibility deterministic (pixel-center rays; aux buffers —
    normal/depth/alpha/albedo — stay noise-free, as in Cycles);
  * DIRECT light: a disk area light sampled uniformly per sample-ray,
    with ray-traced stochastic visibility — genuine penumbra noise whose
    variance follows the shadow boundaries;
  * INDIRECT light: one cosine-hemisphere sample per spp, traced against
    the scene — sky radiance on miss, emission + one-bounce direct on
    hit. A bright emissive sphere makes rare high-energy indirect samples:
    real fireflies;
  * the ground truth is the SAME estimator at high spp (default 1024 —
    its residual noise power sits 24 dB under the 4-spp realization), so
    noisy estimates converge to the GT in expectation by construction
    (tested: tests/test_mc_tracer.py::test_noisy_converges_to_gt).

Pass semantics match the family contract (data/synthetic.py, upstream
data model SURVEY.md C19/N5): per-group direct/indirect are
albedo-demodulated radiance, the recomposition identity holds exactly for
clean and noisy alike (the combined is re-recomposed from the traced
passes), and emission/environment are deterministic pass-throughs. The
four light groups share one traced estimate pair with per-group tints —
matching a real renderer, where per-pass estimates derive from the SAME
paths and are correlated, not independent.

The tracer is pure JAX and jittable: scene geometry is a pytree argument,
the sample loop is `lax.fori_loop`, all shapes static — so GT renders run
at full speed on the TPU and the generator can fuse into a jitted
training-batch synthesis program like the other families
(data/synthetic_jax.py).

Geometry note for holdout hygiene: the scene class (random spheres over a
ground plane) is shared with the analytic spheres holdout
(data/synthetic_spheres.py) but nothing else is — materials, lighting,
shading, and above all the NOISE are different. This family ships as an
EVAL family first (eval_zoo `mc` column); if it is ever mixed into
training, the boxes holdout (data/synthetic_boxes.py) remains the
geometry-untouched arbiter and that contamination note must move into the
training docs.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepdenoiser_tpu import passes
from deepdenoiser_tpu.data.synthetic import recompose_np
from deepdenoiser_tpu.passes import LIGHT_GROUPS

Array = jax.Array

DEFAULT_GT_SPP = 1024


class Scene(NamedTuple):
    """Static-shape scene pytree (jit-compatible argument)."""

    centers: Array        # (N, 3) sphere centers
    radii: Array          # (N,)
    sphere_albedo: Array  # (N, 3) diffuse-group albedo (bounce shading)
    emission: Array       # (N, 3) emitted radiance (mostly zero; fireflies)
    plane_albedo: Array   # (2, 3) checker colors
    checker_scale: Array  # () scalar
    light_center: Array   # (3,) disk area light center
    light_radius: Array   # ()
    light_normal: Array   # (3,) unit, points toward the scene
    light_radiance: Array # (3,) emitted radiance (RGB)
    sky_top: Array        # (3,)
    sky_hor: Array        # (3,)
    group_tint_d: Array   # (G, 3) per-group direct tint
    group_tint_i: Array   # (G, 3) per-group indirect tint
    group_albedo_mix: Array  # (G,) blend between shared albedo and flat grey


def make_scene(seed: int, n_spheres: int = 7,
               groups: Sequence[str] = LIGHT_GROUPS) -> Scene:
    """Draw a random scene. Host-side numpy RNG (matches the other
    families' determinism-by-seed contract); returns device arrays."""
    rng = np.random.default_rng(seed)
    centers = np.stack([
        rng.uniform(-4.0, 4.0, n_spheres),
        rng.uniform(0.4, 2.5, n_spheres),
        rng.uniform(4.0, 12.0, n_spheres),
    ], axis=-1).astype(np.float32)
    radii = rng.uniform(0.4, 1.4, n_spheres).astype(np.float32)
    centers[:, 1] = np.maximum(centers[:, 1], radii * 0.6)

    emission = np.zeros((n_spheres, 3), np.float32)
    # one bright emitter most of the time: the firefly source — indirect
    # rays hit it rarely, each hit carries ~30-120x the mean radiance
    if rng.random() < 0.8:
        i = int(rng.integers(n_spheres))
        emission[i] = rng.uniform(30.0, 120.0, size=3)

    light_dir = rng.normal(size=3).astype(np.float32)
    light_dir[1] = abs(light_dir[1]) + 1.2
    light_dir /= np.linalg.norm(light_dir)
    light_center = (light_dir * rng.uniform(14.0, 22.0)).astype(np.float32)
    light_center[1] = max(light_center[1], 8.0)
    # disk faces the scene origin region
    ln = -light_center / np.linalg.norm(light_center)

    g = len(groups)
    # diffuse gets the full signal; the other groups carry progressively
    # smaller shares so all 24 channels are exercised without quadrupling
    # the radiance scale
    share = np.array([1.0, 0.45, 0.2, 0.12][:g], np.float32)[:, None]
    return Scene(
        centers=jnp.asarray(centers),
        radii=jnp.asarray(radii),
        sphere_albedo=jnp.asarray(
            rng.uniform(0.05, 0.95, size=(n_spheres, 3)).astype(np.float32)),
        emission=jnp.asarray(emission),
        plane_albedo=jnp.asarray(
            rng.uniform(0.1, 0.9, size=(2, 3)).astype(np.float32)),
        checker_scale=jnp.float32(rng.uniform(0.6, 1.4)),
        light_center=jnp.asarray(light_center),
        light_radius=jnp.float32(rng.uniform(1.0, 3.5)),
        light_normal=jnp.asarray(ln.astype(np.float32)),
        light_radiance=jnp.asarray(
            (rng.uniform(4.0, 12.0, size=3) * rng.uniform(2.0, 5.0)
             ).astype(np.float32)),
        sky_top=jnp.asarray(rng.uniform(0.1, 0.5, size=3).astype(np.float32)),
        sky_hor=jnp.asarray(rng.uniform(0.3, 0.8, size=3).astype(np.float32)),
        group_tint_d=jnp.asarray(
            (share * rng.uniform(0.6, 1.4, size=(g, 3))).astype(np.float32)),
        group_tint_i=jnp.asarray(
            (share * rng.uniform(0.4, 1.1, size=(g, 3))).astype(np.float32)),
        group_albedo_mix=jnp.asarray(
            np.concatenate([[1.0], rng.uniform(0.2, 0.9, size=g - 1)]
                           ).astype(np.float32)),
    )


def make_scene_jax(key: Array, n_spheres: int = 7,
                   groups: Sequence[str] = LIGHT_GROUPS) -> Scene:
    """jax.random twin of make_scene: every draw comes from `key`, so scene
    generation can live INSIDE a jitted training-batch program (the other
    families' pattern, data/synthetic_jax.py). Same parameter ranges as the
    numpy draw; the streams differ (this is a training corpus, not a
    replacement for the eval family's seed contract)."""
    ks = jax.random.split(key, 18)
    u = jax.random.uniform
    centers = jnp.stack([
        u(ks[0], (n_spheres,), minval=-4.0, maxval=4.0),
        u(ks[1], (n_spheres,), minval=0.4, maxval=2.5),
        u(ks[2], (n_spheres,), minval=4.0, maxval=12.0),
    ], axis=-1)
    radii = u(ks[3], (n_spheres,), minval=0.4, maxval=1.4)
    centers = centers.at[:, 1].set(
        jnp.maximum(centers[:, 1], radii * 0.6))

    # the firefly source: one bright emitter 80% of the time
    emit_on = (u(ks[4], ()) < 0.8).astype(jnp.float32)
    emit_idx = jax.random.randint(ks[5], (), 0, n_spheres)
    emission = (jax.nn.one_hot(emit_idx, n_spheres)[:, None]
                * u(ks[6], (3,), minval=30.0, maxval=120.0) * emit_on)

    light_dir = jax.random.normal(ks[7], (3,))
    light_dir = light_dir.at[1].set(jnp.abs(light_dir[1]) + 1.2)
    light_dir = light_dir / jnp.linalg.norm(light_dir)
    light_center = light_dir * u(ks[8], (), minval=14.0, maxval=22.0)
    light_center = light_center.at[1].set(
        jnp.maximum(light_center[1], 8.0))
    ln = -light_center / jnp.linalg.norm(light_center)

    g = len(groups)
    share = jnp.asarray([1.0, 0.45, 0.2, 0.12][:g], jnp.float32)[:, None]
    return Scene(
        centers=centers,
        radii=radii,
        sphere_albedo=u(ks[9], (n_spheres, 3), minval=0.05, maxval=0.95),
        emission=emission,
        plane_albedo=u(ks[10], (2, 3), minval=0.1, maxval=0.9),
        checker_scale=u(ks[11], (), minval=0.6, maxval=1.4),
        light_center=light_center,
        light_radius=u(ks[12], (), minval=1.0, maxval=3.5),
        light_normal=ln,
        light_radiance=(u(ks[13], (3,), minval=4.0, maxval=12.0)
                        * u(ks[14], (), minval=2.0, maxval=5.0)),
        sky_top=u(ks[15], (3,), minval=0.1, maxval=0.5),
        sky_hor=u(ks[16], (3,), minval=0.3, maxval=0.8),
        group_tint_d=share * u(ks[17], (g, 3), minval=0.6, maxval=1.4),
        group_tint_i=share * u(jax.random.fold_in(key, 101), (g, 3),
                               minval=0.4, maxval=1.1),
        group_albedo_mix=jnp.concatenate([
            jnp.ones((1,)),
            u(jax.random.fold_in(key, 102), (g - 1,), minval=0.2, maxval=0.9),
        ]),
    )


# --- geometry helpers (all vectorized over (..., 3) rays) -----------------

def _intersect(scene: Scene, origin: Array, dirs: Array
               ) -> Tuple[Array, Array]:
    """Nearest hit along rays. origin/dirs (..., 3).

    Returns (t, hit_id): t = distance (inf on miss), hit_id = sphere index,
    -1 for the ground plane, -2 for sky."""
    dy = dirs[..., 1]
    oy = origin[..., 1]
    t_plane = jnp.where(dy < -1e-6, -oy / jnp.minimum(dy, -1e-6), jnp.inf)
    t_best = jnp.where(t_plane > 1e-4, t_plane, jnp.inf)
    hit_id = jnp.where(jnp.isfinite(t_best), -1, -2)
    n = scene.centers.shape[0]
    for i in range(n):  # static unroll: N is small and shapes stay fused
        oc = origin - scene.centers[i]
        b = (dirs * oc).sum(-1)
        c = (oc * oc).sum(-1) - scene.radii[i] ** 2
        disc = b * b - c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        t = jnp.where(t0 > 1e-3, t0, t1)
        t = jnp.where((disc > 0) & (t > 1e-3), t, jnp.inf)
        closer = t < t_best
        t_best = jnp.where(closer, t, t_best)
        hit_id = jnp.where(closer, i, hit_id)
    return t_best, hit_id


def _occluded(scene: Scene, origin: Array, dirs: Array, max_t: Array) -> Array:
    """Boolean (...,): any sphere blocks the segment [0, max_t) along dirs.
    The ground plane never occludes light from above (light sits high)."""
    occ = jnp.zeros(origin.shape[:-1], bool)
    n = scene.centers.shape[0]
    for i in range(n):
        oc = origin - scene.centers[i]
        b = (dirs * oc).sum(-1)
        c = (oc * oc).sum(-1) - scene.radii[i] ** 2
        disc = b * b - c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sq
        occ = occ | ((disc > 0) & (t0 > 1e-3) & (t0 < max_t))
    return occ


def _sky(scene: Scene, dirs: Array) -> Array:
    t = jnp.clip(dirs[..., 1:2] * 1.5 + 0.2, 0.0, 1.0)
    return t * scene.sky_top + (1.0 - t) * scene.sky_hor


def _surface_albedo(scene: Scene, points: Array, hit_id: Array) -> Array:
    """Diffuse-group albedo at surface points (used for bounce shading and
    as the base of the per-group albedo passes)."""
    check = ((jnp.floor(points[..., 0] * scene.checker_scale)
              + jnp.floor(points[..., 2] * scene.checker_scale)) % 2
             )[..., None]
    albedo = scene.plane_albedo[0] * check + scene.plane_albedo[1] * (1 - check)
    n = scene.centers.shape[0]
    for i in range(n):
        albedo = jnp.where((hit_id == i)[..., None], scene.sphere_albedo[i],
                           albedo)
    return jnp.where((hit_id >= -1)[..., None], albedo, 0.0)


def _surface_normal(scene: Scene, points: Array, hit_id: Array) -> Array:
    normal = jnp.zeros_like(points).at[..., 1].set(1.0)  # plane default
    n = scene.centers.shape[0]
    for i in range(n):
        ni = (points - scene.centers[i]) / scene.radii[i]
        normal = jnp.where((hit_id == i)[..., None], ni, normal)
    return normal


def _emitted(scene: Scene, hit_id: Array) -> Array:
    em = jnp.zeros(hit_id.shape + (3,), jnp.float32)
    n = scene.centers.shape[0]
    for i in range(n):
        em = jnp.where((hit_id == i)[..., None], scene.emission[i], em)
    return em


def _sample_disk(scene: Scene, key: Array, shape) -> Array:
    """Uniform points on the area light disk, (..., 3)."""
    k1, k2 = jax.random.split(key)
    r = scene.light_radius * jnp.sqrt(jax.random.uniform(k1, shape))
    phi = 2.0 * jnp.pi * jax.random.uniform(k2, shape)
    ln = scene.light_normal
    # orthonormal frame around the light normal
    up = jnp.where(jnp.abs(ln[1]) < 0.9, jnp.array([0.0, 1.0, 0.0]),
                   jnp.array([1.0, 0.0, 0.0]))
    tx = jnp.cross(up, ln)
    tx = tx / jnp.linalg.norm(tx)
    ty = jnp.cross(ln, tx)
    return (scene.light_center
            + (r * jnp.cos(phi))[..., None] * tx
            + (r * jnp.sin(phi))[..., None] * ty)


def _cosine_dir(normal: Array, key: Array, shape) -> Array:
    """Cosine-weighted hemisphere directions about per-pixel normals."""
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, shape, minval=1e-7)
    u2 = jax.random.uniform(k2, shape)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    # per-pixel frame about the normal
    up = jnp.where((jnp.abs(normal[..., 1:2]) < 0.9),
                   jnp.array([0.0, 1.0, 0.0]), jnp.array([1.0, 0.0, 0.0]))
    tx = jnp.cross(up, normal)
    tx = tx / jnp.maximum(jnp.linalg.norm(tx, axis=-1, keepdims=True), 1e-6)
    ty = jnp.cross(normal, tx)
    return x[..., None] * tx + y[..., None] * ty + z[..., None] * normal


def _direct_sample(scene: Scene, pts: Array, normal: Array, key: Array
                   ) -> Array:
    """One area-light sample of the direct (demodulated) radiance at pts.

    Standard uniform-area sampling: estimate = L_e * V * cos_surf *
    cos_light * A / (pi * d^2) with pdf = 1/A over the disk."""
    shape = pts.shape[:-1]
    q = _sample_disk(scene, key, shape)
    to_l = q - pts
    d2 = jnp.maximum((to_l * to_l).sum(-1), 1e-6)
    dist = jnp.sqrt(d2)
    wi = to_l / dist[..., None]
    cos_s = jnp.maximum((normal * wi).sum(-1), 0.0)
    cos_l = jnp.maximum((-wi * scene.light_normal).sum(-1), 0.0)
    vis = ~_occluded(scene, pts + normal * 1e-3, wi, dist - 1e-2)
    area = jnp.pi * scene.light_radius ** 2
    geom = vis * cos_s * cos_l * area / (jnp.pi * d2)
    return geom[..., None] * scene.light_radiance


def _indirect_sample(scene: Scene, pts: Array, normal: Array, key: Array
                     ) -> Array:
    """One cosine-hemisphere sample of incoming (demodulated) radiance.

    The cosine pdf cancels the cos/pi BRDF factor, so the estimator is
    simply the incoming radiance along the sampled direction: sky on miss,
    emission + albedo * one-bounce direct on hit — the firefly path is a
    hemisphere ray hitting a bright emissive sphere."""
    kd, kl = jax.random.split(key)
    shape = pts.shape[:-1]
    d = _cosine_dir(normal, kd, shape)
    org = pts + normal * 1e-3
    t, hid = _intersect(scene, org, d)
    t_safe = jnp.where(jnp.isfinite(t), t, 1.0)
    hpts = org + d * t_safe[..., None]
    hnorm = _surface_normal(scene, hpts, hid)
    halb = _surface_albedo(scene, hpts, hid)
    bounce_direct = _direct_sample(scene, hpts, hnorm, kl)
    hit_rad = _emitted(scene, hid) + halb * bounce_direct
    return jnp.where((hid >= -1)[..., None], hit_rad, _sky(scene, d))


def render(scene: Scene, height: int, width: int, spp: int, key: Array,
           groups: Sequence[str] = LIGHT_GROUPS,
           window_origin=None, full_shape=None) -> Dict[str, Array]:
    """Trace one frame at `spp` samples/pixel; returns the full pass dict.

    Jittable (static height/width/spp/groups). The estimate at spp=s and
    the GT at spp=1024 are the same estimator — only the sample keys and
    counts differ.

    `window_origin=(oy, ox)` + `full_shape=(fh, fw)` render a height×width
    CROP of a virtual fh×fw frame (pixel offsets may be traced values —
    training draws random windows inside one jitted program). The default
    (None, None) reproduces the full-frame mapping exactly."""
    # --- primary rays: deterministic (pixel centers) ----------------------
    fh, fw = (height, width) if full_shape is None else full_shape
    aspect = fw / fh
    fov = 0.9
    oy, ox = (0, 0) if window_origin is None else window_origin
    # global mapping: yy 1..-1 over the FULL frame, xx -aspect..aspect —
    # identical to the original linspace endpoints when the window is the
    # whole frame
    yy = (1.0 - 2.0 * (oy + jnp.arange(height, dtype=jnp.float32))
          / (fh - 1))[:, None]
    xx = (-aspect + 2.0 * aspect * (ox + jnp.arange(width, dtype=jnp.float32))
          / (fw - 1))[None, :]
    origin = jnp.array([0.0, 1.5, 0.0], jnp.float32)
    dirs = jnp.stack([
        jnp.broadcast_to(xx * fov, (height, width)),
        jnp.broadcast_to(yy * fov, (height, width)),
        jnp.full((height, width), 1.0),
    ], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    t, hit_id = _intersect(scene, origin, dirs)
    hit = hit_id >= -1
    t_safe = jnp.where(jnp.isfinite(t), t, 50.0)
    pts = origin + dirs * t_safe[..., None]
    normal = _surface_normal(scene, pts, hit_id)

    # --- deterministic buffers (noise-free, as in Cycles) -----------------
    out: Dict[str, Array] = {}
    view_n = jnp.stack([normal[..., 0], normal[..., 1], -normal[..., 2]],
                       axis=-1)
    view_n = jnp.where(hit[..., None], view_n,
                       jnp.array([0.0, 0.0, 1.0]))
    view_n = view_n / jnp.maximum(
        jnp.linalg.norm(view_n, axis=-1, keepdims=True), 1e-6)
    out["normal"] = view_n.astype(jnp.float32)
    out["depth"] = jnp.where(hit, t_safe, 50.0)[..., None].astype(jnp.float32)
    out["alpha"] = hit[..., None].astype(jnp.float32)
    out["emission"] = _emitted(scene, hit_id) * hit[..., None]
    out["environment"] = _sky(scene, dirs) * (~hit)[..., None]

    base_albedo = _surface_albedo(scene, pts, hit_id)

    # --- the Monte-Carlo estimate: mean of spp i.i.d. samples -------------
    def body(s, acc):
        acc_d, acc_i = acc
        ks = jax.random.fold_in(key, s)
        kd, ki = jax.random.split(ks)
        acc_d = acc_d + _direct_sample(scene, pts, normal, kd)
        acc_i = acc_i + _indirect_sample(scene, pts, normal, ki)
        return acc_d, acc_i

    zero = jnp.zeros((height, width, 3), jnp.float32)
    d_sum, i_sum = jax.lax.fori_loop(0, spp, body, (zero, zero))
    d_est = d_sum / spp * hit[..., None]
    i_est = i_sum / spp * hit[..., None]

    grey = jnp.full_like(base_albedo, 0.7)
    for gi, g in enumerate(groups):
        d_name, i_name, c_name = passes.group_passes(g)
        mix = scene.group_albedo_mix[gi]
        out[c_name] = (mix * base_albedo + (1.0 - mix) * grey
                       ) * hit[..., None]
        out[d_name] = d_est * scene.group_tint_d[gi]
        out[i_name] = i_est * scene.group_tint_i[gi]

    # recomposition identity holds by construction (combined is recomposed
    # from the traced passes — transforms.recompose's jnp algebra)
    from deepdenoiser_tpu import transforms

    out["combined"] = transforms.recompose(out, groups=tuple(groups))
    return out


# --- host-side family API (matches the other synthetic families) ----------

# module-level jit wrapper: per-call `jax.jit(render)` would recompile on
# every invocation (fresh function identity); this one caches across calls
# with the same static (height, width, spp, groups, full_shape)
_render_jit = jax.jit(render, static_argnums=(1, 2, 3, 5, 7))

def generate_clean_passes(height: int, width: int, seed: int = 0,
                          spp: int = DEFAULT_GT_SPP,
                          groups: Sequence[str] = LIGHT_GROUPS
                          ) -> Dict[str, np.ndarray]:
    """High-spp converged render as the ground truth. Residual noise power
    is spp_gt/spp_noisy below the noisy realization (24 dB for 1024 vs 4)."""
    scene = make_scene(seed, groups=groups)
    out = _render_jit(scene, height, width, spp,
                      jax.random.PRNGKey(seed * 7919 + 1), tuple(groups))
    return {k: np.asarray(v) for k, v in out.items()}


def generate_noisy_passes(height: int, width: int, seed: int = 0,
                          spp: int = 4, sample_seed: int = 0,
                          groups: Sequence[str] = LIGHT_GROUPS
                          ) -> Dict[str, np.ndarray]:
    """A genuine spp-sample MC realization of the SAME scene; the sample
    key stream is disjoint from the GT's."""
    scene = make_scene(seed, groups=groups)
    key = jax.random.fold_in(jax.random.PRNGKey(seed * 7919 + 2),
                             sample_seed)
    out = _render_jit(scene, height, width, spp, key, tuple(groups))
    return {k: np.asarray(v) for k, v in out.items()}


def generate_frame_set(height: int, width: int, seed: int,
                       spps: Sequence[int] = (4, 16), n_seeds: int = 2,
                       gt_spp: int = DEFAULT_GT_SPP,
                       groups: Sequence[str] = LIGHT_GROUPS
                       ) -> Tuple[Dict[str, np.ndarray], list]:
    """(clean, [noisy...]) with the frame-set contract of the other
    families — but every noisy variant is a true N-sample estimate."""
    clean = generate_clean_passes(height, width, seed, spp=gt_spp,
                                  groups=groups)
    noisy = [
        generate_noisy_passes(height, width, seed, spp=spp,
                              sample_seed=97 * k + spp, groups=groups)
        for spp in spps
        for k in range(n_seeds)
    ]
    return clean, noisy
