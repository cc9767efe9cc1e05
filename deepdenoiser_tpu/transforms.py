"""Pure-JAX feature engineering: per-pass normalization and its inverse,
albedo demodulation, screen-space normal encoding, and the recomposition
algebra.

Rebuilds the reference's FeatureEngineering layer
(upstream: TensorFlow/FeatureEngineering.py — SURVEY.md C4) as pure
functions over NHWC arrays so they fuse into the first conv under XLA and
can be swapped for the Pallas fused-ingest kernel (ops/fused_ingest.py).

Invariants tested in tests/test_transforms.py:
  * denormalize(normalize(x)) == x to fp tolerance for every PassKind
  * remodulate(demodulate(d, albedo), albedo) == d exactly where albedo > eps
  * recompose(decompose-consistent pass set) == combined
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp

from deepdenoiser_tpu import passes
from deepdenoiser_tpu.passes import LIGHT_GROUPS, PassKind

Array = jax.Array

# Epsilon used for albedo demodulation. Demod/remod by (albedo + EPS) is an
# exact algebraic round-trip for every albedo value (including 0), unlike a
# thresholded divide — see SURVEY.md §7 "hard parts".
DEMOD_EPS = 1e-2

# ---------------------------------------------------------------------------
# Per-kind scalar normalizations (elementwise; XLA fuses these into convs)
# ---------------------------------------------------------------------------


def _norm_radiance(x: Array) -> Array:
    return jnp.log1p(jnp.maximum(x, 0.0))


def _denorm_radiance(y: Array) -> Array:
    return jnp.expm1(jnp.maximum(y, 0.0))


def _identity(x: Array) -> Array:
    return x


def _norm_normal(x: Array) -> Array:
    # Screen-space normals arrive in [-1, 1]; clamp against EXR garbage.
    return jnp.clip(x, -1.0, 1.0)


def _norm_alpha(x: Array) -> Array:
    return jnp.clip(x, 0.0, 1.0)


_NORM = {
    PassKind.RADIANCE: _norm_radiance,
    PassKind.COLOR: _identity,
    PassKind.NORMAL: _norm_normal,
    PassKind.DEPTH: lambda x: jnp.log1p(jnp.maximum(x, 0.0)),
    PassKind.ALPHA: _norm_alpha,
}

_DENORM = {
    PassKind.RADIANCE: _denorm_radiance,
    PassKind.COLOR: _identity,
    PassKind.NORMAL: _identity,  # already in representation space
    PassKind.DEPTH: lambda y: jnp.expm1(jnp.maximum(y, 0.0)),
    PassKind.ALPHA: _identity,
}


def normalize(pass_name: str, x: Array, scale: float = 1.0) -> Array:
    """Map raw pass values to the network's input representation.

    `scale` is a statistics-driven pre-scale (upstream: DataStatistics
    feeding FeatureEngineering — SURVEY.md C7→C4): scene-scale-sensitive
    passes (depth) are multiplied by a corpus-derived factor before the
    kind-normalization, e.g. log1p(depth / mean_depth) instead of the
    scene-scale-dependent log1p(depth)."""
    f = _NORM[passes.get(pass_name).kind]
    return f(x * scale) if scale != 1.0 else f(x)


def denormalize(pass_name: str, y: Array, scale: float = 1.0) -> Array:
    """Inverse of `normalize` (up to clamping of invalid raw values)."""
    out = _DENORM[passes.get(pass_name).kind](y)
    return out / scale if scale != 1.0 else out


def _aux_scale(scales: Optional[Mapping[str, float]], name: str) -> float:
    return float(scales.get(name, 1.0)) if scales else 1.0


# Pseudo-pass key in `scales` holding the corpus-derived EXPOSURE pre-scale
# shared by every HDR radiance encode: log1p(exposure * radiance) instead of
# the absolute-scale-dependent log1p(radiance) (SURVEY.md C7→C4; VERDICT r2
# item 9 — HDR radiance is as scene-scale sensitive as depth). Derived by
# loader.derive_pass_scales (1 / mean combined radiance), frozen into the
# saved config, inverted exactly on decode.
RADIANCE_SCALE_KEY = "radiance"


def _exposure(scales: Optional[Mapping[str, float]]) -> float:
    return _aux_scale(scales, RADIANCE_SCALE_KEY)


def radiance_exposure(scales: Optional[Mapping[str, float]]) -> float:
    """Public accessor for the exposure pre-scale (1.0 when unset)."""
    return _exposure(scales)


# ---------------------------------------------------------------------------
# Albedo demodulation
# ---------------------------------------------------------------------------


def demodulate(radiance: Array, albedo: Array, eps: float = DEMOD_EPS) -> Array:
    """radiance / (albedo + eps): removes texture, leaving illumination.

    The albedo pass is (nearly) noise free, so denoising the demodulated
    signal and re-multiplying preserves texture detail exactly.
    """
    return radiance / (albedo + eps)


def remodulate(demod: Array, albedo: Array, eps: float = DEMOD_EPS) -> Array:
    """Exact inverse of `demodulate` for all albedo values."""
    return demod * (albedo + eps)


# ---------------------------------------------------------------------------
# Recomposition algebra
# ---------------------------------------------------------------------------


def recompose(
    pass_dict: Mapping[str, Array],
    groups: Sequence[str] = LIGHT_GROUPS,
) -> Array:
    """combined = Σ_g color_g ⊙ (direct_g + indirect_g) + emission + environment.

    Missing groups/extras are simply skipped, so partial pass sets compose.
    Alpha is NOT applied here; it is carried alongside for compositing.
    """
    combined: Optional[Array] = None

    def acc(c: Optional[Array], t: Array) -> Array:
        return t if c is None else c + t

    for g in groups:
        d_name, i_name, c_name = passes.group_passes(g)
        if d_name in pass_dict and c_name in pass_dict:
            radiance = pass_dict[d_name]
            if i_name in pass_dict:
                radiance = radiance + pass_dict[i_name]
            combined = acc(combined, pass_dict[c_name] * radiance)
    for extra in passes.COMPOSITE_EXTRA:
        if extra in pass_dict:
            combined = acc(combined, pass_dict[extra])
    if combined is None:
        raise ValueError("recompose: no recomposable passes in input")
    return combined


# ---------------------------------------------------------------------------
# Network-facing feature assembly
# ---------------------------------------------------------------------------


def encode_group_inputs(
    pass_dict: Mapping[str, Array],
    group: str,
    aux: Sequence[str] = passes.AUX_PASSES,
    eps: float = DEMOD_EPS,
    scales: Optional[Mapping[str, float]] = None,
) -> Array:
    """Stack the network input for one light group along channels (NHWC):

    [log1p(demod direct), log1p(demod indirect), albedo, normalized aux...]

    `scales` (optional): per-aux-pass statistics-driven pre-scales
    (SURVEY.md C7→C4), e.g. {'depth': 1/mean_depth}.
    """
    d_name, i_name, c_name = passes.group_passes(group)
    albedo = pass_dict[c_name]
    ex = _exposure(scales)
    feats = [
        _norm_radiance(ex * demodulate(pass_dict[d_name], albedo, eps)),
        _norm_radiance(ex * demodulate(pass_dict[i_name], albedo, eps)),
        albedo,
    ]
    for a in aux:
        feats.append(normalize(a, pass_dict[a], _aux_scale(scales, a)))
    return jnp.concatenate(feats, axis=-1)


def decode_group_outputs(
    net_out: Array,
    albedo: Array,
    eps: float = DEMOD_EPS,
    scales: Optional[Mapping[str, float]] = None,
) -> Dict[str, Array]:
    """Invert encode: net_out is [log demod direct (3), log demod indirect (3)].

    Returns raw-domain {'direct': ..., 'indirect': ...} for the group.
    `scales` must match the encode side (exposure inverted here).
    """
    ex = _exposure(scales)
    log_d, log_i = net_out[..., 0:3], net_out[..., 3:6]
    return {
        "direct": remodulate(_denorm_radiance(log_d) / ex, albedo, eps),
        "indirect": remodulate(_denorm_radiance(log_i) / ex, albedo, eps),
    }


def group_input_channels(aux: Sequence[str] = passes.AUX_PASSES) -> int:
    """Static channel count of encode_group_inputs' output."""
    return 9 + sum(passes.channels(a) for a in aux)


GROUP_OUTPUT_CHANNELS = 6  # denoised log-demod direct + indirect


def encode_flag_channels(flags: "passes.FeatureFlags", height: int, width: int) -> Array:
    """Feature-flag bits as constant input channels (upstream:
    FeatureFlags' flag tensors — SURVEY.md C3): lets one network train
    across scenes with heterogeneous pass sets. Concatenate to any encoded
    input stack; channel count == len(flags.mask_bits())."""
    bits = jnp.asarray(flags.mask_bits(), jnp.float32)
    return jnp.broadcast_to(bits[None, None, :], (height, width, bits.shape[0]))


def encode_joint_inputs(
    pass_dict: Mapping[str, Array],
    groups: Sequence[str] = LIGHT_GROUPS,
    aux: Sequence[str] = passes.AUX_PASSES,
    eps: float = DEMOD_EPS,
    scales: Optional[Mapping[str, float]] = None,
) -> Array:
    """Joint-group mode: every group's (log-demod direct, log-demod
    indirect, albedo) stacked into ONE channel stack plus shared aux.

    One network pass denoises all groups together — 1/G the deep-layer
    FLOPs of the per-group batch and the network sees cross-group context
    (e.g. glossy noise correlates with diffuse edges). Channel count:
    9 * len(groups) + aux.
    """
    ex = _exposure(scales)
    feats = []
    for g in groups:
        d_name, i_name, c_name = passes.group_passes(g)
        albedo = pass_dict[c_name]
        feats.append(_norm_radiance(ex * demodulate(pass_dict[d_name], albedo, eps)))
        feats.append(_norm_radiance(ex * demodulate(pass_dict[i_name], albedo, eps)))
        feats.append(albedo)
    for a in aux:
        feats.append(normalize(a, pass_dict[a], _aux_scale(scales, a)))
    return jnp.concatenate(feats, axis=-1)


def decode_joint_outputs(
    net_out: Array,
    pass_dict: Mapping[str, Array],
    groups: Sequence[str] = LIGHT_GROUPS,
    eps: float = DEMOD_EPS,
    scales: Optional[Mapping[str, float]] = None,
) -> Dict[str, Array]:
    """Invert encode_joint: net_out (..., 6*G) -> raw direct/indirect per
    group (albedo taken from pass_dict)."""
    out: Dict[str, Array] = {}
    for i, g in enumerate(groups):
        d_name, i_name, c_name = passes.group_passes(g)
        sl = net_out[..., 6 * i : 6 * (i + 1)]
        dec = decode_group_outputs(sl, pass_dict[c_name], eps, scales)
        out[d_name] = dec["direct"]
        out[i_name] = dec["indirect"]
    return out


def joint_input_channels(
    groups: Sequence[str] = LIGHT_GROUPS, aux: Sequence[str] = passes.AUX_PASSES
) -> int:
    return 9 * len(groups) + sum(passes.channels(a) for a in aux)


def joint_output_channels(groups: Sequence[str] = LIGHT_GROUPS) -> int:
    return 6 * len(groups)


def encode_rgb_inputs(
    pass_dict: Mapping[str, Array],
    aux: Sequence[str] = ("normal", "depth"),
    albedo_key: str = "diffuse_color",
    scales: Optional[Mapping[str, float]] = None,
) -> Array:
    """Combined-RGB mode input (BASELINE config #1): noisy RGB + albedo + aux."""
    feats = [_norm_radiance(_exposure(scales) * pass_dict["combined"]),
             pass_dict[albedo_key]]
    for a in aux:
        feats.append(normalize(a, pass_dict[a], _aux_scale(scales, a)))
    return jnp.concatenate(feats, axis=-1)


def decode_rgb_outputs(
    net_out: Array, scales: Optional[Mapping[str, float]] = None
) -> Array:
    """Inverse of the combined-RGB encoding: log radiance → radiance."""
    return _denorm_radiance(net_out) / _exposure(scales)


def rgb_input_channels(aux: Sequence[str] = ("normal", "depth")) -> int:
    return 6 + sum(passes.channels(a) for a in aux)
