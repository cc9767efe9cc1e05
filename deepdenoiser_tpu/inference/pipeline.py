"""Full-frame multi-pass denoising pipeline (BASELINE configs 2/3/5;
upstream: the denoise call stack of SURVEY.md §3.3).

ONE jitted program per frame geometry does everything on-device:
  normalize/demodulate every light group  →  stack groups into one tile
  batch (4x the MXU work per dispatch)    →  tiled CNN forward
  →  inverse transforms (remodulate, expm1)  →  recomposition
  Σ color⊙(direct+indirect) + emission + environment  →  final RGB.

The host only supplies raw pass buffers and receives the denoised frame —
no per-tile dispatch, no host-side recomposition (SURVEY.md §3.3 "rebuild").
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Sequence

import jax
import jax.numpy as jnp

from deepdenoiser_tpu import passes, transforms
from deepdenoiser_tpu.config import InferenceConfig
from deepdenoiser_tpu.inference import tiled
from deepdenoiser_tpu.models import factory
from deepdenoiser_tpu.models.factory import ModelConfig
from deepdenoiser_tpu.parallel import halo as halo_lib

Array = jax.Array


def _make_apply(
    model_cfg: ModelConfig, params, compute_dtype: str, kpn_pallas: bool = False
):
    # kpn_pallas: inference-time swap to the Pallas VMEM filter apply
    # (bit-exact, 4.8x the XLA shift-accumulate on v5e; no VJP, so the
    # training path never sets it). TPU-only: off-TPU the kernel would run
    # in slow interpret mode, so the XLA path stays.
    if jax.default_backend() != "tpu":
        kpn_pallas = False
    model = factory.build_model(
        dataclasses.replace(
            model_cfg,
            compute_dtype=compute_dtype,
            kpn_pallas=model_cfg.kpn_pallas or kpn_pallas,
        )
    )
    def apply_fn(x: Array) -> Array:
        return model.apply(params, x)
    return apply_fn


def plan_for(
    model_cfg: ModelConfig, infer_cfg: InferenceConfig, height: int, width: int
) -> tiled.TileGrid:
    halo = infer_cfg.halo if infer_cfg.halo > 0 else factory.halo(model_cfg)
    if (
        infer_cfg.tile == 0
        and not infer_cfg.spatial_shard
        and infer_cfg.border >= 0
    ):
        # Whole-frame mode: the pad is border CONTEXT only (no seams to
        # certify), so a smaller reflect border is a pure latency win; see
        # InferenceConfig.border.
        halo = min(halo, infer_cfg.border)
    return tiled.plan_grid(
        height, width, infer_cfg.tile, halo, factory.spatial_multiple(model_cfg)
    )


def make_group_frame_denoiser(
    model_cfg: ModelConfig,
    infer_cfg: InferenceConfig,
    height: int,
    width: int,
    groups: Sequence[str] = passes.LIGHT_GROUPS,
    aux: Sequence[str] = passes.AUX_PASSES,
    mesh=None,
    scales=None,
):
    """Jitted fn: params, {pass_name: (H,W,C)} -> outputs dict.

    Outputs: denoised '<g>_direct'/'<g>_indirect' for each group, plus
    'combined' recomposited on-device (emission/environment/alpha passed
    through — they are near noise-free in Cycles).

    With infer_cfg.spatial_shard and a mesh carrying a 'spatial' axis, the
    CNN runs band-parallel across chips with ppermute halo exchange
    (parallel/halo.py) instead of the single-chip tile grid.
    """
    grid = plan_for(model_cfg, infer_cfg, height, width)
    groups = tuple(groups)
    aux = tuple(aux)
    if infer_cfg.use_pallas_ingest:
        from deepdenoiser_tpu.ops.fused_ingest import (
            encode_group_inputs_pallas as encode_group,
        )
    else:
        encode_group = transforms.encode_group_inputs

    spatial = infer_cfg.spatial_shard and mesh is not None

    @jax.jit
    def denoise(params, pass_dict: Mapping[str, Array]) -> Dict[str, Array]:
        apply_fn = _make_apply(model_cfg, params, infer_cfg.compute_dtype, infer_cfg.kpn_pallas)
        if spatial:
            frame_fn = halo_lib.make_spatial_apply_batched(
                apply_fn, mesh, height, width,
                grid.halo, factory.spatial_multiple(model_cfg),
            )
        else:
            frame_fn = tiled.make_tiled_apply(
                apply_fn, grid, transforms.GROUP_OUTPUT_CHANNELS,
                tile_batch=infer_cfg.tile_batch, batch_dims=1,
                feather=infer_cfg.stitch == "feather",
            )
        # Encode all groups, stack along a leading batch axis. (With
        # stats-driven scales the pure-JAX encoder is used even when
        # use_pallas_ingest is set — the Pallas kernels bake the unscaled
        # transforms; XLA fuses the scaled path equally well.)
        if scales:
            enc = jnp.stack(
                [
                    transforms.encode_group_inputs(pass_dict, g, aux, scales=scales)
                    for g in groups
                ],
                0,
            )
        else:
            enc = jnp.stack([encode_group(pass_dict, g, aux) for g in groups], 0)
        dec = frame_fn(enc)  # (G, H, W, 6) log-demod direct+indirect

        out: Dict[str, Array] = {}
        for i, g in enumerate(groups):
            d_name, i_name, c_name = passes.group_passes(g)
            decoded = transforms.decode_group_outputs(dec[i], pass_dict[c_name], scales=scales)
            out[d_name] = decoded["direct"]
            out[i_name] = decoded["indirect"]
            out[c_name] = pass_dict[c_name]
        for extra in passes.COMPOSITE_EXTRA + ("alpha",):
            if extra in pass_dict:
                out[extra] = pass_dict[extra]
        out["combined"] = transforms.recompose(out, groups)
        return out

    return denoise, grid


def make_joint_frame_denoiser(
    model_cfg: ModelConfig,
    infer_cfg: InferenceConfig,
    height: int,
    width: int,
    groups: Sequence[str] = passes.LIGHT_GROUPS,
    aux: Sequence[str] = passes.AUX_PASSES,
    mesh=None,
    use_flags: bool = False,
    scales=None,
):
    """Joint-group mode: all light groups denoised in ONE network pass
    (channels-stacked — see transforms.encode_joint_inputs). Same output
    contract as make_group_frame_denoiser.

    use_flags (SURVEY.md C3): for flag-conditioned models, groups absent
    from the input pass_dict are zero-filled, their presence bits appended
    as constant flag planes, and their (meaningless) outputs dropped from
    the recomposition — a frame lacking e.g. subsurface denoises normally.
    """
    grid = plan_for(model_cfg, infer_cfg, height, width)
    groups = tuple(groups)
    aux = tuple(aux)
    out_ch = transforms.joint_output_channels(groups)
    spatial = infer_cfg.spatial_shard and mesh is not None

    @jax.jit
    def denoise(params, pass_dict: Mapping[str, Array]) -> Dict[str, Array]:
        apply_fn = _make_apply(model_cfg, params, infer_cfg.compute_dtype, infer_cfg.kpn_pallas)
        pd = dict(pass_dict)
        present = groups
        if use_flags:
            # Presence is static: dict keys are known at trace time.
            present = tuple(
                g for g in groups
                if all(nm in pass_dict for nm in passes.group_passes(g))
            )
            for g in groups:
                if g not in present:
                    for nm in passes.group_passes(g):
                        pd[nm] = jnp.zeros((height, width, 3), jnp.float32)
        enc = transforms.encode_joint_inputs(pd, groups, aux, scales=scales)
        if use_flags:
            bits = jnp.asarray(
                [1.0 if g in present else 0.0 for g in groups], jnp.float32
            )
            planes = jnp.broadcast_to(
                bits[None, None, :], (height, width, len(groups))
            )
            enc = jnp.concatenate([enc, planes], axis=-1)
        if spatial:
            frame_fn = halo_lib.make_spatial_apply_batched(
                apply_fn, mesh, height, width,
                grid.halo, factory.spatial_multiple(model_cfg),
            )
            dec = frame_fn(enc[None])[0]
        else:
            frame_fn = tiled.make_tiled_apply(
                apply_fn, grid, out_ch, tile_batch=infer_cfg.tile_batch,
                feather=infer_cfg.stitch == "feather",
            )
            dec = frame_fn(enc)

        decoded = transforms.decode_joint_outputs(dec, pd, groups, scales=scales)
        out: Dict[str, Array] = {}
        for g in present:
            d_name, i_name, c_name = passes.group_passes(g)
            out[d_name] = decoded[d_name]
            out[i_name] = decoded[i_name]
            out[c_name] = pass_dict[c_name]
        for extra in passes.COMPOSITE_EXTRA + ("alpha",):
            if extra in pass_dict:
                out[extra] = pass_dict[extra]
        out["combined"] = transforms.recompose(out, present)
        return out

    return denoise, grid


def make_rgb_frame_denoiser(
    model_cfg: ModelConfig,
    infer_cfg: InferenceConfig,
    height: int,
    width: int,
    aux: Sequence[str] = ("normal", "depth"),
    albedo_key: str = "diffuse_color",
    scales=None,
):
    """Jitted fn for combined-RGB mode (BASELINE config #1 path at frame
    scale): noisy combined + albedo + aux -> denoised combined."""
    grid = plan_for(model_cfg, infer_cfg, height, width)
    aux = tuple(aux)

    @jax.jit
    def denoise(params, pass_dict: Mapping[str, Array]) -> Dict[str, Array]:
        apply_fn = _make_apply(model_cfg, params, infer_cfg.compute_dtype, infer_cfg.kpn_pallas)
        frame_fn = tiled.make_tiled_apply(
            apply_fn, grid, 3, tile_batch=infer_cfg.tile_batch, batch_dims=0,
            feather=infer_cfg.stitch == "feather",
        )
        enc = transforms.encode_rgb_inputs(pass_dict, aux, albedo_key, scales=scales)
        out = frame_fn(enc)
        return {"combined": transforms.decode_rgb_outputs(out, scales)}

    return denoise, grid


def denoise_crop(
    model_cfg: ModelConfig,
    params,
    pass_dict: Mapping[str, Array],
    aux: Sequence[str] = ("normal", "depth"),
    albedo_key: str = "diffuse_color",
) -> Array:
    """BASELINE config #1: single-crop RGB denoise, no tiling (crop must be
    divisible by the model's spatial multiple). CPU-friendly."""
    model = factory.build_model(model_cfg)
    enc = transforms.encode_rgb_inputs(pass_dict, tuple(aux), albedo_key)[None]
    out = model.apply(params, enc)[0]
    return transforms.decode_rgb_outputs(out)
