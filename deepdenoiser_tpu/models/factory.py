"""Model factory: one config dataclass → (Flax module, receptive field,
spatial multiple). The declarative twin of the reference's JSON
architecture configs (upstream: TensorFlow/*.json — SURVEY.md C18).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from deepdenoiser_tpu.models import kpn, multiscale
from deepdenoiser_tpu.models.tiramisu import Tiramisu, TiramisuSpec
from deepdenoiser_tpu.models.unet import UNet, UNetSpec

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture spec, serializable to JSON via config.py."""

    backbone: str = "unet"  # 'unet' | 'tiramisu'
    in_channels: int = 14
    out_channels: int = 6
    n_scales: int = 1  # >1 enables multi-scale prediction
    kernel_prediction: bool = False
    kpn_size: int = 5
    kpn_slots: int = 2  # e.g. direct + indirect
    kpn_pallas: bool = False  # VMEM filter apply instead of im2col patches
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'
    # unet params
    base_width: int = 64
    depth: int = 3
    convs_per_level: int = 2
    act: str = "relu"
    stem_stride: int = 1  # 2 = space-to-depth stem (half-res network)
    # tiramisu params
    growth_rate: int = 16
    layers_per_block: int = 4

    @property
    def dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.compute_dtype]


class DenoiserModel(nn.Module):
    """Top-level module: (multi-scale) backbone, optionally KPN-headed.

    __call__(x) where x is the encoded feature stack (NHWC). With
    kernel_prediction, the noisy signal is x's leading 3*kpn_slots channels
    (the convention of transforms.encode_group_inputs / encode_rgb_inputs).
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        out_ch = (
            cfg.kpn_slots * cfg.kpn_size**2 if cfg.kernel_prediction else cfg.out_channels
        )
        if cfg.backbone == "unet":
            spec = UNetSpec(
                base_width=cfg.base_width,
                depth=cfg.depth,
                convs_per_level=cfg.convs_per_level,
                act=cfg.act,
                stem_stride=cfg.stem_stride,
            )
            backbone: nn.Module = UNet(spec, out_ch, dtype=cfg.dtype)
        elif cfg.backbone == "tiramisu":
            tspec = TiramisuSpec(
                growth_rate=cfg.growth_rate,
                layers_per_block=cfg.layers_per_block,
                depth=cfg.depth,
                act=cfg.act,
            )
            backbone = Tiramisu(tspec, out_ch, dtype=cfg.dtype)
        else:
            raise ValueError(f"unknown backbone {cfg.backbone!r}")

        net: nn.Module = backbone
        if cfg.n_scales > 1:
            net = multiscale.MultiScale(backbone, cfg.n_scales)

        if cfg.kernel_prediction:
            signal = x[..., : 3 * cfg.kpn_slots]
            head = kpn.KernelPredictionHead(
                net, kernel_size=cfg.kpn_size, n_slots=cfg.kpn_slots,
                use_pallas=cfg.kpn_pallas, dtype=cfg.dtype,
            )
            # KPN filters the *linear-domain* signal; callers pass encoded
            # (log-demod) channels, filter there — convex combos in log space
            # are still stable; decode happens downstream as usual.
            return head(x, signal)
        return net(x)


def _backbone_spec(cfg: ModelConfig):
    if cfg.backbone == "unet":
        return UNetSpec(
            base_width=cfg.base_width, depth=cfg.depth,
            convs_per_level=cfg.convs_per_level, act=cfg.act,
            stem_stride=cfg.stem_stride,
        )
    if cfg.backbone == "tiramisu":
        return TiramisuSpec(
            growth_rate=cfg.growth_rate, layers_per_block=cfg.layers_per_block,
            depth=cfg.depth, act=cfg.act,
        )
    raise ValueError(f"unknown backbone {cfg.backbone!r}")


def rf_state(cfg: ModelConfig):
    """Certified per-side RF bounds for the full model (backbone +
    multi-scale + KPN). The tiling engine's halo source of truth."""
    spec = _backbone_spec(cfg)
    if cfg.n_scales > 1:
        s = multiscale.multiscale_rf_state(spec.rf_state, cfg.n_scales)
    else:
        s = spec.rf_state()
    if cfg.kernel_prediction:
        s = s.conv(cfg.kpn_size)  # per-pixel filter = one more kxk window
    return s


def receptive_field(cfg: ModelConfig) -> int:
    return rf_state(cfg).r


def halo(cfg: ModelConfig) -> int:
    """One-sided halo (pixels) guaranteeing seam-free tiled inference."""
    return rf_state(cfg).halo


def spatial_multiple(cfg: ModelConfig) -> int:
    m = _backbone_spec(cfg).spatial_multiple
    if cfg.n_scales > 1:
        m = multiscale.multiscale_spatial_multiple(m, cfg.n_scales)
    return m


def build_model(cfg: ModelConfig) -> DenoiserModel:
    return DenoiserModel(cfg)


def init_params(cfg: ModelConfig, rng: jax.Array, spatial: int = 64):
    """Initialize parameters on a spatial x spatial dummy input."""
    model = build_model(cfg)
    x = jnp.zeros((1, spatial, spatial, cfg.in_channels), jnp.float32)
    return model.init(rng, x)
