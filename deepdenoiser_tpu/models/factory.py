"""Model factory: one config dataclass → (Flax module, receptive field,
spatial multiple). The declarative twin of the reference's JSON
architecture configs (upstream: TensorFlow/*.json — SURVEY.md C18).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

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
    # RMS-normalize kernel logits + bounded learned temperature (r3 KPN
    # stability fix — see models/kpn.py docstring). New param 'kernel_temp',
    # so default-False keeps pre-r3 checkpoints loadable.
    kpn_logit_norm: bool = False
    # Predict a correction to the noisy encoded signal instead of the signal:
    # out = net(x) + signal_channels(x). Untrained nets start near-identity
    # and training strictly improves on the input. Signal channels are
    # located by the encode conventions (transforms.py): rgb first 3,
    # group first 6, joint 6-of-9 per group.
    predict_residual: bool = False
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'
    # unet params
    base_width: int = 64
    depth: int = 3
    convs_per_level: int = 2
    act: str = "relu"
    stem_stride: int = 1  # 2 = space-to-depth stem (half-res network)
    remat: bool = False  # jax.checkpoint conv stacks (large-crop training)
    # tiramisu params
    growth_rate: int = 16
    layers_per_block: int = 4
    up_compress: int = 0  # >0: bound up-path concat width via 1x1 conv
    layers_top: int = 0  # >0: thinner dense blocks at full res only

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
    def __call__(self, x: Array, return_scales: bool = False):
        cfg = self.cfg
        if return_scales:
            assert cfg.n_scales > 1 and not cfg.kernel_prediction, (
                "return_scales needs a multi-scale, non-KPN model"
            )
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
                remat=cfg.remat,
            )
            backbone: nn.Module = UNet(
                spec, out_ch,
                head_zero_init=cfg.predict_residual and not cfg.kernel_prediction,
                dtype=cfg.dtype,
            )
        elif cfg.backbone == "tiramisu":
            tspec = TiramisuSpec(
                growth_rate=cfg.growth_rate,
                layers_per_block=cfg.layers_per_block,
                depth=cfg.depth,
                act=cfg.act,
                stem_stride=cfg.stem_stride,
                up_compress=cfg.up_compress,
                layers_top=cfg.layers_top,
            )
            backbone = Tiramisu(
                tspec, out_ch,
                head_zero_init=cfg.predict_residual and not cfg.kernel_prediction,
                dtype=cfg.dtype,
            )
        else:
            raise ValueError(f"unknown backbone {cfg.backbone!r}")

        net: nn.Module = backbone
        if cfg.n_scales > 1:
            net = multiscale.MultiScale(backbone, cfg.n_scales)

        if cfg.kernel_prediction:
            if cfg.out_channels == 24:
                # Joint-mode KPN (r4 efficient preset): ONE backbone forward
                # emits kernels for all 8 slots (4 groups x direct/indirect)
                # instead of group mode's 4 full-res forwards per frame. The
                # encoded signal channels live at 9g+0..5 per group
                # (encode_joint_inputs layout); _slice_signal returns them in
                # slot order g0_d, g0_i, g1_d, ... — exactly the head's
                # per-slot convention and decode_joint_outputs' output order.
                assert 3 * cfg.kpn_slots == cfg.out_channels, (
                    f"joint KPN needs kpn_slots={cfg.out_channels // 3}, "
                    f"got {cfg.kpn_slots}"
                )
                signal = _slice_signal(cfg, x)
            else:
                signal = x[..., : 3 * cfg.kpn_slots]
            head = kpn.KernelPredictionHead(
                net, kernel_size=cfg.kpn_size, n_slots=cfg.kpn_slots,
                use_pallas=cfg.kpn_pallas, logit_norm=cfg.kpn_logit_norm,
                dtype=cfg.dtype,
            )
            # KPN filters the *linear-domain* signal; callers pass encoded
            # (log-demod) channels, filter there — convex combos in log space
            # are still stable; decode happens downstream as usual.
            return head(x, signal)
        if return_scales:
            from deepdenoiser_tpu.models import layers as layers_lib

            outs = net(x, return_scales=True)  # finest -> coarsest
            if cfg.predict_residual:
                signal = _slice_signal(cfg, x)
                fixed = []
                for s, o in enumerate(outs):
                    # anchor EVERY scale to its downsampled noisy signal so
                    # per-scale supervision trains corrections, as the
                    # finest-scale residual path does
                    fixed.append(o + signal.astype(o.dtype))
                    if s < len(outs) - 1:
                        signal = layers_lib.avg_downsample(signal, 2)
                outs = fixed
            return outs

        out = net(x)
        if cfg.predict_residual:
            out = out + _slice_signal(cfg, x).astype(out.dtype)
        return out


def _slice_signal(cfg: ModelConfig, x: Array) -> Array:
    """Noisy encoded signal channels of x matching the output channels,
    as contiguous slices (not a gather): XLA fuses these into the
    consumer add with zero extra HBM traffic."""
    idx = signal_indices(cfg)
    runs = []
    start = 0
    for i in range(1, len(idx) + 1):
        if i == len(idx) or idx[i] != idx[i - 1] + 1:
            runs.append(
                jax.lax.slice_in_dim(x, idx[start], idx[i - 1] + 1, axis=-1)
            )
            start = i
    return runs[0] if len(runs) == 1 else jnp.concatenate(runs, axis=-1)


def signal_indices(cfg: ModelConfig) -> Tuple[int, ...]:
    """Input-channel indices of the noisy encoded signal matching the
    output channels (the encode conventions of transforms.py)."""
    if cfg.out_channels == 24:  # joint: [demod_d(3), demod_i(3), albedo(3)]*4 + aux
        return tuple(9 * g + j for g in range(4) for j in range(6))
    if cfg.out_channels == 6:  # group: [demod_d(3), demod_i(3), albedo, aux]
        return tuple(range(6))
    if cfg.out_channels == 3:  # rgb: [log combined(3), albedo, aux]
        return tuple(range(3))
    raise ValueError(
        f"predict_residual needs a known channel convention; out_channels="
        f"{cfg.out_channels} is not one of 3/6/24"
    )


def _backbone_spec(cfg: ModelConfig):
    if cfg.backbone == "unet":
        return UNetSpec(
            base_width=cfg.base_width, depth=cfg.depth,
            convs_per_level=cfg.convs_per_level, act=cfg.act,
            stem_stride=cfg.stem_stride, remat=cfg.remat,
        )
    if cfg.backbone == "tiramisu":
        return TiramisuSpec(
            growth_rate=cfg.growth_rate, layers_per_block=cfg.layers_per_block,
            depth=cfg.depth, act=cfg.act, stem_stride=cfg.stem_stride,
            up_compress=cfg.up_compress, layers_top=cfg.layers_top,
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
