"""Grain input pipeline (upstream: tf.data input_fn in DeepDenoiser.py —
SURVEY.md C9; rebuild N2): shard reader -> deterministic global shuffle ->
D4 augmentation -> batch, with per-host sharding and checkpointable
iterator state.

The loader emits RAW pass crops; normalization/demodulation/encoding runs
on-device inside the jitted train step (make_batch_encoder) so it fuses
with the first conv — host CPU stays out of the hot path (and the Pallas
fused-ingest kernel, ops/fused_ingest.py, can replace it transparently).
"""

from __future__ import annotations

from typing import Dict, Iterator, Mapping, Sequence

import grain
import jax
import jax.numpy as jnp
import numpy as np

from deepdenoiser_tpu import passes, transforms
from deepdenoiser_tpu.config import DataConfig
from deepdenoiser_tpu.data import augment, shards

Array = jax.Array


class _AugmentD4(grain.transforms.RandomMap):
    def random_map(self, example, rng: np.random.Generator):
        return augment.augment_example(example, rng)


def make_dataset(
    shard_dir: str,
    cfg: DataConfig,
    training: bool = True,
    host_count: int = 1,
    host_index: int = 0,
    drop_remainder: bool = True,
):
    """grain.MapDataset pipeline over a shard dir.

    Deterministic: (cfg.seed, epoch) fully determine order and
    augmentations. Per-host sharding slices the global index space so DP
    hosts see disjoint data (SURVEY.md §2b).
    """
    reader = shards.ShardReader(shard_dir)
    ds = grain.MapDataset.source(reader)
    ds = ds[host_index::host_count]  # per-host shard of the index space
    ds = ds.seed(cfg.seed)
    if training:
        ds = ds.shuffle()
        if cfg.augment:
            ds = ds.random_map(_AugmentD4())
    ds = ds.batch(cfg.batch_size, drop_remainder=drop_remainder)
    return ds


def make_iterator(
    shard_dir: str,
    cfg: DataConfig,
    training: bool = True,
    host_count: int = 1,
    host_index: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite (training) or single-epoch (eval) batch iterator.

    The returned grain iterator supports get_state()/set_state() for
    checkpointable resume (SURVEY.md §5 failure recovery).
    """
    ds = make_dataset(shard_dir, cfg, training, host_count, host_index)
    if training:
        ds = ds.repeat()
    # Grain's ReadOptions default to a many-core host (16 threads, 500
    # buffered batches); see DataConfig.read_threads for why that is
    # pathological on small hosts. 0 = auto-size to the machine.
    import os as _os

    threads = cfg.read_threads or min(4, _os.cpu_count() or 1)
    prefetch = cfg.prefetch_batches or 8
    return iter(ds.to_iter_dataset(
        grain.ReadOptions(num_threads=threads,
                          prefetch_buffer_size=prefetch)))


# ---------------------------------------------------------------------------
# On-device batch encoding (raw pass crops -> network tensors)
# ---------------------------------------------------------------------------


def _src(batch: Mapping[str, Array], name: str) -> Array:
    # Shard rows arrive in their STORED dtype (f16 for bounded passes —
    # shards.dtype_for); upcast on-device where it fuses into the encode
    # chain for free instead of burning host CPU (ShardReader docstring).
    return jnp.asarray(batch[f"{shards.SOURCE_PREFIX}/{name}"]).astype(jnp.float32)


def _tgt(batch: Mapping[str, Array], name: str) -> Array:
    return jnp.asarray(batch[f"{shards.TARGET_PREFIX}/{name}"]).astype(jnp.float32)


def make_batch_encoder(cfg: DataConfig, aux: Sequence[str] = passes.AUX_PASSES):
    """Returns encode(batch_of_raw_crops) -> {'x','y'} (jit-safe, pure).

    group mode: x = encoded noisy group inputs (log-demod direct/indirect,
    albedo, aux); y = clean direct/indirect encoded with the SAME (noisy)
    albedo, so the demod/remod round-trip at inference reuses the albedo
    the network saw.
    rgb mode: x = encoded noisy combined + albedo + aux; y = log combined.
    """
    aux = tuple(aux)
    scales = dict(cfg.pass_scales) or None
    ex = transforms.radiance_exposure(scales)

    if cfg.mode == "group":
        group = cfg.group
        d_name, i_name, c_name = passes.group_passes(group)

        def encode(batch: Mapping[str, Array]) -> Dict[str, Array]:
            src = {name: _src(batch, name) for name in
                   list(passes.group_passes(group)) + list(aux)}
            x = transforms.encode_group_inputs(src, group, aux, scales=scales)
            albedo = src[c_name]
            y = jnp.concatenate(
                [
                    transforms.normalize(
                        d_name, transforms.demodulate(_tgt(batch, d_name), albedo), ex
                    ),
                    transforms.normalize(
                        i_name, transforms.demodulate(_tgt(batch, i_name), albedo), ex
                    ),
                ],
                axis=-1,
            )
            return {"x": x, "y": y}

        return encode

    if cfg.mode == "joint":
        groups = tuple(cfg.groups)

        def encode_joint(batch: Mapping[str, Array]) -> Dict[str, Array]:
            names = [n for g in groups for n in passes.group_passes(g)] + list(aux)
            src = {name: _src(batch, name) for name in names}
            x = transforms.encode_joint_inputs(src, groups, aux, scales=scales)
            ys = []
            for g in groups:
                d_name, i_name, c_name = passes.group_passes(g)
                albedo = src[c_name]
                ys.append(transforms.normalize(
                    d_name, transforms.demodulate(_tgt(batch, d_name), albedo), ex))
                ys.append(transforms.normalize(
                    i_name, transforms.demodulate(_tgt(batch, i_name), albedo), ex))
            out = {"x": x, "y": jnp.concatenate(ys, axis=-1)}
            if cfg.use_flags:
                # Feature-flag conditioning (SURVEY.md C3): one constant
                # plane per group tells the network which groups are real;
                # the loss mask zeroes the 6 output channels of each
                # missing group so zero-filled passes teach nothing.
                flags = batch[shards.FLAGS_KEY].astype(jnp.float32)  # (N, G)
                n, h, w = x.shape[0], x.shape[1], x.shape[2]
                planes = jnp.broadcast_to(
                    flags[:, None, None, :], (n, h, w, flags.shape[-1])
                )
                out["x"] = jnp.concatenate([x, planes], axis=-1)
                out["mask"] = jnp.repeat(flags, 6, axis=-1)[:, None, None, :]
            return out

        return encode_joint

    if cfg.mode == "rgb":

        def encode_rgb(batch: Mapping[str, Array]) -> Dict[str, Array]:
            src = {name: _src(batch, name) for name in
                   ["combined", "diffuse_color"] + list(aux)}
            x = transforms.encode_rgb_inputs(
                src, aux=tuple(a for a in aux if a != "alpha"), scales=scales
            )
            y = transforms.normalize("combined", _tgt(batch, "combined"), ex)
            return {"x": x, "y": y}

        return encode_rgb

    raise ValueError(f"unknown data mode {cfg.mode!r}")


def derive_pass_scales(meta: shards.ShardMeta) -> tuple:
    """Statistics-driven normalization scales from the corpus stats the
    dataset builder persisted in meta.json (SURVEY.md C7→C4): depth is
    pre-scaled by 1/mean so log1p(depth * scale) is scene-scale invariant,
    and HDR radiance gets a shared EXPOSURE pre-scale 1/mean(combined) so
    log1p(exposure * radiance) is absolute-brightness invariant (the
    transforms.RADIANCE_SCALE_KEY entry, inverted exactly on decode).
    Bounded passes (color/normal/alpha) need no scaling. Returns the
    DataConfig.pass_scales tuple, frozen into the saved config so
    inference encodes identically to training."""
    out = []
    depth_stats = meta.stats.get("depth")
    if depth_stats and depth_stats.get("mean", 0.0) > 0.0:
        out.append(("depth", 1.0 / float(depth_stats["mean"])))
    rad_stats = meta.stats.get("combined")
    if rad_stats and rad_stats.get("mean", 0.0) > 0.0:
        out.append(
            (transforms.RADIANCE_SCALE_KEY, 1.0 / float(rad_stats["mean"]))
        )
    return tuple(out)


def make_eval_decoder(cfg: DataConfig):
    """Returns decode(raw_batch, pred) -> (pred_rgb, ref_rgb, noisy_rgb) in
    the raw radiance domain (NHWC), mirroring the inference pipeline's
    decode + recompose (inference/pipeline.py) so training-eval tonemapped
    PSNR/SSIM are comparable with the inference-side numbers (upstream
    analogue: the estimator's eval metrics + image summaries — SURVEY.md §5).
    """
    scales = dict(cfg.pass_scales) or None

    if cfg.mode == "joint":
        groups = tuple(cfg.groups)

        def decode_joint(batch: Mapping[str, Array], pred: Array):
            src = {
                n: _src(batch, n) for g in groups for n in passes.group_passes(g)
            }
            out = dict(transforms.decode_joint_outputs(pred, src, groups, scales=scales))
            for g in groups:
                c_name = passes.group_passes(g)[2]
                out[c_name] = src[c_name]
            for extra in passes.COMPOSITE_EXTRA:
                key = f"{shards.SOURCE_PREFIX}/{extra}"
                if key in batch:
                    # noisy pass-through, as inference (upcast: stored f16)
                    out[extra] = jnp.asarray(batch[key]).astype(jnp.float32)
            pred_rgb = transforms.recompose(out, groups)
            return pred_rgb, _tgt(batch, "combined"), _src(batch, "combined")

        return decode_joint

    if cfg.mode == "group":
        d_name, i_name, c_name = passes.group_passes(cfg.group)

        def decode_group(batch: Mapping[str, Array], pred: Array):
            albedo = _src(batch, c_name)
            dec = transforms.decode_group_outputs(pred, albedo, scales=scales)
            pred_rgb = albedo * (dec["direct"] + dec["indirect"])
            ref_rgb = _tgt(batch, c_name) * (_tgt(batch, d_name) + _tgt(batch, i_name))
            noisy_rgb = albedo * (_src(batch, d_name) + _src(batch, i_name))
            return pred_rgb, ref_rgb, noisy_rgb

        return decode_group

    if cfg.mode == "rgb":

        def decode_rgb(batch: Mapping[str, Array], pred: Array):
            return (
                transforms.decode_rgb_outputs(pred, scales),
                _tgt(batch, "combined"),
                _src(batch, "combined"),
            )

        return decode_rgb

    raise ValueError(f"unknown data mode {cfg.mode!r}")


def input_channels(cfg: DataConfig, aux: Sequence[str] = passes.AUX_PASSES) -> int:
    if cfg.use_flags and cfg.mode != "joint":
        raise ValueError("use_flags requires mode='joint'")
    if cfg.mode == "group":
        return transforms.group_input_channels(tuple(aux))
    if cfg.mode == "joint":
        n = transforms.joint_input_channels(tuple(cfg.groups), tuple(aux))
        return n + (len(cfg.groups) if cfg.use_flags else 0)
    return transforms.rgb_input_channels(tuple(a for a in aux if a != "alpha"))


def output_channels(cfg: DataConfig) -> int:
    if cfg.mode == "group":
        return transforms.GROUP_OUTPUT_CHANNELS
    if cfg.mode == "joint":
        return transforms.joint_output_channels(tuple(cfg.groups))
    return 3
