"""Typed dataclass configs with JSON round-trip (upstream: argparse flags +
JSON architecture/training configs loaded by DeepDenoiser.py — SURVEY.md
C18, L8). One config tree drives all three subcommands
(train / prepare-data / denoise), keeping the reference's declarative
spirit: a JSON file fully determines an experiment.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Tuple, Type, TypeVar, get_args, get_origin, get_type_hints

from deepdenoiser_tpu.models.factory import ModelConfig
from deepdenoiser_tpu.ops.losses import LossConfig
from deepdenoiser_tpu.passes import LIGHT_GROUPS

T = TypeVar("T")


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """prepare-data + input pipeline settings (SURVEY.md C6, C9, N2)."""

    shard_dir: str = "data/shards"
    crop: int = 64
    crops_per_frame: int = 64
    batch_size: int = 32
    groups: Tuple[str, ...] = LIGHT_GROUPS
    mode: str = "group"  # 'group' (per-group) | 'joint' (all groups, one pass) | 'rgb'
    group: str = "diffuse"  # which group a 'group'-mode model trains on
    # Feature-flag conditioning (upstream: FeatureFlags.py — SURVEY.md C3):
    # scenes may lack some light groups. With use_flags, prepare-data
    # zero-fills the missing passes and stores a per-example presence
    # vector; the encoder appends one constant flag plane per group to the
    # network input and masks the missing groups' channels out of the loss,
    # so one joint-mode network trains across heterogeneous pass sets.
    use_flags: bool = False
    # Statistics-driven normalization (upstream: DataStatistics.py feeding
    # FeatureEngineering — SURVEY.md C7→C4). stats_normalize derives
    # pass_scales from the shard meta's corpus statistics at training time
    # (depth → 1/mean_depth, making depth normalization scene-scale
    # invariant); the concrete scales are frozen into the saved config /
    # checkpoint so inference encodes identically to training.
    stats_normalize: bool = False
    pass_scales: Tuple[Tuple[str, float], ...] = ()
    augment: bool = True
    shuffle_buffer: int = 2048
    validation_fraction: float = 0.1
    seed: int = 0
    # Grain read-path tuning (VERDICT r4 missing #3). Grain's defaults
    # (16 threads, 500-batch prefetch) assume a many-core TPU-VM host; on
    # a small host they are actively harmful — measured r5 on a 1-core
    # box: 16 threads GIL-thrash the decode and the 500-deep buffer holds
    # several GB of batches. 0 = auto: min(4, cpu_count) threads, 8-batch
    # prefetch (~200 MB at batch 16 crop 128) — enough to overlap host
    # decode with the device step without hoarding memory.
    read_threads: int = 0
    prefetch_batches: int = 0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimizer / schedule / checkpointing (SURVEY.md C16, §5)."""

    steps: int = 10_000
    learning_rate: float = 2e-4
    warmup_steps: int = 500
    schedule: str = "cosine"  # 'cosine' | 'constant'
    weight_decay: float = 0.0
    beta1: float = 0.9
    beta2: float = 0.999
    grad_clip_norm: float = 1.0
    ema_decay: float = 0.0  # >0 keeps a param EMA for eval
    checkpoint_dir: str = "checkpoints"
    checkpoint_every: int = 1000
    keep_checkpoints: int = 3
    log_every: int = 100
    eval_every: int = 1000
    data_parallel: bool = True  # shard batch over the mesh 'data' axis
    # >0 with a multi-scale model: supervise the COMPOSED output at every
    # pyramid scale against the avg-downsampled target (weight per coarse
    # scale, averaged) — upstream-style per-scale supervision (SURVEY.md
    # C13; the r2-trained multiscale without it was worse than its input)
    scale_supervision_weight: float = 0.0
    # >0: knowledge distillation — the train step blends the ground-truth
    # loss with a loss against a frozen teacher's prediction carried in the
    # batch as 'y_teacher' (loss = (1-w)*gt + w*teacher). The teacher
    # forward runs outside the step (tools/pretrain_flagship.py --teacher).
    distill_weight: float = 0.0
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """Tiled full-frame inference (SURVEY.md N4, BASELINE configs 2/3/5)."""

    tile: int = 0  # core tile size; 0 = whole-frame (fastest when HBM fits)
    tile_batch: int = 0  # 0 = all tiles in one device batch
    halo: int = 0  # 0 = derive from the model's certified RF bound
    # Tile stitching: 'exact' center-crop reassembly (bit-exact with the
    # whole frame when halo >= the certified RF bound) or 'feather' cosine
    # overlap blending (BASELINE config #2 "overlap blending"; pair with a
    # small halo override for faster, approximately-seamless tiles).
    stitch: str = "exact"
    # Whole-frame-mode border pad override (ignored when tiling or spatial
    # sharding, where the certified halo is a correctness requirement).
    # The certified bound (~131 px for the flagship) is worst-case; the
    # network's EFFECTIVE receptive field is far smaller, and a 32 px
    # reflect border measures bit-identical PSNR/SSIM at 4K while cutting
    # padded-plane work 13-25%. -1 = use the certified halo (canonical).
    border: int = -1
    compute_dtype: str = "bfloat16"
    spatial_shard: bool = False  # shard frame rows over a 'spatial' mesh axis
    use_pallas_ingest: bool = False  # Pallas fused normalization (ops/fused_ingest)
    # Pallas VMEM filter apply for kernel-prediction models (ops/kpn_pallas):
    # measured 4.8x faster than the XLA shift-accumulate on v5e (0.63 vs
    # 3.02 ms per 5x5 apply @1080p), bit-exact. Inference-only — the XLA
    # path stays the training default because pallas_call has no VJP.
    kpn_pallas: bool = True


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str = "default"
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    infer: InferenceConfig = dataclasses.field(default_factory=InferenceConfig)


# ---------------------------------------------------------------------------
# Generic dataclass <-> JSON
# ---------------------------------------------------------------------------


def to_dict(cfg: Any) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def _from_dict(cls: Type[T], d: Any) -> T:
    if not dataclasses.is_dataclass(cls):
        origin = get_origin(cls)
        if origin in (tuple, Tuple) or cls is tuple:
            args = get_args(cls)
            if args and args[-1] is Ellipsis:
                return tuple(_from_dict(args[0], v) for v in d)  # type: ignore
            return tuple(d)  # type: ignore
        return d  # primitives pass through
    hints = get_type_hints(cls)
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    for key, val in d.items():
        if key not in fields:
            raise KeyError(f"{cls.__name__}: unknown config key {key!r}")
        kwargs[key] = _from_dict(hints[key], val)
    return cls(**kwargs)  # type: ignore


def from_dict(cls: Type[T], d: Dict[str, Any]) -> T:
    return _from_dict(cls, d)


def save(cfg: Any, path: str | Path) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text(json.dumps(to_dict(cfg), indent=2) + "\n")


def load(path: str | Path, cls: Type[T] = ExperimentConfig) -> T:
    return from_dict(cls, json.loads(Path(path).read_text()))


# Preset experiment configs mirroring the reference's shipped JSON presets.
PRESETS: Dict[str, ExperimentConfig] = {
    # The TPU-sweep-selected production model: joint 4-group single pass,
    # space-to-depth stem, bf16 — 53.8 ms / 1080p multi-pass frame on v5e
    # (tools/sweep_joint.py; see __graft_entry__.FLAGSHIP).
    "flagship": ExperimentConfig(
        name="flagship",
        model=ModelConfig(
            backbone="unet", base_width=96, depth=3, convs_per_level=2,
            stem_stride=2, compute_dtype="bfloat16", predict_residual=True,
            act="leaky_relu",
        ),
        data=DataConfig(mode="joint"),
        train=TrainConfig(ema_decay=0.999),
        infer=InferenceConfig(border=32),  # quality-identical, ~25% faster
    ),
    # Flagship trained across heterogeneous pass sets: per-example group
    # flags as input planes + loss masks (SURVEY.md C3). Use for corpora
    # where some scenes lack light groups (e.g. no subsurface).
    "flagship-flags": ExperimentConfig(
        name="flagship-flags",
        model=ModelConfig(
            backbone="unet", base_width=96, depth=3, convs_per_level=2,
            stem_stride=2, compute_dtype="bfloat16", predict_residual=True,
            act="leaky_relu",
        ),
        data=DataConfig(mode="joint", use_flags=True),
        train=TrainConfig(ema_decay=0.999),
        infer=InferenceConfig(border=32),
    ),
    # r2 quality ladder (see docs/STATUS_R2.md): full-resolution processing
    # beats s2d stems by 4-8 dB on this task.
    # flagship-hq: stride-1 UNet — 58.5 ms / 1080p frame after the r3
    # concat-free/sub-pixel conv lowering; +13.5 dB train / +8.75 dB on the
    # untouched spheres holdout (300k mixed + distilled from tiramisu-fast,
    # STATUS_R3) — the production quality point under the <100 ms north star.
    "flagship-hq": ExperimentConfig(
        name="flagship-hq",
        model=ModelConfig(
            backbone="unet", base_width=64, depth=3, convs_per_level=2,
            stem_stride=1, compute_dtype="bfloat16", predict_residual=True,
            act="leaky_relu",
        ),
        data=DataConfig(mode="joint"),
        train=TrainConfig(ema_decay=0.999),
        infer=InferenceConfig(border=32),
    ),
    # flagship-mc (r5): the same architecture fine-tuned 50k steps on the
    # mixed-mc corpus (thirds Fourier/Voronoi/traced Monte-Carlo,
    # data/mc_tracer.py) from the flagship-hq release weights. On genuine
    # MC noise — fireflies, penumbra variance — it gains +12.68 dB where
    # the Gaussian-trained incumbent manages +2.77; it also wins the
    # train, voronoi and boxes columns, giving up 0.42 dB spheres PSNR
    # (STATUS_R5 arbitration). Same 59.5 ms/1080p latency (identical
    # arch). RECOMMENDED for real renderer output; flagship-hq remains
    # the Gaussian-ladder reference point.
    "flagship-mc": ExperimentConfig(
        name="flagship-mc",
        model=ModelConfig(
            backbone="unet", base_width=64, depth=3, convs_per_level=2,
            stem_stride=1, compute_dtype="bfloat16", predict_residual=True,
            act="leaky_relu",
        ),
        data=DataConfig(mode="joint"),
        train=TrainConfig(ema_decay=0.999),
        infer=InferenceConfig(border=32),
    ),
    # flagship-max: KPCN kernel prediction — the best holdout generalizer
    # (r3 mixed corpus: +13.2 dB train / +9.1 dB on the untouched spheres
    # holdout, SSIM .96; group mode, applied per light group).
    # kpn_logit_norm matches the shipped r3 weights (models/kpn.py).
    "flagship-max": ExperimentConfig(
        name="flagship-max",
        model=ModelConfig(
            backbone="unet", base_width=48, depth=3, convs_per_level=2,
            kernel_prediction=True, kpn_size=5, kpn_slots=2,
            kpn_logit_norm=True,
            compute_dtype="bfloat16", act="leaky_relu",
        ),
        data=DataConfig(mode="group"),
        train=TrainConfig(ema_decay=0.999),
        infer=InferenceConfig(border=32),
    ),
    "unet-small": ExperimentConfig(
        name="unet-small",
        model=ModelConfig(backbone="unet", base_width=32, depth=3, n_scales=1),
    ),
    # Multi-scale wrapper (SURVEY.md C13). The r2-trained variant WITHOUT
    # per-scale supervision scored below the noisy input on holdout;
    # scale_supervision_weight>0 is the fix and part of this preset —
    # training without it is known-bad (STATUS_R3 ladder has the numbers).
    # r5: CONFIG-ONLY (weights retired per VERDICT r4 #3b). The shipped
    # weights were strictly dominated on every eval column (incl. the new
    # traced-MC family: +0.36 dB vs flagship-hq's +2.74) and the diagnosed
    # fix — train coarse-supervised scales at crop ≥ RF 499/2^s, i.e.
    # crop 192+ (STATUS_R4 root cause; tools/diag_multiscale.py) — was
    # blocked by the r5 chip outage. To revive: pretrain_flagship.py
    # --model multiscale-c192 --crop 192 --family mixed-mc.
    "unet-multiscale": ExperimentConfig(
        name="unet-multiscale",
        model=ModelConfig(backbone="unet", base_width=48, depth=3, n_scales=3,
                          compute_dtype="bfloat16", predict_residual=True,
                          act="leaky_relu"),
        data=DataConfig(mode="joint"),
        train=TrainConfig(ema_decay=0.999, scale_supervision_weight=0.5),
    ),
    # FC-DenseNet, full dense concats: 192.6 ms at 1080p (HBM-traffic-bound,
    # STATUS_R2 diagnosis). Strictly dominated by tiramisu-fast below (better
    # quality, latency, and params); kept as the unbottlenecked C12 reference
    # point. Shipped weights are the r2 fourier-only training run.
    "tiramisu": ExperimentConfig(
        name="tiramisu",
        model=ModelConfig(
            backbone="tiramisu", growth_rate=16, layers_per_block=4, depth=3,
            compute_dtype="bfloat16", predict_residual=True, act="leaky_relu",
        ),
        data=DataConfig(mode="joint"),
        train=TrainConfig(ema_decay=0.999),
        infer=InferenceConfig(border=32),
    ),
    # r3: FC-DenseNet with 1x1-bottlenecked up-path concats (the fix for
    # the r2 HBM-traffic diagnosis). The round-3 quality champion at 0.64M
    # params: +14.6/+13.2 dB on the training families, +8.2 dB / SSIM .96
    # on the untouched spheres holdout (STATUS_R3 ladder).
    "tiramisu-fast": ExperimentConfig(
        name="tiramisu-fast",
        model=ModelConfig(
            backbone="tiramisu", growth_rate=16, layers_per_block=4, depth=3,
            up_compress=64,
            compute_dtype="bfloat16", predict_residual=True, act="leaky_relu",
        ),
        data=DataConfig(mode="joint"),
        train=TrainConfig(ema_decay=0.999),
        infer=InferenceConfig(border=32),
    ),
    # r3: tiramisu-fast with the two FULL-RESOLUTION dense blocks thinned to
    # one layer each (layers_top=1; coarse scales keep full density) — the
    # <100 ms dense net. The full-res bytes dominate the HBM-bound frame, so
    # thinning only there cut 153.6 -> 89.9 ms at 1080p. Trained 100k mixed:
    # +14.85 dB train / +9.10 dB untouched spheres holdout at 0.52M params —
    # beats flagship-hq on quality on every family under the 100 ms north
    # star (STATUS_R3 ladder); flagship-hq keeps the throughput crown.
    "tiramisu-lt1": ExperimentConfig(
        name="tiramisu-lt1",
        model=ModelConfig(
            backbone="tiramisu", growth_rate=16, layers_per_block=4, depth=3,
            up_compress=64, layers_top=1,
            compute_dtype="bfloat16", predict_residual=True, act="leaky_relu",
        ),
        data=DataConfig(mode="joint"),
        train=TrainConfig(ema_decay=0.999),
        infer=InferenceConfig(border=32),
    ),
    "kpn": ExperimentConfig(
        name="kpn",
        model=ModelConfig(
            backbone="unet", base_width=48, depth=3, kernel_prediction=True,
            kpn_size=5, kpn_slots=2, kpn_logit_norm=True,
            compute_dtype="bfloat16", act="leaky_relu",
        ),
        data=DataConfig(mode="group"),
        train=TrainConfig(ema_decay=0.999),
    ),
    # r4 efficient KPN (VERDICT r3 weak #3): joint mode predicts ALL 8
    # slots' kernels (4 groups x direct/indirect) in ONE forward on the
    # flagship-hq backbone instead of group mode's 4 full-res forwards —
    # 130.2 ms vs 282 ms at 1080p (chained, v5e; STATUS_R4). Recipe: 40k mixed at
    # half LR (2.5e-4), kpn_logit_norm (the r3 stability fix).
    "kpn-hq": ExperimentConfig(
        name="kpn-hq",
        model=ModelConfig(
            backbone="unet", base_width=64, depth=3, convs_per_level=2,
            stem_stride=1, kernel_prediction=True,
            kpn_size=5, kpn_slots=8, kpn_logit_norm=True,
            compute_dtype="bfloat16", act="leaky_relu",
        ),
        data=DataConfig(mode="joint"),
        train=TrainConfig(ema_decay=0.999),
        infer=InferenceConfig(border=32),
    ),
}
