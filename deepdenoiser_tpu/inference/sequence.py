"""Animation-sequence batch denoising with per-frame latency and PSNR/SSIM
tracking (BASELINE config #5: "4K batch denoise of an animation sequence").

One compiled program per frame geometry is reused across all frames (static
shapes); per-frame quality metrics are computed ON DEVICE inside the same
program and fetched as scalars — full frames never cross the host link in
the hot loop (device->host is the slow path on tunneled TPUs).
"""

from __future__ import annotations

import re
import time
from pathlib import Path
from typing import Dict, List, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from deepdenoiser_tpu import passes
from deepdenoiser_tpu.config import InferenceConfig
from deepdenoiser_tpu.data import exr
from deepdenoiser_tpu.inference import pipeline
from deepdenoiser_tpu.models.factory import ModelConfig
from deepdenoiser_tpu.ops import metrics

Array = jax.Array


def make_sequence_denoiser(
    model_cfg: ModelConfig,
    infer_cfg: InferenceConfig,
    height: int,
    width: int,
    mode: str = "group",
    scales=None,
):
    """Returns jitted fn(params, noisy_passes, gt_combined|None) ->
    (denoised_combined, psnr, ssim). gt metrics are NaN when gt is absent."""
    if mode == "group":
        denoise, grid = pipeline.make_group_frame_denoiser(
            model_cfg, infer_cfg, height, width, scales=scales
        )
    elif mode == "joint":
        denoise, grid = pipeline.make_joint_frame_denoiser(
            model_cfg, infer_cfg, height, width, scales=scales
        )
    else:
        denoise, grid = pipeline.make_rgb_frame_denoiser(
            model_cfg, infer_cfg, height, width, scales=scales
        )

    @jax.jit
    def run(params, noisy: Mapping[str, Array], gt_combined: Array):
        out = denoise(params, noisy)
        pred = metrics.tonemap_for_metrics(out["combined"])[None]
        ref = metrics.tonemap_for_metrics(gt_combined)[None]
        return (
            out["combined"],
            metrics.psnr_per_image(pred, ref)[0],
            metrics.ssim(pred, ref)[0],
        )

    return run, grid


def make_batch_frame_denoiser(
    model_cfg: ModelConfig,
    infer_cfg: InferenceConfig,
    mesh,
    height: int,
    width: int,
    mode: str = "joint",
    scales=None,
):
    """Data-parallel animation-BATCH denoising (BASELINE config #5 at
    multi-chip scale): a batch of frames, sharded over the mesh 'data'
    axis, each chip running the full whole-frame pipeline on its shard —
    zero cross-chip communication, N-chip frame throughput.

    Returns jitted fn(params, batch_pass_dict) -> (N, H, W, 3) combined,
    where every pass in batch_pass_dict has a leading batch axis divisible
    by the mesh size. Complements spatial_shard (which splits ONE frame
    across chips for latency; this splits MANY frames for throughput).
    """
    from jax.sharding import PartitionSpec as P

    if mode == "joint":
        den, grid = pipeline.make_joint_frame_denoiser(
            model_cfg, infer_cfg, height, width, scales=scales
        )
    elif mode == "group":
        den, grid = pipeline.make_group_frame_denoiser(
            model_cfg, infer_cfg, height, width, scales=scales
        )
    else:
        den, grid = pipeline.make_rgb_frame_denoiser(
            model_cfg, infer_cfg, height, width, scales=scales
        )

    def local(params, batch: Mapping[str, Array]) -> Array:
        return jax.vmap(lambda f: den(params, f)["combined"])(dict(batch))

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    return jax.jit(sharded), grid


def run_sequence(
    model_cfg: ModelConfig,
    infer_cfg: InferenceConfig,
    params,
    frames: Sequence[Mapping[str, np.ndarray]],
    gts: Optional[Sequence[np.ndarray]] = None,
    mode: str = "group",
    scales=None,
) -> Dict[str, object]:
    """Denoise a frame sequence; returns per-frame latency/PSNR/SSIM.

    Latency per frame is measured by scalar-forcing each frame's metrics
    (the PSNR fetch serializes the device stream for that frame).
    """
    h, w = next(iter(frames[0].values())).shape[:2]
    run, grid = make_sequence_denoiser(model_cfg, infer_cfg, h, w, mode, scales)

    lat_ms: List[float] = []
    psnrs: List[float] = []
    ssims: List[float] = []
    for i, f in enumerate(frames):
        gt = gts[i] if gts is not None else f["combined"]
        dev_f = {k: jnp.asarray(v) for k, v in f.items()}
        dev_gt = jnp.asarray(gt)
        if i == 0:  # compile outside the timed region
            out = run(params, dev_f, dev_gt)
            _ = float(out[1])
        t0 = time.perf_counter()
        _, p, s = run(params, dev_f, dev_gt)
        p = float(p)  # scalar fetch forces completion
        s = float(s)
        lat_ms.append(1e3 * (time.perf_counter() - t0))
        psnrs.append(p)
        ssims.append(s)

    return {
        "n_frames": len(frames),
        "height": h,
        "width": w,
        "grid": {"tile_h": grid.tile_h, "tile_w": grid.tile_w,
                 "halo": grid.halo, "n_tiles": grid.n_tiles},
        "latency_ms": lat_ms,
        "latency_ms_median": float(np.median(lat_ms)),
        "psnr": psnrs,
        "psnr_mean": float(np.mean(psnrs)),
        "ssim": ssims,
        "ssim_mean": float(np.mean(ssims)),
    }


def evaluate_render_root(
    model_cfg: ModelConfig,
    infer_cfg: InferenceConfig,
    params,
    render_root: str | Path,
    mode: str = "group",
    max_frames: int = 0,
    scales=None,
) -> Dict[str, object]:
    """Load frames (noisiest variant vs ground truth) from a render root and
    run the sequence harness over them."""
    from deepdenoiser_tpu.data.prepare import GT_DIR, _frame_dirs

    root = Path(render_root)
    frame_dirs = _frame_dirs(root)
    if max_frames:
        frame_dirs = frame_dirs[:max_frames]
    if not frame_dirs:
        raise FileNotFoundError(f"no frames under {root}")

    noisy_frames, gts = [], []
    for fd in frame_dirs:
        variants = sorted(
            (p for p in fd.iterdir() if p.is_dir() and p.name != GT_DIR),
            key=_variant_spp_key,
        )
        noisy_frames.append(exr.load_frame_dir(variants[0], strict=False))
        gts.append(exr.load_frame_dir(fd / GT_DIR, wanted=["combined"])["combined"])
    return run_sequence(model_cfg, infer_cfg, params, noisy_frames, gts, mode, scales)


def _variant_spp_key(p: Path):
    """Sort noisy variant dirs by NUMERIC sample count so the lowest-spp
    (noisiest) variant comes first — lexicographic order would rank
    'spp16_seed0' before 'spp4_seed0' and score the cleanest variant."""
    m = re.search(r"spp(\d+)", p.name)
    return (int(m.group(1)) if m else 10**9, p.name)
