"""Pretrain the flagship denoiser on-device with jit-generated synthetic
batches, and save an orbax checkpoint the bench/demo loads.

    python tools/pretrain_flagship.py [--steps 3000] [--out checkpoints/flagship]

Everything — batch synthesis, encoding, fwd/bwd, Adam — is one compiled
program per step; the host only ticks the RNG counter and reads the loss
every --log-every steps (one scalar fetch). Built for the tunneled TPU
where any host->device data feed would dominate (MEMORY tpu-env-facts).
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from __graft_entry__ import FLAGSHIP
from deepdenoiser_tpu.config import TrainConfig
from deepdenoiser_tpu.models.factory import ModelConfig
from deepdenoiser_tpu import transforms

# Small combined-RGB model for BASELINE config #1 (single-crop CPU denoise).
RGB_SMALL = ModelConfig(
    backbone="unet", in_channels=transforms.rgb_input_channels(),
    out_channels=3, base_width=32, depth=2, convs_per_level=1,
    act="leaky_relu", compute_dtype="bfloat16", predict_residual=True,
)
# Zoo challengers for the architecture ablation (SURVEY.md C12/C13/C14):
# trained shorter than the 150k-step flagship; compared on latency +
# train-family/holdout quality by tools/eval_zoo.py.
MULTISCALE = ModelConfig(  # C13: coarse->fine compose_scales wrapper
    backbone="unet", in_channels=transforms.joint_input_channels(),
    out_channels=transforms.joint_output_channels(), base_width=48, depth=3,
    convs_per_level=2, n_scales=3, act="leaky_relu",
    compute_dtype="bfloat16", predict_residual=True,
)
TIRAMISU = ModelConfig(  # C12: FC-DenseNet backbone
    backbone="tiramisu", in_channels=transforms.joint_input_channels(),
    out_channels=transforms.joint_output_channels(), growth_rate=16,
    layers_per_block=4, depth=3, act="leaky_relu",
    compute_dtype="bfloat16", predict_residual=True,
)
KPN = ModelConfig(  # C14: per-pixel 5x5 filter prediction, group mode
    backbone="unet", in_channels=transforms.group_input_channels(),
    out_channels=6, base_width=48, depth=3, convs_per_level=2,
    kernel_prediction=True, kpn_size=5, kpn_slots=2, act="leaky_relu",
    compute_dtype="bfloat16",
    # r3: two mixed-corpus runs collapsed via softmax saturation without
    # this (models/kpn.py docstring)
    kpn_logit_norm=True,
)
# r2 quality finding: TIRAMISU beat the UNet flagship by ~8 dB at 40k
# steps. TIRAMISU_S2D runs the same dense stack at half resolution
# (space-to-depth stem, the UNet latency lever) to buy the quality at
# production speed.
TIRAMISU_S2D = ModelConfig(
    backbone="tiramisu", in_channels=transforms.joint_input_channels(),
    out_channels=transforms.joint_output_channels(), growth_rate=20,
    layers_per_block=4, depth=3, act="leaky_relu", stem_stride=2,
    # bounded up-path concats like tiramisu-fast (its quality did not
    # suffer from the bottleneck — it LED the r3 ladder)
    up_compress=64,
    compute_dtype="bfloat16", predict_residual=True,
)
# Control for the tiramisu finding: is the ~8 dB win density, or just
# FULL-RESOLUTION processing (no s2d stem discarding detail)?
UNET_FULLRES = ModelConfig(
    backbone="unet", in_channels=transforms.joint_input_channels(),
    out_channels=transforms.joint_output_channels(), base_width=64, depth=3,
    convs_per_level=2, stem_stride=1, act="leaky_relu",
    compute_dtype="bfloat16", predict_residual=True,
)
# r3 latency push (VERDICT item 3): flagship-hq moves ~40 GB/frame at
# 1080p (HBM-bound, SOL 49.6 ms vs 83.1 measured). Bytes scale ~linearly
# with base_width at stride 1, so bw48 targets ~30 GB -> ~55-65 ms.
UNET_FULLRES_48 = dataclasses.replace(UNET_FULLRES, base_width=48)
# ...measured: bw48 is 84.1 ms vs bw64's 82.6 — latency is FLAT in width
# below the 128-lane tile (HBM bytes barely moved: 40.0 vs 40.6 GB).
# Probe the other direction: if bw96/bw128 stay near ~84 ms, the wider
# model's extra FLOPs are free quality (tools/roofline.py, random init).
UNET_FULLRES_96 = dataclasses.replace(UNET_FULLRES, base_width=96)
UNET_FULLRES_128 = dataclasses.replace(UNET_FULLRES, base_width=128)
# r3: tiramisu with bounded up-path concats (1x1 bottlenecks) — the fix
# for the r2 HBM-traffic diagnosis (30.8 GB/768^2 frame; VERDICT item 4).
TIRAMISU_FAST = dataclasses.replace(TIRAMISU, up_compress=64)
# r3 latency sweep toward a <100 ms dense net: tiramisu-fast is HBM-bound
# at 74% utilization with a 139 ms memory speed-of-light (114 GB/frame at
# 1080p) — below 100 ms requires FEWER FULL-RES BYTES, not faster math.
# layers_top thins only the two full-resolution dense blocks (entry +
# final up), where the bytes live; coarse scales keep full density.
TIRAMISU_LT2 = dataclasses.replace(TIRAMISU_FAST, layers_top=2)
TIRAMISU_LT1 = dataclasses.replace(TIRAMISU_FAST, layers_top=1)
TIRAMISU_LT2_UC48 = dataclasses.replace(TIRAMISU_FAST, layers_top=2,
                                        up_compress=48)
# r4 efficient KPN (VERDICT weak #3): the group-mode KPN runs 4 full-res
# backbone forwards per frame (282 ms at 1080p). Joint mode predicts ALL
# 8 slots' kernels (4 groups x direct/indirect) in ONE forward on the
# flagship-hq backbone (concat-free bw64 stride-1 UNet): ~flagship-hq
# latency + 8 Pallas applies.
KPN_JOINT = ModelConfig(
    backbone="unet", in_channels=transforms.joint_input_channels(),
    out_channels=transforms.joint_output_channels(), base_width=64, depth=3,
    convs_per_level=2, stem_stride=1, kernel_prediction=True, kpn_size=5,
    kpn_slots=8, kpn_logit_norm=True, act="leaky_relu",
    compute_dtype="bfloat16",
)
# Half-res kernel prediction: s2d stem halves every conv's spatial extent;
# the sub-pixel decoder still emits the weight field at full resolution.
KPN_JOINT_S2D = dataclasses.replace(KPN_JOINT, stem_stride=2)
MODELS = {
    "flagship": FLAGSHIP, "rgb-small": RGB_SMALL,
    "multiscale": MULTISCALE, "tiramisu": TIRAMISU, "kpn": KPN,
    "tiramisu-s2d": TIRAMISU_S2D, "unet-fullres": UNET_FULLRES,
    "tiramisu-fast": TIRAMISU_FAST,
    "flagship-hq-48": UNET_FULLRES_48,
    "flagship-hq-96": UNET_FULLRES_96,
    "flagship-hq-128": UNET_FULLRES_128,
    # the shipped 150k-step production-quality model (config PRESETS
    # 'flagship-hq'): same arch as unet-fullres
    "flagship-hq": UNET_FULLRES,
    # distillation experiment (same arch; fine-tuned from flagship-hq with
    # --teacher tiramisu-fast --distill-weight 0.5)
    "hq-distill": UNET_FULLRES,
    # half-LR KPN retrain (lr 2.5e-4): the cosine peak at 5e-4 slowly
    # degraded the softmax head late in training (STATUS_R3); this alias
    # lets eval_zoo score the rerun before it ships over 'kpn'
    "kpn-lr2": KPN,
    # <100 ms dense-net latency sweep (layers_top; see above)
    "tiramisu-lt2": TIRAMISU_LT2,
    "tiramisu-lt1": TIRAMISU_LT1,
    "tiramisu-lt2-uc48": TIRAMISU_LT2_UC48,
    # r4 efficient KPN (one joint forward instead of 4 group forwards)
    "kpn-joint": KPN_JOINT,
    "kpn-joint-best": KPN_JOINT,  # eval alias for the best-val checkpoint dir
    "kpn-hq": KPN_JOINT,  # the shipped preset name (config.PRESETS['kpn-hq'])
    "kpn-joint-s2d": KPN_JOINT_S2D,
    # r4 receptive-field probe (STATUS_R4): flagship-hq's RF is 124 px but
    # the r1-r3 recipe trains on 96 px crops — the net never sees its own
    # full context. Same arch, from-scratch distillation (teacher
    # tiramisu-fast, w=0.7), crop 96 vs 128; arbitrated by eval_zoo at a
    # common resolution (val PSNR is crop-dependent, not comparable).
    "hq-c96": UNET_FULLRES,
    "hq-c128": UNET_FULLRES,
    # winner of the crop probe, trained long (the r4 flagship-hq successor
    # candidate; ships over flagship-hq only if it wins BOTH holdouts)
    # ...measured: LOST both holdouts (+7.67/+9.99 vs +8.75/+12.68) —
    # 120k from-scratch does not buy back the incumbent's 370k steps
    # (STATUS_R4 "does NOT ship"). The cheap direction instead:
    "hq-distill-r4": UNET_FULLRES,
    # fine-tune the INCUMBENT at crop 128 (--init-from the release npz,
    # teacher tiramisu-fast, low LR) — starts from +8.75/+12.68, adds the
    # proven crop-128 context instead of re-earning it from zero
    "hq-ft-c128": UNET_FULLRES,
    # multiscale crop fix (STATUS_R4 root cause: coarse bands trained on
    # 96 px crops own the 1080p low frequencies they never saw; crop 192
    # gives the coarsest scale 48 px of context instead of 24)
    "multiscale-c192": MULTISCALE,
    # the crop>=RF lever applied to the quality crown: tiramisu-fast has
    # RF 207 but was trained at crop 96 only — fine-tune the incumbent at
    # crop 208 (--init-from the release npz, low LR, no teacher: nothing
    # in the zoo outranks it)
    "tiramisu-ft-c208": TIRAMISU_FAST,
    # second crop-128 fine-tune leg: hq-ft-c128's val was still monotone
    # at its final step, so restart the cosine (SGDR-style) from the
    # shipped 60k EMA at a lower peak
    "hq-ft2-c128": UNET_FULLRES,
    # r5: mixed-mc fine-tune of the incumbent (VERDICT r4 #2 conditional —
    # the Gaussian-trained zoo collapses to +2..+4 dB on traced MC noise;
    # STATUS_R5 table). Subsumes the voided hq-ft2-c128 re-run: same init
    # (release flagship-hq npz), same crop 128, cosine restart, but the
    # corpus gains the traced-MC third. NO teacher: every candidate
    # teacher is Gaussian-trained and would distill the firefly
    # amplification we are training away.
    "hq-ft-mc": UNET_FULLRES,
    "hq-ft-mc-best": UNET_FULLRES,
    # ...shipped 2026-08-20 as 'flagship-mc' (weights/flagship_mc_ema_f16.npz,
    # 50k mixed-mc steps from the flagship-hq release): traced-MC gain
    # +2.77 → +12.68 dB, better on train/voronoi/boxes, spheres PSNR
    # −0.42 (SSIM up) — misses the strict no-holdout-loss gate by a hair,
    # so the Gaussian incumbent keeps the flagship-hq name and this ships
    # alongside it as the real-noise production preset (STATUS_R5).
    "flagship-mc": UNET_FULLRES,
    # eval aliases for best-val checkpoint dirs (eval_zoo loads
    # checkpoints/<name> latest; these point it at the -best selection)
    "hq-ft2-c128-best": UNET_FULLRES,
    "kpn-hq-c128-best": KPN_JOINT,
    "multiscale-c192-best": MULTISCALE,
    "flagship-ft-c256-best": FLAGSHIP,
    "tiramisu-ft2-c208-best": TIRAMISU_FAST,
    "tiramisu-ft-c208-best": TIRAMISU_FAST,
    # crop>=RF lever on the efficient KPN (backbone RF 124 + 5x5 apply;
    # kpn-joint trained at crop 96 only)
    "kpn-hq-c128": KPN_JOINT,
    # crop>=RF on the SPEED endpoint: the s2d stem doubles every conv's
    # input-pixel extent, so flagship's RF is 249 — it has only ever seen
    # 96 px crops (38% of its context). Crop 256 fine-tune of the release
    # weights, same teacher recipe as hq-ft-c128.
    "flagship-ft-c256": FLAGSHIP,
    # crop>=RF on the sub-100 ms quality leader (RF 195, trained at 96)
    "tiramisu-lt1-ft-c208": TIRAMISU_LT1,
    # second SGDR leg of the tiramisu-fast crop-208 fine-tune (the first
    # leg won 3/4 families but lost spheres by 0.12 dB — val was still
    # monotone at its final step)
    "tiramisu-ft2-c208": TIRAMISU_FAST,
}
from deepdenoiser_tpu.data import synthetic_jax
from deepdenoiser_tpu.ops.losses import LossConfig
from deepdenoiser_tpu.training import train as train_lib
from deepdenoiser_tpu.training.checkpoint import CheckpointManager


def mcfg_has_scales(name: str) -> bool:
    return MODELS[name].n_scales > 1


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--crop", type=int, default=96)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--out", default="checkpoints/flagship")
    p.add_argument("--log-every", type=int, default=200)
    p.add_argument("--loss", default="l1", choices=["l1", "l2", "smape", "huber"])
    p.add_argument("--grad-weight", type=float, default=0.2)
    p.add_argument("--model", default="flagship", choices=sorted(MODELS))
    p.add_argument("--family", default="mixed",
                   choices=["fourier", "voronoi", "mixed", "mc", "mixed-mc"],
                   help="training signal family (r3 default: mixed = "
                        "Fourier + Voronoi, scene-scale/exposure randomized; "
                        "'fourier' reproduces the r1/r2 corpus; 'mc' = "
                        "traced Monte-Carlo estimates (data/mc_tracer.py — "
                        "real fireflies/penumbra noise, r5), 'mixed-mc' = "
                        "thirds fourier/voronoi/mc. With an mc family the "
                        "spheres holdout shares the scene geometry CLASS "
                        "with training — the boxes holdout is the untouched "
                        "arbiter)")
    p.add_argument("--val-every", type=int, default=2000,
                   help="validate on unseen-seed batches of the training "
                        "families every N steps; the best-EMA-PSNR "
                        "checkpoint is kept at <out>-best (0 disables)")
    p.add_argument("--teacher", default=None, choices=sorted(MODELS),
                   help="knowledge distillation: run this frozen zoo member "
                        "(shipped weights/<name>_ema_f16.npz) on every "
                        "training batch and blend its prediction into the "
                        "loss (TrainConfig.distill_weight)")
    p.add_argument("--distill-weight", type=float, default=0.5,
                   help="teacher share of the loss when --teacher is set")
    p.add_argument("--init-from", default=None,
                   help="release npz to initialize the student from "
                        "(fine-tune; ignored when the workdir resumes)")
    p.add_argument("--save-every", type=int, default=0,
                   help="resume-checkpoint cadence in steps (0 = the "
                        "max(10*log_every, 10k) default). The axon tunnel "
                        "drops strand the client (STATUS_R4 incident); a "
                        "tighter cadence bounds the redo cost")
    args = p.parse_args()

    from deepdenoiser_tpu.utils import tpu_guard

    # training is the long-running chip holder: taking the lock makes any
    # concurrent latency tool refuse to measure (STATUS_R3 incident)
    tpu_guard.guard_latency_tool(f"pretrain:{args.model}")
    mcfg = MODELS[args.model]
    tcfg = TrainConfig(
        steps=args.steps, warmup_steps=min(200, args.steps // 10),
        learning_rate=args.lr, schedule="cosine", ema_decay=0.999,
        loss=LossConfig(kind=args.loss, gradient_weight=args.grad_weight),
        # per-scale supervision for multi-scale models (VERDICT r2 item 2)
        scale_supervision_weight=0.5 if mcfg_has_scales(args.model) else 0.0,
        distill_weight=args.distill_weight if args.teacher else 0.0,
    )
    mode = {24: "joint", 6: "group", 3: "rgb"}[mcfg.out_channels]

    state = train_lib.create_state(mcfg, tcfg, jax.random.PRNGKey(0), spatial=args.crop)
    if args.init_from:
        import jax.numpy as jnp
        from deepdenoiser_tpu.weights_io import load_release_params
        loaded = jax.tree.map(jnp.asarray, load_release_params(args.init_from))
        state = state.replace(params=loaded,
                              ema_params=jax.tree.map(jnp.copy, loaded)
                              if state.ema_params is not None else None)
        print(f"student initialized from {args.init_from}", flush=True)
    base_step = train_lib.make_train_step(mcfg, tcfg, None)
    raw_gen = lambda key: synthetic_jax.training_batch(  # noqa: E731
        key, args.batch, args.crop, mode, args.family)
    if args.teacher:
        from deepdenoiser_tpu.models import factory
        from deepdenoiser_tpu.weights_io import load_release_params
        t_mcfg = MODELS[args.teacher]
        t_mode = {24: "joint", 6: "group", 3: "rgb"}[t_mcfg.out_channels]
        if t_mode != mode:
            raise SystemExit(f"teacher mode {t_mode!r} != student mode {mode!r}")
        t_npz = Path(__file__).resolve().parents[1] / "weights" / (
            args.teacher.replace("-", "_") + "_ema_f16.npz")
        t_params = jax.device_put(load_release_params(t_npz))
        t_model = factory.build_model(t_mcfg)
        print(f"distilling from {args.teacher} ({t_npz.name}), "
              f"weight {args.distill_weight}", flush=True)

    # ONE dispatch per step: batch synthesis (+ teacher forward) and the
    # train step compile into a single program. Through the tunneled chip
    # every extra dispatch costs a host round-trip, which dominated the
    # distillation probes (teacher-as-separate-dispatch ran 12 steps/s
    # where the plain run does ~58; see STATUS_R4). Teacher params are an
    # ARGUMENT, not a closure — closed-over device arrays would be baked
    # into the program as constants.
    if args.teacher:
        def _fused(st, key, tp):
            b = dict(raw_gen(key))
            b["y_teacher"] = t_model.apply(tp, b["x"])
            return base_step(st, b)
        _fused_jit = jax.jit(_fused, donate_argnums=0)
        step_fn = lambda st, key: _fused_jit(st, key, t_params)  # noqa: E731
    else:
        step_fn = jax.jit(lambda st, key: base_step(st, raw_gen(key)),
                          donate_argnums=0)

    # Validation for checkpoint SELECTION (not the quality holdout): same
    # families as training but keys the training stream never sees
    # (training keys derive from PRNGKey(42+start) splits). The untouched
    # spheres holdout (data/synthetic_spheres.py) is reporting-only.
    eval_step = train_lib.make_eval_step(mcfg, tcfg.loss, use_ema=True)
    val_batches = [
        synthetic_jax.training_batch(
            jax.random.PRNGKey(987_000 + i), args.batch, args.crop, mode,
            args.family)
        for i in range(4)
    ]

    def val_psnr(st) -> float:
        return float(sum(
            eval_step(st, b)["psnr_encoded"] for b in val_batches
        )) / len(val_batches)

    resume_mgr = CheckpointManager(args.out, keep=1)
    restored = resume_mgr.restore_latest(state)
    start = 0
    if restored is not None:
        state = restored[0]
        start = int(state.step)
        print(f"resuming from step {start}", flush=True)
    resume_mgr.close()

    key = jax.random.PRNGKey(42 + start)
    t0 = time.time()
    mgr = CheckpointManager(args.out, keep=1)
    best_mgr = CheckpointManager(args.out + "-best", keep=1) if args.val_every else None
    best = -float("inf")
    save_every = args.save_every or max(args.log_every * 10, 10_000)
    for i in range(start + 1, args.steps + 1):
        key, k = jax.random.split(key)
        state, mets = step_fn(state, k)
        if i % args.log_every == 0 or i == args.steps:
            loss = float(mets["loss"])  # scalar fetch; forces the chain
            rate = (i - start) / (time.time() - t0)
            print(f"step {i}/{args.steps} loss={loss:.5f} ({rate:.1f} steps/s)",
                  flush=True)
        if args.val_every and (i % args.val_every == 0 or i == args.steps):
            v = val_psnr(state)
            marker = ""
            if v > best:
                best = v
                best_mgr.save(i, state, force=True,
                              extra={"model": args.model, "mode": mode,
                                     "val_psnr": v, "family": args.family})
                marker = "  <- best"
            print(f"  val[{i}] psnr_encoded={v:.3f} dB (best {best:.3f}){marker}",
                  flush=True)
        if i % save_every == 0 and i != args.steps:
            mgr.save(i, state, extra={"model": args.model, "mode": mode})

    mgr.save(args.steps, state, extra={"model": args.model, "mode": mode},
             force=True)
    mgr.close()
    if best_mgr is not None:
        best_mgr.close()
        print(f"best val checkpoint at {args.out}-best (psnr {best:.3f})")
    print(f"saved checkpoint to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
