"""Training engine tests (SURVEY.md §4.3, §4.5): DP invariant on 8 fake
devices, overfit-one-batch, determinism, EMA, checkpoint resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepdenoiser_tpu.config import TrainConfig
from deepdenoiser_tpu.models.factory import ModelConfig
from deepdenoiser_tpu.parallel import mesh as M
from deepdenoiser_tpu.training import train as T
from deepdenoiser_tpu.training.checkpoint import CheckpointManager


def tiny_cfgs(**tkw):
    mcfg = ModelConfig(backbone="unet", in_channels=8, out_channels=6,
                       base_width=8, depth=1, convs_per_level=1)
    tkw.setdefault("steps", 200)
    tkw.setdefault("warmup_steps", 10)
    tcfg = TrainConfig(**tkw)
    return mcfg, tcfg


def fixed_batch(n=16, s=16, cin=8, cout=6):
    x = jax.random.normal(jax.random.PRNGKey(1), (n, s, s, cin))
    y = jax.random.normal(jax.random.PRNGKey(2), (n, s, s, cout)) * 0.1
    return {"x": x, "y": y}


def test_dp_matches_single_device(devices8):
    """Global-batch gradient on 1 device == allreduced gradient on 8
    (BASELINE config #4's correctness invariant)."""
    mcfg, tcfg = tiny_cfgs()
    batch = fixed_batch()

    state1 = T.create_state(mcfg, tcfg, jax.random.PRNGKey(0), spatial=16)
    s1, m1 = T.make_train_step(mcfg, tcfg, None)(state1, batch)

    mesh = M.make_mesh(8)
    state8 = T.create_state(mcfg, tcfg, jax.random.PRNGKey(0), spatial=16)
    s8, m8 = T.make_train_step(mcfg, tcfg, mesh)(state8, M.shard_batch(batch, mesh))

    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-5
    assert abs(float(m1["grad_norm"]) - float(m8["grad_norm"])) < 1e-5
    # updated params agree across the two paths
    p1 = jax.tree.leaves(s1.params)
    p8 = jax.tree.leaves(s8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_overfit_one_batch():
    from deepdenoiser_tpu.ops.losses import LossConfig

    mcfg, tcfg = tiny_cfgs(
        learning_rate=3e-2, warmup_steps=0, schedule="constant",
        loss=LossConfig(kind="l2", gradient_weight=0.0),
    )
    state = T.create_state(mcfg, tcfg, jax.random.PRNGKey(0), spatial=16)
    step = T.make_train_step(mcfg, tcfg, None)
    batch = fixed_batch(n=4)
    first = None
    for i in range(120):
        state, mets = step(state, batch)
        if first is None:
            first = float(mets["loss"])
    last = float(mets["loss"])
    assert last < 0.3 * first, (first, last)


def test_train_step_deterministic():
    mcfg, tcfg = tiny_cfgs()
    batch = fixed_batch(n=4)
    outs = []
    for _ in range(2):
        state = T.create_state(mcfg, tcfg, jax.random.PRNGKey(0), spatial=16)
        state, mets = T.make_train_step(mcfg, tcfg, None)(state, batch)
        outs.append(np.asarray(mets["loss"]))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_ema_tracks_params():
    mcfg, tcfg = tiny_cfgs(ema_decay=0.5, learning_rate=1e-2, warmup_steps=0,
                           schedule="constant")
    state = T.create_state(mcfg, tcfg, jax.random.PRNGKey(0), spatial=16)
    step = T.make_train_step(mcfg, tcfg, None)
    batch = fixed_batch(n=4)
    s1, _ = step(state, batch)
    # ema = 0.5*old + 0.5*new and old == init params
    init = T.create_state(mcfg, tcfg, jax.random.PRNGKey(0), spatial=16).params
    want = jax.tree.map(lambda e, p: 0.5 * e + 0.5 * p, init, s1.params)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(s1.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_eval_step_runs():
    mcfg, tcfg = tiny_cfgs()
    state = T.create_state(mcfg, tcfg, jax.random.PRNGKey(0), spatial=16)
    ev = T.make_eval_step(mcfg, tcfg.loss, None)
    mets = ev(state, fixed_batch(n=2))
    assert np.isfinite(float(mets["loss"]))


def test_full_eval_step_reports_ema_and_tonemapped():
    """make_full_eval_step evaluates BOTH raw and EMA params and reports
    tonemapped PSNR/SSIM comparable with the inference-side numbers
    (VERDICT r1 weak #5/#6)."""
    from deepdenoiser_tpu import passes, transforms
    from deepdenoiser_tpu.config import DataConfig
    from deepdenoiser_tpu.data import synthetic

    dcfg = DataConfig(mode="joint", batch_size=2, crop=16)
    mcfg = ModelConfig(
        in_channels=transforms.joint_input_channels(),
        out_channels=transforms.joint_output_channels(),
        base_width=8, depth=1, convs_per_level=1,
    )
    tcfg = TrainConfig(steps=10, warmup_steps=0, ema_decay=0.9)

    clean = synthetic.generate_clean_passes(16, 16, seed=3)
    noisy = synthetic.add_mc_noise(clean, spp=4, seed=4)
    raw = {f"source/{k}": np.stack([v, v]) for k, v in noisy.items()}
    tgt_names = [n for g in passes.LIGHT_GROUPS for n in passes.group_passes(g)]
    for name in tgt_names + ["combined"]:
        raw[f"target/{name}"] = np.stack([clean[name], clean[name]])

    state = T.create_state(mcfg, tcfg, jax.random.PRNGKey(0), spatial=16)
    mets = T.make_full_eval_step(mcfg, dcfg, tcfg.loss, None)(state, raw)
    for k in ("loss", "psnr_encoded", "psnr_tm", "ssim_tm",
              "ema_loss", "ema_psnr_tm", "ema_ssim_tm", "noisy_psnr_tm"):
        assert k in mets and np.isfinite(float(mets[k])), k

    n, d, g = T.make_eval_preview(mcfg, dcfg, max_images=2)(state, raw)
    assert n.shape == d.shape == g.shape == (2, 16, 16, 3)


def test_checkpoint_roundtrip(tmp_path):
    mcfg, tcfg = tiny_cfgs(ema_decay=0.9)
    state = T.create_state(mcfg, tcfg, jax.random.PRNGKey(0), spatial=16)
    state, _ = T.make_train_step(mcfg, tcfg, None)(state, fixed_batch(n=2))

    mgr = CheckpointManager(tmp_path / "ckpt", keep=2)
    assert mgr.latest_step() is None
    mgr.save(int(state.step), state, extra={"note": "hello", "step": 1})
    mgr.wait()
    assert mgr.latest_step() == 1

    template = T.create_state(mcfg, tcfg, jax.random.PRNGKey(3), spatial=16)
    restored, extra = mgr.restore_latest(template)
    assert extra.get("note") == "hello"
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 1
    mgr.close()


def test_checkpoint_keep_limit(tmp_path):
    mcfg, tcfg = tiny_cfgs()
    state = T.create_state(mcfg, tcfg, jax.random.PRNGKey(0), spatial=16)
    mgr = CheckpointManager(tmp_path / "ckpt", keep=2)
    for step in (1, 2, 3):
        mgr.save(step, state.replace(step=jnp.asarray(step)), force=True)
    mgr.wait()
    assert mgr.latest_step() == 3
    mgr.close()


def test_train_step_no_retracing():
    """The step compiles once and is reused — retracing (the TPU analogue
    of a perf race) would show as cache misses (SURVEY.md §5)."""
    mcfg, tcfg = tiny_cfgs()
    state = T.create_state(mcfg, tcfg, jax.random.PRNGKey(0), spatial=16)
    step = T.make_train_step(mcfg, tcfg, None)
    for _ in range(3):
        state, _ = step(state, fixed_batch(n=2))
    assert step._cache_size() == 1


def test_nan_inputs_surface_in_metrics():
    """NaN poisoning is visible in the loss (debuggable via jax_debug_nans),
    not silently propagated into saved params as zeros."""
    mcfg, tcfg = tiny_cfgs()
    state = T.create_state(mcfg, tcfg, jax.random.PRNGKey(0), spatial=16)
    step = T.make_train_step(mcfg, tcfg, None)
    batch = fixed_batch(n=2)
    batch["x"] = batch["x"].at[0, 0, 0, 0].set(jnp.nan)
    _, mets = step(state, batch)
    assert not np.isfinite(float(mets["loss"]))


def test_remat_training_matches_plain():
    """jax.checkpoint'd conv stacks change memory, not math: identical param
    trees (checkpoints transfer between memory modes) and identical step
    results."""
    import jax.tree_util as jtu

    outs = {}
    trees = {}
    for remat in (False, True):
        mcfg = ModelConfig(backbone="unet", in_channels=8, out_channels=6,
                           base_width=8, depth=1, convs_per_level=1, remat=remat)
        tcfg = TrainConfig(steps=10, warmup_steps=0, schedule="constant")
        state = T.create_state(mcfg, tcfg, jax.random.PRNGKey(0), spatial=16)
        trees[remat] = sorted(
            jtu.keystr(k) for k, _ in jtu.tree_leaves_with_path(state.params)
        )
        _, mets = T.make_train_step(mcfg, tcfg, None)(state, fixed_batch(n=2))
        outs[remat] = (float(mets["loss"]), float(mets["grad_norm"]))
    assert trees[False] == trees[True]
    assert abs(outs[False][0] - outs[True][0]) < 1e-6
    assert abs(outs[False][1] - outs[True][1]) < 1e-5


def test_distill_loss_blends_teacher():
    """distill_weight>0 + a 'y_teacher' batch entry: w=0 reproduces the
    plain loss exactly; w=1 with teacher==prediction-target drives the
    loss toward the teacher term only (tools/pretrain_flagship.py
    --teacher carries the frozen-teacher forward in the batch)."""
    mcfg, _ = tiny_cfgs()
    batch = fixed_batch()
    batch_t = dict(batch, y_teacher=batch["y"] * 0.5 + 0.1)

    def run(w, b):
        _, tcfg = tiny_cfgs(distill_weight=w)
        state = T.create_state(mcfg, tcfg, jax.random.PRNGKey(0), spatial=16)
        _, mets = T.make_train_step(mcfg, tcfg, None)(state, b)
        return float(mets["loss"])

    plain = run(0.0, batch)
    # without the batch key, distill_weight is inert
    assert run(0.7, batch) == pytest.approx(plain, rel=1e-6)
    # blended loss sits strictly between the two pure losses
    pure_teacher = run(1.0, batch_t)
    blended = run(0.5, batch_t)
    lo, hi = sorted([plain, pure_teacher])
    assert lo < blended < hi
