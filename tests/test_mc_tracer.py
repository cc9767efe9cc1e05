"""MC path-tracer family contract (VERDICT r4 missing #2).

The point of this family is that its noise is GENUINE Monte Carlo — the
noisy frame is an N-sample estimate of the same integral the GT estimates
at high spp. These tests pin the properties that make it a valid eval
family: determinism, the recomposition identity, convergence-to-GT in
expectation, noise-free aux buffers, and the two statistical signatures
Gaussian noise lacks (heavy tails / fireflies, variance correlated with
penumbrae)."""

import numpy as np
import pytest

from deepdenoiser_tpu.data import mc_tracer
from deepdenoiser_tpu.data.synthetic import recompose_np

H, W = 48, 64


def test_deterministic():
    a = mc_tracer.generate_noisy_passes(H, W, seed=3, spp=4, sample_seed=5)
    b = mc_tracer.generate_noisy_passes(H, W, seed=3, spp=4, sample_seed=5)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
    c = mc_tracer.generate_noisy_passes(H, W, seed=3, spp=4, sample_seed=6)
    assert np.abs(a["diffuse_direct"] - c["diffuse_direct"]).max() > 0


def test_recomposition_identity_clean_and_noisy():
    clean = mc_tracer.generate_clean_passes(H, W, seed=1, spp=32)
    noisy = mc_tracer.generate_noisy_passes(H, W, seed=1, spp=4)
    for frame in (clean, noisy):
        want = recompose_np(frame)
        np.testing.assert_allclose(frame["combined"], want, atol=2e-5)


def test_aux_buffers_noise_free():
    """Normal/depth/alpha/albedo/emission/environment are deterministic
    pass-throughs (primary visibility is pixel-center): identical between
    the GT and every noisy realization — the Cycles contract the encoder
    relies on."""
    clean = mc_tracer.generate_clean_passes(H, W, seed=2, spp=8)
    noisy = mc_tracer.generate_noisy_passes(H, W, seed=2, spp=4)
    for k in ("normal", "depth", "alpha", "emission", "environment",
              "diffuse_color", "glossy_color"):
        np.testing.assert_array_equal(clean[k], noisy[k])


def test_noisy_converges_to_gt():
    """The noisy frames are unbiased estimates of what the GT estimates:
    averaging K independent 8-spp realizations must approach the 512-spp
    GT (error shrinking ~1/sqrt(K·spp))."""
    gt = mc_tracer.generate_clean_passes(H, W, seed=4, spp=512)
    singles = [
        mc_tracer.generate_noisy_passes(H, W, seed=4, spp=8, sample_seed=s)
        for s in range(16)
    ]
    key = "diffuse_direct"
    err_one = np.sqrt(np.mean((singles[0][key] - gt[key]) ** 2))
    mean = np.mean([s[key] for s in singles], axis=0)
    err_mean = np.sqrt(np.mean((mean - gt[key]) ** 2))
    assert err_one > 0
    # 16 averaged realizations: std shrinks 4x in theory; demand >2.5x
    assert err_mean < err_one / 2.5, (err_mean, err_one)


def _emitter_seeds(n=3):
    out = []
    for seed in range(40):
        scene = mc_tracer.make_scene(seed)
        if float(np.asarray(scene.emission).max()) > 0:
            out.append(seed)
            if len(out) == n:
                return out
    raise AssertionError("fewer than 3 emitter seeds in 40 (p < 1e-9)")


def test_indirect_noise_is_heavy_tailed():
    """Fireflies: rare hemisphere rays hit the bright emitter, so the
    4-spp indirect residual has far higher kurtosis than any Gaussian
    (excess kurtosis 0). This is exactly what synthetic.add_mc_noise
    cannot produce. Firefly frequency depends on emitter solid angle, so
    the statistics are checked over the first three emitter scenes
    (measured kurtosis at 48x64: 5.8 / 18.1 / 352)."""
    kurts, ratios = [], []
    for seed in _emitter_seeds(3):
        gt = mc_tracer.generate_clean_passes(H, W, seed=seed, spp=512)
        noisy = mc_tracer.generate_noisy_passes(H, W, seed=seed, spp=4)
        hitmask = gt["alpha"][..., 0] > 0.5
        resid = (noisy["diffuse_indirect"] - gt["diffuse_indirect"])[hitmask]
        resid = resid.ravel()
        resid = resid - resid.mean()
        std = resid.std()
        assert std > 0
        kurts.append(np.mean(resid**4) / std**4 - 3.0)
        ratios.append(np.abs(resid).max() / std)
    assert max(kurts) > 8.0, f"excess kurtosis {kurts} — not heavy-tailed"
    # and at least one genuine firefly: a sample many sigma out
    assert max(ratios) > 8.0, f"max/std {ratios} — no fireflies"


def test_direct_noise_concentrates_in_penumbrae():
    """MC noise is spatially correlated with integrand variance: pixels
    whose area-light visibility is fractional (penumbra) must be noisier
    than fully-lit pixels at equal signal level. Gaussian
    signal-proportional noise is flat in this comparison."""
    seed = 4
    gt = mc_tracer.generate_clean_passes(H, W, seed=seed, spp=512)
    realizations = np.stack([
        mc_tracer.generate_noisy_passes(H, W, seed=seed, spp=4,
                                        sample_seed=s)["diffuse_direct"]
        for s in range(8)
    ])
    pixel_std = realizations.std(axis=0).mean(-1)  # (H, W)
    signal = gt["diffuse_direct"].mean(-1)
    hit = gt["alpha"][..., 0] > 0.5
    # penumbra proxy: mid-brightness pixels (fractional visibility);
    # fully lit: top-brightness pixels. Compare RELATIVE noise.
    lit = hit & (signal > np.percentile(signal[hit], 80))
    mid = hit & (signal > np.percentile(signal[hit], 30)) & (
        signal < np.percentile(signal[hit], 60))
    if mid.sum() < 20 or lit.sum() < 20:
        pytest.skip("degenerate scene framing for this seed")
    rel_mid = (pixel_std[mid] / np.maximum(signal[mid], 1e-3)).mean()
    rel_lit = (pixel_std[lit] / np.maximum(signal[lit], 1e-3)).mean()
    assert rel_mid > 1.2 * rel_lit, (rel_mid, rel_lit)


def test_window_render_matches_full_frame_slice():
    """A (oy, ox) crop-window render of a virtual full frame must agree
    with the same slice of the full-frame render: exactly for the
    deterministic buffers (primary visibility is pixel-center), and in
    expectation for the traced radiance (the per-pixel sample streams are
    shaped by the render extent, so realizations differ; the estimators
    share the integral)."""
    import jax

    scene = mc_tracer.make_scene(11)
    key = jax.random.PRNGKey(0)
    full = {k: np.asarray(v) for k, v in
            mc_tracer.render(scene, H, W, 128, key).items()}
    ch, cw, oy, ox = 16, 16, 20, 24
    win = {k: np.asarray(v) for k, v in
           mc_tracer.render(scene, ch, cw, 128, key,
                            window_origin=(oy, ox),
                            full_shape=(H, W)).items()}
    sl = np.s_[oy:oy + ch, ox:ox + cw]
    for k in ("normal", "depth", "alpha", "emission", "environment",
              "diffuse_color"):
        np.testing.assert_allclose(win[k], full[k][sl], atol=1e-5, err_msg=k)
    # radiance: same integral, independent 128-spp estimates -> means agree
    a = win["diffuse_direct"].mean()
    b = full["diffuse_direct"][sl].mean()
    assert abs(a - b) < 0.15 * max(abs(b), 1e-3), (a, b)


def test_make_scene_jax_renders_and_is_deterministic():
    import jax

    k = jax.random.PRNGKey(7)
    s1 = mc_tracer.make_scene_jax(k)
    s2 = mc_tracer.make_scene_jax(k)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out = mc_tracer.render(s1, 24, 32, 4, jax.random.PRNGKey(1))
    comb = np.asarray(out["combined"])
    assert np.isfinite(comb).all()
    assert comb.max() > 0
    # recomposition identity holds for the jax-drawn scene too
    np.testing.assert_allclose(
        comb, recompose_np({kk: np.asarray(vv) for kk, vv in out.items()}),
        atol=2e-5)


def test_training_batch_mc_families(monkeypatch):
    """family='mc' / 'mixed-mc' produce encoded batches with the standard
    {'x','y'} contract (GT spp patched down: this is a shape/finiteness
    test, not a quality run)."""
    import jax

    from deepdenoiser_tpu import transforms
    from deepdenoiser_tpu.data import synthetic_jax

    monkeypatch.setattr(synthetic_jax, "MC_TRAIN_GT_SPP", 16)
    crop = 24  # unique static signature so the patched trace isn't reused
    for family, n in (("mc", 4), ("mixed-mc", 6)):
        b = synthetic_jax.training_batch(
            jax.random.PRNGKey(3), n, crop, "joint", family)
        assert b["x"].shape == (n, crop, crop,
                                transforms.joint_input_channels())
        assert b["y"].shape == (n, crop, crop,
                                transforms.joint_output_channels())
        for v in b.values():
            assert np.isfinite(np.asarray(v)).all()
