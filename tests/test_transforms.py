"""Normalization round-trip, demodulation exactness, recomposition identity
(SURVEY.md §4.1 — the invariants everything else stands on)."""

import jax.numpy as jnp
import numpy as np
import pytest

from deepdenoiser_tpu import passes, transforms
from deepdenoiser_tpu.data import synthetic


@pytest.fixture(scope="module")
def clean():
    return synthetic.generate_clean_passes(48, 64, seed=7)


@pytest.fixture(scope="module")
def noisy(clean):
    return synthetic.add_mc_noise(clean, spp=8, seed=3)


def test_normalize_roundtrip_all_kinds(clean):
    for name, x in clean.items():
        y = transforms.normalize(name, jnp.asarray(x))
        x2 = transforms.denormalize(name, y)
        kind = passes.get(name).kind
        if kind in (passes.PassKind.RADIANCE, passes.PassKind.DEPTH):
            # fp32 log1p/expm1 round-trip: error ~ x * ulp(log1p(x))
            np.testing.assert_allclose(np.asarray(x2), x, rtol=5e-4, atol=1e-5)
        elif kind is passes.PassKind.COLOR:
            np.testing.assert_array_equal(np.asarray(x2), x)
        # NORMAL/ALPHA denormalize is identity on the (clamped) representation
        else:
            np.testing.assert_allclose(
                np.asarray(transforms.normalize(name, x2)), np.asarray(y), atol=1e-7
            )


def test_radiance_norm_clamps_negatives():
    x = jnp.array([-1.0, 0.0, 1.0])
    y = transforms.normalize("combined", x)
    assert float(y[0]) == 0.0
    assert np.isfinite(np.asarray(y)).all()


def test_demodulate_exact_roundtrip_incl_black_albedo():
    rng = np.random.default_rng(0)
    radiance = jnp.asarray(rng.uniform(0, 10, (16, 16, 3)).astype(np.float32))
    albedo = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
    albedo = albedo.at[:4, :4].set(0.0)  # exactly black region
    r2 = transforms.remodulate(transforms.demodulate(radiance, albedo), albedo)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(radiance), rtol=1e-6)


def test_recompose_identity_clean(clean):
    d = {k: jnp.asarray(v) for k, v in clean.items() if k != "combined"}
    rec = transforms.recompose(d)
    np.testing.assert_allclose(np.asarray(rec), clean["combined"], rtol=1e-5, atol=1e-5)


def test_recompose_identity_noisy(noisy):
    d = {k: jnp.asarray(v) for k, v in noisy.items() if k != "combined"}
    rec = transforms.recompose(d)
    np.testing.assert_allclose(np.asarray(rec), noisy["combined"], rtol=1e-5, atol=1e-5)


def test_recompose_partial_groups(clean):
    d = {k: jnp.asarray(clean[k]) for k in passes.group_passes("diffuse")}
    rec = np.asarray(transforms.recompose(d, groups=("diffuse",)))
    want = clean["diffuse_color"] * (clean["diffuse_direct"] + clean["diffuse_indirect"])
    np.testing.assert_allclose(rec, want, rtol=1e-6)


def test_recompose_empty_raises():
    with pytest.raises(ValueError):
        transforms.recompose({"normal": jnp.zeros((4, 4, 3))})


def test_encode_decode_group_cycle(clean):
    """decode(encode) on clean data reproduces direct/indirect exactly-ish."""
    d = {k: jnp.asarray(v) for k, v in clean.items()}
    x = transforms.encode_group_inputs(d, "glossy")
    assert x.shape == (48, 64, transforms.group_input_channels())
    net_out = x[..., :6]  # identity "network": the encoded log-demod signals
    dec = transforms.decode_group_outputs(net_out, d["glossy_color"])
    np.testing.assert_allclose(
        np.asarray(dec["direct"]), clean["glossy_direct"], rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(dec["indirect"]), clean["glossy_indirect"], rtol=1e-3, atol=1e-4
    )


def test_rgb_mode_channels(clean):
    d = {k: jnp.asarray(v) for k, v in clean.items()}
    x = transforms.encode_rgb_inputs(d)
    assert x.shape == (48, 64, transforms.rgb_input_channels())
    y = transforms.decode_rgb_outputs(transforms.normalize("combined", d["combined"]))
    np.testing.assert_allclose(np.asarray(y), clean["combined"], rtol=5e-4, atol=1e-5)


def test_numpy_and_jax_recompose_agree(noisy):
    d = {k: jnp.asarray(v) for k, v in noisy.items() if k != "combined"}
    a = np.asarray(transforms.recompose(d))
    b = synthetic.recompose_np({k: v for k, v in noisy.items() if k != "combined"})
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_flag_channels():
    ff = passes.FeatureFlags(groups=("diffuse",), use_depth=False)
    ch = transforms.encode_flag_channels(ff, 8, 10)
    assert ch.shape == (8, 10, 7)
    np.testing.assert_array_equal(np.asarray(ch[0, 0]), np.asarray(ff.mask_bits(), dtype=np.float32))
    assert np.asarray(ch).std(axis=(0, 1)).max() == 0  # constant per channel


def test_radiance_exposure_round_trip():
    """VERDICT r2 item 9: the corpus-derived exposure pre-scale is applied
    to every HDR radiance encode (group/joint/rgb) and inverted EXACTLY on
    decode — scaled and unscaled paths agree in the raw radiance domain."""
    import jax

    key = jax.random.PRNGKey(3)
    h = w = 8
    d = dict()
    for g in passes.LIGHT_GROUPS:
        dn, inn, cn = passes.group_passes(g)
        key, k1, k2, k3 = jax.random.split(key, 4)
        d[dn] = jax.random.uniform(k1, (h, w, 3), maxval=5.0)
        d[inn] = jax.random.uniform(k2, (h, w, 3), maxval=2.0)
        d[cn] = jax.random.uniform(k3, (h, w, 3))
    key, k1, k2, k3, k4 = jax.random.split(key, 5)
    d["normal"] = jax.random.uniform(k1, (h, w, 3), minval=-1.0, maxval=1.0)
    d["depth"] = jax.random.uniform(k2, (h, w, 1), maxval=30.0)
    d["alpha"] = jax.random.uniform(k3, (h, w, 1))
    d["combined"] = jax.random.uniform(k4, (h, w, 3), maxval=8.0)

    scales = {transforms.RADIANCE_SCALE_KEY: 0.31}

    # group: encoded first 6 channels ARE the log-demod signal; decoding
    # them must recover the raw direct/indirect exactly
    enc = transforms.encode_group_inputs(d, "diffuse", scales=scales)
    dec = transforms.decode_group_outputs(
        enc[..., :6], d["diffuse_color"], scales=scales
    )
    np.testing.assert_allclose(
        np.asarray(dec["direct"]), np.asarray(d["diffuse_direct"]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(dec["indirect"]), np.asarray(d["diffuse_indirect"]),
        rtol=1e-5, atol=1e-5,
    )
    # exposure actually changes the encoding
    enc_plain = transforms.encode_group_inputs(d, "diffuse")
    assert not np.allclose(np.asarray(enc[..., :6]), np.asarray(enc_plain[..., :6]))

    # joint: signal channels of group i are at 9i..9i+6
    encj = transforms.encode_joint_inputs(d, scales=scales)
    sig = np.concatenate(
        [np.asarray(encj[..., 9 * i : 9 * i + 6]) for i in range(4)], axis=-1
    )
    decj = transforms.decode_joint_outputs(
        jnp.asarray(sig), d, scales=scales
    )
    for g in passes.LIGHT_GROUPS:
        dn = passes.group_passes(g)[0]
        np.testing.assert_allclose(
            np.asarray(decj[dn]), np.asarray(d[dn]), rtol=1e-5, atol=1e-5
        )

    # rgb: combined round-trips through the exposure
    encr = transforms.encode_rgb_inputs(d, scales=scales)
    out = transforms.decode_rgb_outputs(encr[..., :3], scales)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(d["combined"]), rtol=1e-5, atol=1e-5
    )
