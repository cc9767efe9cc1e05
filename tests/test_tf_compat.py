"""TF-checkpoint compatibility round trip (SURVEY.md N3, §4.6):
export Flax U-Net weights to a TF1-style name-based checkpoint, re-import,
assert bitwise parameter equality and forward-output equality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepdenoiser_tpu.compat import tf_checkpoint as tfc
from deepdenoiser_tpu.models import factory
from deepdenoiser_tpu.models.factory import ModelConfig

DEPTH = 2


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig(backbone="unet", in_channels=5, out_channels=3,
                       base_width=4, depth=DEPTH, convs_per_level=2)


@pytest.fixture(scope="module")
def params(cfg):
    return factory.init_params(cfg, jax.random.PRNGKey(7), spatial=16)


def test_name_mapping_bijective(params):
    flat = tfc._flatten(params["params"]["UNet_0"])
    for path in flat:
        tf_name = tfc.flax_path_to_tf_name(path, DEPTH)
        back = tfc.tf_name_to_flax_path(tf_name, DEPTH)
        assert back == path, (path, tf_name, back)


def test_optimizer_slots_skipped():
    assert tfc.tf_name_to_flax_path("unet/head/kernel/Adam", DEPTH) is None
    assert tfc.tf_name_to_flax_path("global_step", DEPTH) is None
    with pytest.raises(KeyError):
        tfc.tf_name_to_flax_path("unet/mystery/kernel", DEPTH)


def test_export_import_roundtrip(tmp_path, cfg, params):
    ckpt = tmp_path / "tfckpt" / "model.ckpt"
    ckpt.parent.mkdir()
    names = tfc.export_unet_checkpoint(params, DEPTH, ckpt)
    assert any(n.startswith("unet/stem") for n in names)
    assert any(n.startswith("unet/head") for n in names)

    imported = tfc.import_unet_checkpoint(ckpt, DEPTH)
    assert tfc.structural_diff(imported, params) == []

    # bitwise parameter equality
    for (ka, a), (kb, b) in zip(
        sorted(tfc._flatten(imported["params"]).items()),
        sorted(tfc._flatten(dict(params["params"])).items()),
    ):
        assert ka == kb
        np.testing.assert_array_equal(a, np.asarray(b))

    # forward-output equality (BASELINE.json:5 "within numerical tolerance";
    # here it is exact because weights and layout round-trip losslessly)
    model = factory.build_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, cfg.in_channels))
    y_orig = model.apply(params, x)
    y_imp = model.apply(jax.tree.map(jnp.asarray, imported), x)
    np.testing.assert_array_equal(np.asarray(y_orig), np.asarray(y_imp))


ZOO_CFGS = {
    # tiny twins of the four shipped families (r4: whole-zoo name maps)
    "unet": ModelConfig(backbone="unet", in_channels=5, out_channels=3,
                        base_width=4, depth=2, convs_per_level=2),
    "tiramisu": ModelConfig(backbone="tiramisu", in_channels=5, out_channels=3,
                            growth_rate=4, layers_per_block=2, depth=2,
                            up_compress=8, layers_top=1),
    "multiscale": ModelConfig(backbone="unet", in_channels=5, out_channels=3,
                              base_width=4, depth=2, convs_per_level=1,
                              n_scales=2),
    "kpn": ModelConfig(backbone="unet", in_channels=8, out_channels=6,
                       base_width=4, depth=2, convs_per_level=1,
                       kernel_prediction=True, kpn_size=3, kpn_slots=2,
                       kpn_logit_norm=True),
}


@pytest.mark.parametrize("fam", sorted(ZOO_CFGS))
def test_zoo_name_mapping_bijective(fam):
    cfg = ZOO_CFGS[fam]
    p = factory.init_params(cfg, jax.random.PRNGKey(1), spatial=16)
    for path in tfc._flatten(p["params"]):
        tf_name = tfc.full_flax_path_to_tf_name(path, cfg)
        back = tfc.full_tf_name_to_flax_path(tf_name, cfg)
        assert back == path, (path, tf_name, back)


@pytest.mark.parametrize("fam", sorted(ZOO_CFGS))
def test_zoo_export_import_roundtrip(tmp_path, fam):
    cfg = ZOO_CFGS[fam]
    p = factory.init_params(cfg, jax.random.PRNGKey(2), spatial=16)
    ckpt = tmp_path / fam / "model.ckpt"
    ckpt.parent.mkdir()
    names = tfc.export_checkpoint(p, cfg, ckpt)
    scope = "tiramisu/" if cfg.backbone == "tiramisu" else "unet/"
    assert all(n.startswith((scope, "kpn/")) for n in names)
    imported = tfc.import_checkpoint(ckpt, cfg)
    assert tfc.structural_diff(imported, p) == []
    for (ka, a), (kb, b) in zip(
        sorted(tfc._flatten(imported["params"]).items()),
        sorted(tfc._flatten(dict(p["params"])).items()),
    ):
        assert ka == kb
        np.testing.assert_array_equal(a, np.asarray(b))
    model = factory.build_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, cfg.in_channels))
    np.testing.assert_array_equal(
        np.asarray(model.apply(p, x)),
        np.asarray(model.apply(jax.tree.map(jnp.asarray, imported), x)),
    )


@pytest.mark.parametrize("fam", ["unet", "tiramisu", "multiscale", "kpn"])
def test_frozen_goldens(fam):
    """Non-circular parity: import the COMMITTED TF checkpoint and match
    the COMMITTED forward output (tools/verify_parity.py --make generated
    them once; regressions now fail against history, not against self)."""
    from deepdenoiser_tpu.compat import goldens

    dev = goldens.check(fam)
    assert dev <= goldens.ATOL


def test_typed_error_on_unknown_scope():
    cfg = ZOO_CFGS["unet"]
    with pytest.raises(tfc.UnmappedVariableError):
        tfc.full_tf_name_to_flax_path("resnet/stem/kernel", cfg)
    with pytest.raises(tfc.UnmappedVariableError):
        # tiramisu-scoped var into a unet model
        tfc.full_tf_name_to_flax_path("tiramisu/stem/kernel", cfg)
    with pytest.raises(tfc.UnmappedVariableError):
        # KPN temperature into a non-KPN model
        tfc.full_tf_name_to_flax_path("kpn/kernel_temp", cfg)


def test_structural_diff_reports(params):
    broken = jax.tree.map(lambda x: x, params)  # copy structure
    flat = tfc._flatten(dict(broken["params"]))
    problems = tfc.structural_diff({"x": np.zeros((2,))}, params)
    assert problems  # completely different trees
