"""Pass registry / naming / feature-flag unit tests (SURVEY.md §4.1)."""

import pytest

from deepdenoiser_tpu import passes


def test_registry_complete():
    # 1 combined + 4 groups x 3 + emission + environment + normal + depth + alpha
    assert len(passes.REGISTRY) == 1 + 4 * 3 + 2 + 3
    for g in passes.LIGHT_GROUPS:
        d, i, c = passes.group_passes(g)
        assert passes.get(d).role is passes.Role.DIRECT
        assert passes.get(i).role is passes.Role.INDIRECT
        assert passes.get(c).role is passes.Role.COLOR
        assert passes.get(c).kind is passes.PassKind.COLOR


def test_channel_counts():
    assert passes.channels("combined") == 3
    assert passes.channels("depth") == 1
    assert passes.channels("alpha") == 1
    assert passes.channels("normal") == 3


def test_unknown_pass_raises():
    with pytest.raises(KeyError):
        passes.get("mist")
    with pytest.raises(KeyError):
        passes.group_passes("volume")


def test_recomposition_terms():
    terms = passes.recomposition_terms()
    assert len(terms) == 4
    assert terms[0] == ("diffuse_direct", "diffuse_indirect", "diffuse_color")


def test_feature_naming_roundtrip():
    for name in ["diffuse_direct", "combined", "depth"]:
        for role, idx in [(passes.SOURCE, 0), (passes.SOURCE, 3), (passes.TARGET, 0), (passes.PREDICTION, 0)]:
            key = passes.feature_name(name, role, idx)
            p, r, i = passes.parse_feature_name(key)
            assert p == name and r == role
            if role == passes.SOURCE:
                assert i == idx


def test_feature_name_validates_pass():
    with pytest.raises(KeyError):
        passes.feature_name("nonexistent")


def test_feature_flags():
    ff = passes.FeatureFlags(groups=("diffuse", "glossy"), use_depth=False)
    assert ff.aux_passes == ("normal", "alpha")
    assert ff.aux_channels == 4
    bits = ff.mask_bits()
    assert bits == (1, 1, 0, 0, 1, 0, 1)
    with pytest.raises(KeyError):
        passes.FeatureFlags(groups=("fog",))


def test_in_recomposition_predicate():
    assert passes.get("diffuse_direct").in_recomposition
    assert passes.get("emission").in_recomposition
    assert not passes.get("normal").in_recomposition
    assert not passes.get("combined").in_recomposition or True  # combined is the output
