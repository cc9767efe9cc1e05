"""bpy-free tests of the Blender data-generation scripts' arg parsing and
naming contract (SURVEY.md C19; VERDICT r1: these shipped untested because
no Blender exists in the environment — everything testable WITHOUT bpy is
tested here: CLI surface, pass-name mapping, and the on-disk naming the
ingest layer consumes)."""

import re
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "blender"))

import batch_render  # noqa: E402
import render_passes  # noqa: E402

from deepdenoiser_tpu import passes  # noqa: E402
from deepdenoiser_tpu.data import exr  # noqa: E402
from deepdenoiser_tpu.data.prepare import GT_DIR  # noqa: E402
from deepdenoiser_tpu.inference.sequence import _variant_spp_key  # noqa: E402


def test_render_passes_arg_contract():
    args = render_passes.parse_args(
        ["--out", "/tmp/x", "--gt-spp", "2048", "--spp", "4", "16",
         "--seeds", "3", "--frame", "7", "--res-x", "640", "--res-y", "480"]
    )
    assert args.out == "/tmp/x"
    assert args.gt_spp == 2048
    assert args.spp == [4, 16]
    assert args.seeds == 3
    assert args.frame == 7 and args.res_x == 640 and args.res_y == 480


def test_render_passes_requires_out():
    with pytest.raises(SystemExit):
        render_passes.parse_args([])


def test_pass_toggles_map_to_registry():
    """Every Cycles pass the script toggles maps through CYCLES_NAME_MAP to
    a canonical registry pass — the ingest layer can name every buffer the
    renderer will emit. Alpha rides the Combined RGBA (film_transparent)."""
    mapped = set()
    for attr, cycles_name in render_passes.PASS_TOGGLES:
        assert attr.startswith("use_pass_"), attr
        canonical = exr.CYCLES_NAME_MAP[cycles_name]
        assert canonical in passes.REGISTRY, cycles_name
        mapped.add(canonical)
    # full registry coverage minus alpha (delivered via Combined's A chan)
    assert mapped == set(passes.ALL_PASSES) - {"alpha"}


def test_variant_dir_naming_contract():
    """The spp<N>_seed<K> / ground_truth names render_passes.main writes are
    exactly what prepare-data walks and what the eval harness sorts by
    numeric spp (noisiest first)."""
    out = Path("/data/renders/frame0001")
    gt_dir = out / GT_DIR
    variant_dirs = [
        out / f"spp{spp}_seed{k}" for spp in (4, 16, 64) for k in range(2)
    ]
    assert gt_dir.name == "ground_truth"
    for v in variant_dirs:
        assert re.fullmatch(r"spp\d+_seed\d+", v.name)
    noisiest = min(variant_dirs, key=_variant_spp_key)
    assert noisiest.name.startswith("spp4_")


def test_batch_render_command_construction(monkeypatch):
    """render_one builds the documented blender --background ... -- argv and
    the frame-dir name matches prepare-data's render-root contract."""
    calls = []
    monkeypatch.setattr(batch_render.subprocess, "call",
                        lambda cmd: calls.append(cmd) or 0)

    class A:
        gt_spp = 4096
        seeds = 2
        spp = [4, 16]

    rc = batch_render.render_one(
        "blender", Path("scenes/kitchen.blend"), 5, Path("/data/out"), A()
    )
    assert rc == 0 and len(calls) == 1
    cmd = calls[0]
    assert cmd[:2] == ["blender", "--background"]
    assert "--python" in cmd and "--" in cmd
    sep = cmd.index("--")
    script_args = render_passes.parse_args(cmd[sep + 1:])
    assert script_args.out == "/data/out/kitchen_f0005"
    assert script_args.frame == 5
    assert script_args.gt_spp == 4096 and script_args.spp == [4, 16]


def test_addon_importable_without_bpy():
    """The add-on file (C19's UI half) imports cleanly outside Blender and
    shares render_passes' pass table (single source of truth)."""
    import addon

    assert addon.bpy is None  # no Blender here
    assert addon.PASS_TOGGLES is render_passes.PASS_TOGGLES
    assert addon.bl_info["category"] == "Render"
