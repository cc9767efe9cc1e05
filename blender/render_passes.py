"""Headless Cycles render script: one frame -> per-pass EXR directories
(the data-generation layer; upstream: the Blender/ add-on + batch scripts —
SURVEY.md C19, call stack §3.4).

Runs INSIDE Blender:

    blender --background scene.blend --python blender/render_passes.py -- \
        --out /data/renders/frame0001 \
        --gt-spp 4096 --spp 4 16 64 --seeds 2 \
        --frame 1

Produces the disk contract prepare-data consumes (data/prepare.py):

    <out>/ground_truth/<Pass>.exr       rendered at --gt-spp
    <out>/spp<N>_seed<K>/<Pass>.exr     one dir per (spp, seed)

Pass files use Cycles naming (DiffDir.exr, GlossCol.exr, ...) which the
ingest layer maps to canonical names (data/exr.py CYCLES_NAME_MAP).

NOTE: this environment has no Blender, so this script is shipped as a
documented, reviewed-but-not-executed tool (SURVEY.md §7 "never block CI
on real renders"); tests cover everything downstream of the EXR contract
via the synthetic generator instead.
"""

import argparse
import sys
from pathlib import Path

try:
    import bpy  # type: ignore
except ImportError:  # running outside Blender
    bpy = None

# (view-layer attribute, Cycles render-pass name in the EXR layer)
PASS_TOGGLES = [
    ("use_pass_combined", "Combined"),
    ("use_pass_diffuse_direct", "DiffDir"),
    ("use_pass_diffuse_indirect", "DiffInd"),
    ("use_pass_diffuse_color", "DiffCol"),
    ("use_pass_glossy_direct", "GlossDir"),
    ("use_pass_glossy_indirect", "GlossInd"),
    ("use_pass_glossy_color", "GlossCol"),
    ("use_pass_subsurface_direct", "SubsurfaceDir"),
    ("use_pass_subsurface_indirect", "SubsurfaceInd"),
    ("use_pass_subsurface_color", "SubsurfaceCol"),
    ("use_pass_transmission_direct", "TransDir"),
    ("use_pass_transmission_indirect", "TransInd"),
    ("use_pass_transmission_color", "TransCol"),
    ("use_pass_emit", "Emit"),
    ("use_pass_environment", "Env"),
    ("use_pass_normal", "Normal"),
    ("use_pass_z", "Depth"),
]


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True, help="frame output directory")
    p.add_argument("--gt-spp", type=int, default=4096)
    p.add_argument("--spp", type=int, nargs="+", default=[4, 16, 64])
    p.add_argument("--seeds", type=int, default=2)
    p.add_argument("--frame", type=int, default=None)
    p.add_argument("--res-x", type=int, default=None)
    p.add_argument("--res-y", type=int, default=None)
    return p.parse_args(argv)


def configure_cycles(scene):
    scene.render.engine = "CYCLES"
    scene.cycles.use_denoising = False  # raw noisy output IS the point
    scene.cycles.use_adaptive_sampling = False
    vl = scene.view_layers[0]
    for attr, _name in PASS_TOGGLES:
        if hasattr(vl, attr):
            setattr(vl, attr, True)
    scene.render.image_settings.file_format = "OPEN_EXR_MULTILAYER"
    scene.render.image_settings.color_depth = "32"
    scene.render.image_settings.exr_codec = "ZIP"
    scene.render.film_transparent = True  # alpha pass carries coverage


def render_variant(scene, out_dir: Path, spp: int, seed: int):
    out_dir.mkdir(parents=True, exist_ok=True)
    scene.cycles.samples = spp
    scene.cycles.seed = seed
    # One multilayer EXR per variant; the ingest layer reads it directly
    # (exr.load_multilayer_exr) or split it with tools/split_multilayer.py.
    scene.render.filepath = str(out_dir / "frame.exr")
    bpy.ops.render.render(write_still=True)


def main():
    if bpy is None:
        print(__doc__)
        print("ERROR: must run inside Blender (bpy not importable)",
              file=sys.stderr)
        return 1
    argv = sys.argv[sys.argv.index("--") + 1 :] if "--" in sys.argv else []
    args = parse_args(argv)
    scene = bpy.context.scene
    if args.frame is not None:
        scene.frame_set(args.frame)
    if args.res_x:
        scene.render.resolution_x = args.res_x
    if args.res_y:
        scene.render.resolution_y = args.res_y
    configure_cycles(scene)

    out = Path(args.out)
    render_variant(scene, out / "ground_truth", args.gt_spp, seed=0)
    for spp in args.spp:
        for k in range(args.seeds):
            render_variant(scene, out / f"spp{spp}_seed{k}", spp, seed=1000 + k)
    return 0


if __name__ == "__main__":
    sys.exit(main())
