"""DeepDenoiser TPU — Blender add-on (UI half of the data generator).

The reference shipped a Blender add-on with a panel for queueing training
renders (upstream: the Blender/ add-on — SURVEY.md C19 "UI panel for batch
setup"); this is its rebuild. The headless path (render_passes.py /
batch_render.py) stays the source of truth for the disk contract; the
add-on just drives the same configuration interactively:

  * a panel under Render Properties ("DeepDenoiser Data") with the output
    root, ground-truth spp, noisy spp list, and seed count;
  * an operator that enables the full Cycles pass set (same PASS_TOGGLES
    table as render_passes.py) and renders ground_truth/ + spp<N>_seed<K>/
    multilayer EXRs for the current frame.

Install: Edit > Preferences > Add-ons > Install… > select this file.
Cannot run or be tested in this repo's environment (no Blender —
SURVEY.md §7 "never block CI on real renders"); the shared naming/pass
contract is covered bpy-free by tests/test_blender_contract.py via
render_passes.py.
"""

bl_info = {
    "name": "DeepDenoiser TPU training data",
    "description": "Render multi-pass EXR training data for the denoiser",
    "author": "deepdenoiser-tpu",
    "version": (0, 2, 0),
    "blender": (3, 0, 0),
    "location": "Properties > Render > DeepDenoiser Data",
    "category": "Render",
}

from pathlib import Path

try:
    import bpy
except ImportError:  # importable outside Blender for contract tests
    bpy = None

# Single source of truth for the pass set lives in render_passes.py; the
# add-on reuses it when installed next to the script, else falls back to a
# copy kept in sync by tests/test_blender_contract.py.
try:
    from render_passes import PASS_TOGGLES, configure_cycles, render_variant
except ImportError:
    PASS_TOGGLES = configure_cycles = render_variant = None


if bpy is not None:

    class DDTPSettings(bpy.types.PropertyGroup):
        out_root: bpy.props.StringProperty(
            name="Output root", subtype="DIR_PATH", default="//renders"
        )
        gt_spp: bpy.props.IntProperty(name="Ground-truth spp", default=4096, min=1)
        spp_list: bpy.props.StringProperty(
            name="Noisy spp", default="4,16,64",
            description="Comma-separated sample counts for noisy variants",
        )
        seeds: bpy.props.IntProperty(name="Seeds per spp", default=2, min=1)

    class DDTP_OT_render_frame(bpy.types.Operator):
        """Render the current frame's training set (GT + noisy variants)"""

        bl_idname = "ddtp.render_frame"
        bl_label = "Render training set (current frame)"

        def execute(self, context):
            if configure_cycles is None:
                self.report(
                    {"ERROR"},
                    "render_passes.py not importable — install the add-on "
                    "from the blender/ directory of the repo",
                )
                return {"CANCELLED"}
            scene = context.scene
            s = scene.ddtp
            try:
                spps = [int(x) for x in s.spp_list.replace(" ", "").split(",") if x]
            except ValueError:
                self.report({"ERROR"}, f"bad spp list {s.spp_list!r}")
                return {"CANCELLED"}
            out = Path(bpy.path.abspath(s.out_root)) / (
                f"{Path(bpy.data.filepath).stem or 'scene'}_f{scene.frame_current:04d}"
            )
            configure_cycles(scene)
            render_variant(scene, out / "ground_truth", s.gt_spp, seed=0)
            for spp in spps:
                for k in range(s.seeds):
                    render_variant(scene, out / f"spp{spp}_seed{k}", spp,
                                   seed=1000 + k)
            self.report({"INFO"}, f"wrote training set under {out}")
            return {"FINISHED"}

    class DDTP_PT_panel(bpy.types.Panel):
        bl_label = "DeepDenoiser Data"
        bl_space_type = "PROPERTIES"
        bl_region_type = "WINDOW"
        bl_context = "render"

        def draw(self, context):
            s = context.scene.ddtp
            col = self.layout.column()
            col.prop(s, "out_root")
            col.prop(s, "gt_spp")
            col.prop(s, "spp_list")
            col.prop(s, "seeds")
            col.operator(DDTP_OT_render_frame.bl_idname, icon="RENDER_STILL")

    _CLASSES = (DDTPSettings, DDTP_OT_render_frame, DDTP_PT_panel)

    def register():
        for c in _CLASSES:
            bpy.utils.register_class(c)
        bpy.types.Scene.ddtp = bpy.props.PointerProperty(type=DDTPSettings)

    def unregister():
        del bpy.types.Scene.ddtp
        for c in reversed(_CLASSES):
            bpy.utils.unregister_class(c)

    if __name__ == "__main__":
        register()
