"""Split Blender multilayer EXRs into per-pass EXR files in place.

    python tools/split_multilayer.py renders/frame0001/spp4_seed0/frame.exr ...

Optional — the ingest layer reads multilayer files directly
(data/exr.py load_frame_dir falls back to load_multilayer_exr); splitting
is useful for inspection or partial-pass workflows.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from deepdenoiser_tpu.data import exr


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    for arg in sys.argv[1:]:
        path = Path(arg)
        passes_dict = exr.load_multilayer_exr(path)
        exr.save_frame_dir(path.parent, passes_dict, cycles_names=True)
        print(f"{path}: split {len(passes_dict)} passes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
