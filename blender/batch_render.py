"""Host-side batch driver: render many scenes/frames headlessly
(the batch half of the reference's Blender tooling — SURVEY.md C19).

    python blender/batch_render.py --blender /usr/bin/blender \
        --scenes scenes/*.blend --out /data/renders \
        --frames 1 5 10 --spp 4 16 --gt-spp 4096 --seeds 2

Each (scene, frame) becomes one frame directory under --out, named
<scene-stem>_f<frame>, matching data/prepare.py's render-root contract.
Renders run sequentially by default; --jobs N runs N Blender processes in
parallel (each render is internally multi-threaded already).
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import subprocess
import sys
from pathlib import Path


def render_one(blender: str, scene: Path, frame: int, out_root: Path, args) -> int:
    out = out_root / f"{scene.stem}_f{frame:04d}"
    cmd = [
        blender, "--background", str(scene), "--python",
        str(Path(__file__).parent / "render_passes.py"), "--",
        "--out", str(out), "--frame", str(frame),
        "--gt-spp", str(args.gt_spp), "--seeds", str(args.seeds),
        "--spp", *map(str, args.spp),
    ]
    print("+", " ".join(cmd), flush=True)
    return subprocess.call(cmd)


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--blender", default="blender")
    p.add_argument("--scenes", nargs="+", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--frames", type=int, nargs="+", default=[1])
    p.add_argument("--gt-spp", type=int, default=4096)
    p.add_argument("--spp", type=int, nargs="+", default=[4, 16, 64])
    p.add_argument("--seeds", type=int, default=2)
    p.add_argument("--jobs", type=int, default=1)
    args = p.parse_args()

    jobs = [
        (Path(s), f) for s in args.scenes for f in args.frames
    ]
    out_root = Path(args.out)
    out_root.mkdir(parents=True, exist_ok=True)
    failures = 0
    with cf.ThreadPoolExecutor(max_workers=args.jobs) as ex:
        futs = [
            ex.submit(render_one, args.blender, s, f, out_root, args)
            for s, f in jobs
        ]
        for fut in cf.as_completed(futs):
            failures += fut.result() != 0
    print(f"done: {len(jobs) - failures}/{len(jobs)} renders succeeded")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
