"""Geometric augmentation applied identically to every pass of an example
(upstream: TensorFlow/DataAugmentation.py — SURVEY.md C8): random H/V flips
and 90° rotations — the dihedral group D4.

Correctness detail the reference glosses over: screen-space NORMALS are
vectors, not colors. A horizontal flip negates the x component, a vertical
flip negates y, and a 90° rotation rotates (x, y). Applying D4 to normal
maps without the vector fixup teaches the network wrong geometry cues.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

from deepdenoiser_tpu import passes


def d4_params(rng: np.random.Generator) -> Tuple[int, bool]:
    """(k rotations by 90°, horizontal flip?) — uniform over the 8 elements."""
    return int(rng.integers(0, 4)), bool(rng.integers(0, 2))


def apply_d4(arr: np.ndarray, k: int, flip: bool, is_normal: bool) -> np.ndarray:
    """Apply rot90^k then optional horizontal flip to an HWC array.

    For normal passes the (x, y) vector components are transformed with the
    same isometry: rot90 (CCW, image coords) maps (x, y) -> (y, -x); an
    horizontal flip negates x.
    """
    out = arr
    for _ in range(k % 4):
        out = np.rot90(out, 1, axes=(0, 1))
        if is_normal:
            x, y = out[..., 0].copy(), out[..., 1].copy()
            out = out.copy()
            out[..., 0], out[..., 1] = y, -x
    if flip:
        out = out[:, ::-1]
        if is_normal:
            out = out.copy()
            out[..., 0] = -out[..., 0]
    return np.ascontiguousarray(out)


def augment_example(
    example: Mapping[str, np.ndarray], rng: np.random.Generator
) -> Dict[str, np.ndarray]:
    """One random D4 element applied to every '<role>/<pass>' array."""
    k, flip = d4_params(rng)
    out = {}
    for key, arr in example.items():
        pass_name = key.split("/")[1]
        is_normal = passes.get(pass_name).kind is passes.PassKind.NORMAL
        out[key] = apply_d4(arr, k, flip, is_normal)
    return out
