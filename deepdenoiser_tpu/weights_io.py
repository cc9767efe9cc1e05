"""Release-weight IO: compact fp16 npz weight files shipped in `weights/`.

The release format (written by tools/export_release_weights.py) is a flat
npz of '/'-joined param paths in float16 — ~4x smaller than an orbax
training checkpoint (no optimizer state, half precision), small enough to
version in git. This module lives in the package so the public CLI
(`deepdenoiser denoise/eval --weights weights/foo.npz`) can load shipped
weights without a training workdir (upstream analogue: distributing a
frozen checkpoint next to the inference script — SURVEY.md C16/C20).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten(v, p))
        else:
            out[p] = np.asarray(v)
    return out


def unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    root: Dict[str, Any] = {}
    for path, arr in flat.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return root


def load_release_params(path) -> Dict[str, Any]:
    """npz -> {'params': ...} pytree (float32)."""
    with np.load(path) as z:
        flat = {k: z[k].astype(np.float32) for k in z.files}
    return unflatten(flat)


def save_release_params(path, params, dtype=np.float16) -> None:
    """Params pytree -> compact flat npz (see module docstring)."""
    flat = {k: v.astype(dtype) for k, v in flatten(params).items()}
    np.savez_compressed(path, **flat)
