"""Image save/preview helpers (upstream: TensorFlow/Utilities.py — SURVEY.md
C17): tone-mapped LDR previews of HDR radiance for logs and debugging."""

from __future__ import annotations

from pathlib import Path
import numpy as np


def tonemap_srgb(hdr: np.ndarray, exposure: float = 1.0) -> np.ndarray:
    """HDR radiance -> sRGB-encoded [0,1] LDR (Reinhard + gamma 1/2.2)."""
    x = np.maximum(np.asarray(hdr, dtype=np.float32) * exposure, 0.0)
    x = x / (1.0 + x)
    return np.clip(x, 0.0, 1.0) ** (1.0 / 2.2)


def save_preview_png(
    path: str | Path, hdr: np.ndarray, exposure: float = 1.0
) -> None:
    """Write a tone-mapped 8-bit PNG preview of an HDR (H, W, 3) buffer."""
    from PIL import Image

    ldr = (tonemap_srgb(hdr, exposure) * 255.0 + 0.5).astype(np.uint8)
    if ldr.ndim == 3 and ldr.shape[-1] == 1:
        ldr = ldr[..., 0]
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(ldr).save(str(path))


def side_by_side(*imgs: np.ndarray, pad: int = 4) -> np.ndarray:
    """Horizontally concatenate equal-height images with a white gutter
    (noisy | denoised | ground-truth comparison strips)."""
    imgs = [np.asarray(i) for i in imgs]
    h = imgs[0].shape[0]
    assert all(i.shape[0] == h for i in imgs)
    c = imgs[0].shape[-1] if imgs[0].ndim == 3 else 1
    gutter = np.ones((h, pad, c), dtype=imgs[0].dtype)
    parts = []
    for i, img in enumerate(imgs):
        if img.ndim == 2:
            img = img[..., None]
        if i:
            parts.append(gutter)
        parts.append(img)
    return np.concatenate(parts, axis=1)


def save_png(path: str | Path, ldr01: np.ndarray) -> None:
    """Write an ALREADY tone-mapped [0,1] (H, W, C) buffer as 8-bit PNG
    (save_preview_png tonemaps; this one does not)."""
    from PIL import Image

    arr = (np.clip(np.asarray(ldr01, dtype=np.float32), 0.0, 1.0) * 255.0 + 0.5).astype(
        np.uint8
    )
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr).save(str(path))
