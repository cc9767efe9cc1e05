"""Pure-JAX image quality metrics: PSNR, SSIM, MS-SSIM (SURVEY.md N6).

Standard definitions (Wang et al. 2004 SSIM with 11x11 Gaussian window,
sigma 1.5, k1=.01, k2=.03; MS-SSIM with the canonical 5-scale weights) so
numbers are comparable with the TF reference's summaries and with skimage.
All convs are depthwise NHWC at HIGHEST precision — metrics must not round
through bf16.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def mse(a: Array, b: Array, axes: Optional[Tuple[int, ...]] = None) -> Array:
    d = (a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2
    return d.mean() if axes is None else d.mean(axis=axes)


def psnr(pred: Array, target: Array, data_range: float = 1.0) -> Array:
    """Peak signal-to-noise ratio in dB over the whole array."""
    m = mse(pred, target)
    return 10.0 * jnp.log10((data_range**2) / jnp.maximum(m, 1e-12))


def psnr_per_image(pred: Array, target: Array, data_range: float = 1.0) -> Array:
    """PSNR per batch element for NHWC inputs."""
    m = mse(pred, target, axes=(1, 2, 3))
    return 10.0 * jnp.log10((data_range**2) / jnp.maximum(m, 1e-12))


@functools.lru_cache(maxsize=8)
def _gaussian_kernel(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _filter2d(x: Array, kernel: np.ndarray) -> Array:
    """Depthwise VALID Gaussian filter, NHWC — SEPARABLE (two 1-D passes).

    The window is an outer product g⊗g, so two 1-D depthwise convs compute
    it exactly with k+k taps instead of k² (11+11 vs 121). Depthwise convs
    run on the TPU VPU, not the MXU, so this is a ~5.5x cut in the SSIM
    hot path — at 4K the 2-D form costs tens of ms per filtered moment."""
    c = x.shape[-1]
    g = np.asarray(kernel[:, 0], dtype=np.float32).reshape(-1)
    g = g / g.sum()  # exact 1-D factor of the outer-product window
    kh = jnp.asarray(g)[:, None, None, None] * jnp.ones((1, 1, 1, c), jnp.float32)
    kw = jnp.asarray(g)[None, :, None, None] * jnp.ones((1, 1, 1, c), jnp.float32)
    kwargs = dict(
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    y = jax.lax.conv_general_dilated(x, kh, **kwargs)
    return jax.lax.conv_general_dilated(y, kw, **kwargs)


def ssim(
    pred: Array,
    target: Array,
    data_range: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    return_map: bool = False,
) -> Array:
    """SSIM for NHWC batches (mean over pixels/channels per image)."""
    assert pred.ndim == 4 and target.ndim == 4, "NHWC expected"
    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    w = _gaussian_kernel(window_size, sigma)

    mu_x = _filter2d(x, w)
    mu_y = _filter2d(y, w)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x2 = _filter2d(x * x, w) - mu_x2
    sigma_y2 = _filter2d(y * y, w) - mu_y2
    sigma_xy = _filter2d(x * y, w) - mu_xy

    lum = (2 * mu_xy + c1) / (mu_x2 + mu_y2 + c1)
    cs = (2 * sigma_xy + c2) / (sigma_x2 + sigma_y2 + c2)
    ssim_map = lum * cs
    if return_map:
        return ssim_map
    return ssim_map.mean(axis=(1, 2, 3))


def _ssim_and_cs(x: Array, y: Array, data_range: float, window_size: int, sigma: float):
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    w = _gaussian_kernel(window_size, sigma)
    mu_x, mu_y = _filter2d(x, w), _filter2d(y, w)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x2 = _filter2d(x * x, w) - mu_x2
    sigma_y2 = _filter2d(y * y, w) - mu_y2
    sigma_xy = _filter2d(x * y, w) - mu_xy
    lum = (2 * mu_xy + c1) / (mu_x2 + mu_y2 + c1)
    cs = (2 * sigma_xy + c2) / (sigma_x2 + sigma_y2 + c2)
    return (lum * cs).mean(axis=(1, 2, 3)), cs.mean(axis=(1, 2, 3))


MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ms_ssim(
    pred: Array,
    target: Array,
    data_range: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
    n_scales: int = 5,
) -> Array:
    """Multi-scale SSIM per image. Inputs must be >= window * 2^(n_scales-1)."""
    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    weights = jnp.asarray(MSSSIM_WEIGHTS[:n_scales])
    weights = weights / weights.sum()

    vals = []
    for s in range(n_scales):
        s_val, cs_val = _ssim_and_cs(x, y, data_range, window_size, sigma)
        vals.append(s_val if s == n_scales - 1 else cs_val)
        if s < n_scales - 1:
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
            y = jax.lax.reduce_window(
                y, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
    stacked = jnp.stack(vals, axis=0)  # (scales, N)
    return jnp.prod(jnp.maximum(stacked, 1e-6) ** weights[:, None], axis=0)


def tonemap_for_metrics(x: Array) -> Array:
    """HDR -> [0,1] mapping used when reporting PSNR/SSIM on radiance:
    simple Reinhard x/(1+x) (monotone, range-safe)."""
    x = jnp.maximum(x.astype(jnp.float32), 0.0)
    return x / (1.0 + x)
