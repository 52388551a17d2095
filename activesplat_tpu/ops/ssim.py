"""SSIM for the mapping RGB loss.

Behavioral equivalent of the reference's windowed SSIM
(src/mapper/splatam/utils/slam_external.py:66-97): 11x11 Gaussian window,
sigma 1.5, zero ('same') padding, uniform dynamic-range constants
C1=0.01^2, C2=0.03^2. Implemented as separable depthwise convolutions, which
XLA maps onto the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_C1 = 0.01**2
_C2 = 0.03**2


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur_conv(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Separable blur via lax.conv (NCHW depthwise), 'same' zero padding."""
    h, w, c = img.shape
    k = window.shape[0]
    x = img.transpose(2, 0, 1)[:, None]  # (C, 1, H, W)
    krow = window.reshape(1, 1, k, 1)
    kcol = window.reshape(1, 1, 1, k)
    x = jax.lax.conv_general_dilated(
        x, jnp.asarray(krow), (1, 1), [(k // 2, k // 2), (0, 0)],
        precision=jax.lax.Precision.HIGHEST,
    )
    x = jax.lax.conv_general_dilated(
        x, jnp.asarray(kcol), (1, 1), [(0, 0), (k // 2, k // 2)],
        precision=jax.lax.Precision.HIGHEST,
    )
    return x[:, 0].transpose(1, 2, 0)


def ssim(
    img_a: jnp.ndarray,
    img_b: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over (H, W, C) images in [0, 1]."""
    window = jnp.asarray(_gaussian_window(window_size, sigma))
    mu_a = _blur_conv(img_a, window)
    mu_b = _blur_conv(img_b, window)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    sigma_aa = _blur_conv(img_a * img_a, window) - mu_aa
    sigma_bb = _blur_conv(img_b * img_b, window) - mu_bb
    sigma_ab = _blur_conv(img_a * img_b, window) - mu_ab
    score = ((2 * mu_ab + _C1) * (2 * sigma_ab + _C2)) / (
        (mu_aa + mu_bb + _C1) * (sigma_aa + sigma_bb + _C2)
    )
    return jnp.mean(score)


def _blur_conv_valid(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Separable blur, VALID padding: output (H-k+1, W-k+1, C)."""
    h, w, c = img.shape
    k = window.shape[0]
    x = img.transpose(2, 0, 1)[:, None]  # (C, 1, H, W)
    krow = window.reshape(1, 1, k, 1)
    kcol = window.reshape(1, 1, 1, k)
    x = jax.lax.conv_general_dilated(
        x, jnp.asarray(krow), (1, 1), [(0, 0), (0, 0)],
        precision=jax.lax.Precision.HIGHEST,
    )
    x = jax.lax.conv_general_dilated(
        x, jnp.asarray(kcol), (1, 1), [(0, 0), (0, 0)],
        precision=jax.lax.Precision.HIGHEST,
    )
    return x[:, 0].transpose(1, 2, 0)


def ssim_cs(
    img_a: jnp.ndarray,
    img_b: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel (SSIM, contrast-structure) means over (H, W, C) images with
    VALID windowing — pytorch_msssim's `_ssim` semantics (no padding; the
    cs term is what MS-SSIM uses at intermediate pyramid levels). Returns two
    (C,) arrays."""
    window = jnp.asarray(_gaussian_window(window_size, sigma))
    mu_a = _blur_conv_valid(img_a, window)
    mu_b = _blur_conv_valid(img_b, window)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    sigma_aa = _blur_conv_valid(img_a * img_a, window) - mu_aa
    sigma_bb = _blur_conv_valid(img_b * img_b, window) - mu_bb
    sigma_ab = _blur_conv_valid(img_a * img_b, window) - mu_ab
    cs_map = (2 * sigma_ab + _C2) / (sigma_aa + sigma_bb + _C2)
    ssim_map = ((2 * mu_ab + _C1) / (mu_aa + mu_bb + _C1)) * cs_map
    return jnp.mean(ssim_map, axis=(0, 1)), jnp.mean(cs_map, axis=(0, 1))


def psnr(img_a: jnp.ndarray, img_b: jnp.ndarray) -> jnp.ndarray:
    """PSNR in dB for images in [0, 1] (reference: calc_psnr,
    slam_external.py:49-51)."""
    mse = jnp.mean((img_a - img_b) ** 2)
    return -10.0 * jnp.log10(mse + 1e-12)
