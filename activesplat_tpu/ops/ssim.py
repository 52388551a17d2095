"""SSIM for the mapping RGB loss.

Behavioral equivalent of the reference's windowed SSIM
(src/mapper/splatam/utils/slam_external.py:66-97): 11x11 Gaussian window,
sigma 1.5, zero ('same') padding, uniform dynamic-range constants
C1=0.01^2, C2=0.03^2. The separable 11-tap blurs are implemented as
banded-Toeplitz MATMULS (row blur = B_h @ X, column blur = X @ B_w^T) so they
run on the MXU — 1-channel depthwise convolutions lower to vector ops and
cost ~2.4 ms/step at 256px, the matmul form is ~10x cheaper.
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


@functools.lru_cache(maxsize=16)
def _toeplitz_band(n: int, window_size: int, sigma: float, valid: bool):
    """(n_out, n) banded blur matrix: row i holds the window centered at i
    ('same' zero padding) or at i+k//2 (VALID)."""
    win = _gaussian_window(window_size, sigma)
    k = window_size
    if valid:
        m = np.zeros((n - k + 1, n), np.float32)
        for i in range(n - k + 1):
            m[i, i : i + k] = win
    else:
        m = np.zeros((n, n), np.float32)
        for i in range(n):
            lo = max(0, i - k // 2)
            hi = min(n, i + k // 2 + 1)
            m[i, lo:hi] = win[lo - (i - k // 2) : hi - (i - k // 2)]
    return m


def _blur_matmul(img: jnp.ndarray, window_size: int, sigma: float,
                 valid: bool) -> jnp.ndarray:
    """Separable blur as two banded-Toeplitz matmuls.

    A depthwise conv with 1 channel is the worst possible TPU conv shape
    (no MXU tiling — measured 2.4 ms for SSIM's blurs at 256px); the same
    contraction as (H_out,H)x(H,W*C) and (W,W_out) matmuls runs on the MXU
    in tens of microseconds. precision=HIGHEST: the default here quantizes
    f32 matmul inputs to bf16 (CLAUDE.md)."""
    h, w, c = img.shape
    kh = jnp.asarray(_toeplitz_band(h, window_size, sigma, valid))
    kw = jnp.asarray(_toeplitz_band(w, window_size, sigma, valid))
    x = jnp.tensordot(kh, img, axes=((1,), (0,)),
                      precision=jax.lax.Precision.HIGHEST)  # (H_out, W, C)
    x = jnp.einsum("hwc,vw->hvc", x, kw,
                   precision=jax.lax.Precision.HIGHEST)  # (H_out, W_out, C)
    return x




def ssim(
    img_a: jnp.ndarray,
    img_b: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over (H, W, C) images in [0, 1].

    The five blurred maps (a, b, a*a, b*b, a*b) are stacked and blurred by
    ONE pair of banded-Toeplitz matmuls (_blur_matmul) — the blurs were ~1/5
    of the whole mapping-loss step as depthwise convs."""
    stacked = jnp.concatenate(
        [img_a, img_b, img_a * img_a, img_b * img_b, img_a * img_b], axis=-1
    )  # (H, W, 5C)
    blurred = _blur_matmul(stacked, window_size, sigma, valid=False)
    c = img_a.shape[-1]
    mu_a, mu_b, b_aa, b_bb, b_ab = (
        blurred[..., i * c : (i + 1) * c] for i in range(5)
    )
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    sigma_aa = b_aa - mu_aa
    sigma_bb = b_bb - mu_bb
    sigma_ab = b_ab - mu_ab
    score = ((2 * mu_ab + _C1) * (2 * sigma_ab + _C2)) / (
        (mu_aa + mu_bb + _C1) * (sigma_aa + sigma_bb + _C2)
    )
    return jnp.mean(score)


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
    stacked = jnp.concatenate(
        [img_a, img_b, img_a * img_a, img_b * img_b, img_a * img_b], axis=-1
    )
    blurred = _blur_matmul(stacked, window_size, sigma, valid=True)
    c = img_a.shape[-1]
    mu_a, mu_b, b_aa, b_bb, b_ab = (
        blurred[..., i * c : (i + 1) * c] for i in range(5)
    )
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    sigma_aa = b_aa - mu_aa
    sigma_bb = b_bb - mu_bb
    sigma_ab = b_ab - mu_ab
    cs_map = (2 * sigma_ab + _C2) / (sigma_aa + sigma_bb + _C2)
    ssim_map = ((2 * mu_ab + _C1) / (mu_aa + mu_bb + _C1)) * cs_map
    return jnp.mean(ssim_map, axis=(0, 1)), jnp.mean(cs_map, axis=(0, 1))


def psnr(img_a: jnp.ndarray, img_b: jnp.ndarray) -> jnp.ndarray:
    """PSNR in dB for images in [0, 1] (reference: calc_psnr,
    slam_external.py:49-51)."""
    mse = jnp.mean((img_a - img_b) ** 2)
    return -10.0 * jnp.log10(mse + 1e-12)
