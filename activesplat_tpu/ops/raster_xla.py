"""Chunked differentiable alpha-compositing rasterizer in pure XLA.

TPU-native replacement for the CUDA tile rasterizer's blend stage. Instead of
per-tile depth-sorted lists walked by scalar threads (a GPU pattern), the TPU
formulation is dense and vectorized:

  * Gaussians are globally depth-sorted once (XLA sort).
  * A `lax.scan` walks the sorted set in fixed-size chunks; for each chunk the
    (chunk, pixels) opacity matrix is computed on the VPU and composited with
    the running per-pixel transmittance carried in log space:

        T_g = exp( sum_{h<g} log(1 - alpha_h) )

    The within-chunk exclusive prefix is a cumsum; the chunk's color
    contribution is one (pixels, chunk) x (chunk, channels) matmul on the MXU.

This exactly reproduces sequential front-to-back blending (the log-space
prefix-sum is associative), so results match the reference renderer semantics
(silhouette trick included: any per-Gaussian quantity — z, z*z, rgb — is just
another color channel, fusing the reference's two rasterizer passes
(splatam.py:208-212) into one).

`jax.checkpoint` on the chunk body keeps backward memory at
O(num_chunks * pixels) instead of O(gaussians * pixels).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

ALPHA_MIN = 1.0 / 255.0  # per-pixel contribution cutoff (CUDA rasterizer parity)
ALPHA_MAX = 0.99  # max per-Gaussian alpha (CUDA rasterizer parity)


def _chunk_alpha(
    mean2d: jnp.ndarray,  # (G, 2)
    conic: jnp.ndarray,  # (G, 3)
    opacity: jnp.ndarray,  # (G,)
    valid: jnp.ndarray,  # (G,) bool
    px: jnp.ndarray,  # (P,)
    py: jnp.ndarray,  # (P,)
) -> jnp.ndarray:
    """Per-(gaussian, pixel) alpha for one chunk: (G, P)."""
    dx = mean2d[:, 0:1] - px[None, :]  # (G, P)
    dy = mean2d[:, 1:2] - py[None, :]
    a, b, c = conic[:, 0:1], conic[:, 1:2], conic[:, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = opacity[:, None] * jnp.exp(power)
    alpha = jnp.minimum(alpha, ALPHA_MAX)
    keep = (power <= 0.0) & (alpha >= ALPHA_MIN) & valid[:, None]
    return jnp.where(keep, alpha, 0.0)


def _blend_chunk(carry, chunk, px, py):
    accum, log_t = carry
    mean2d, conic, opacity, colors, valid = chunk
    alpha = _chunk_alpha(mean2d, conic, opacity, valid, px, py)  # (G, P)
    logs = jnp.log1p(-alpha)
    cum = jnp.cumsum(logs, axis=0)
    excl = cum - logs  # exclusive prefix within chunk
    weight = alpha * jnp.exp(excl + log_t[None, :])  # (G, P)
    acc_t = jnp.promote_types(colors.dtype, jnp.float32)
    accum = accum + jnp.dot(
        weight.T,
        colors,
        preferred_element_type=acc_t,
        precision=jax.lax.Precision.HIGHEST,
    )  # (P, C)
    log_t = log_t + cum[-1]
    return (accum, log_t), None


@functools.partial(jax.jit, static_argnames=("width", "height", "chunk"))
def rasterize_sorted(
    mean2d: jnp.ndarray,  # (N, 2) depth-ascending order
    conic: jnp.ndarray,  # (N, 3)
    opacity: jnp.ndarray,  # (N,)
    colors: jnp.ndarray,  # (N, C) channels to composite
    valid: jnp.ndarray,  # (N,) bool
    *,
    width: int,
    height: int,
    chunk: int = 128,
    row_offset=0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Front-to-back alpha compositing over pre-sorted Gaussians.

    `row_offset` renders rows [row_offset, row_offset + height) of a larger
    frame (used by the row-sharded multi-chip render).

    Returns (accum (H*W, C), log_transmittance (H*W,)).
    """
    n = mean2d.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n

    def pad0(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    mean2d, conic, opacity, colors = map(pad0, (mean2d, conic, opacity, colors))
    valid = jnp.pad(valid, (0, pad))

    def chunked(x):
        return x.reshape((n_chunks, chunk) + x.shape[1:])

    chunks = tuple(map(chunked, (mean2d, conic, opacity, colors, valid)))

    p = width * height
    dtype = colors.dtype
    px = (jnp.arange(p, dtype=dtype) % width)
    py = jnp.floor(jnp.arange(p, dtype=dtype) / width) + jnp.asarray(
        row_offset, dtype
    )

    n_channels = colors.shape[-1]
    init = (
        jnp.zeros((p, n_channels), dtype),
        jnp.zeros((p,), dtype),
    )
    body = jax.checkpoint(functools.partial(_blend_chunk, px=px, py=py))
    (accum, log_t), _ = jax.lax.scan(body, init, chunks)
    return accum, log_t


def depth_sort(depth: jnp.ndarray, valid: jnp.ndarray, *arrays):
    """Sort per-Gaussian arrays by camera depth, invalid entries last.

    The returned ordering is treated as a constant by autodiff (matching the
    CUDA rasterizer, which sorts by a detached key).
    """
    key = jnp.where(valid, depth, jnp.inf)
    order = jnp.argsort(key)
    return tuple(x[order] for x in ((depth, valid) + arrays))
