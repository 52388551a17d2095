"""Pallas TPU kernel: fused per-tile front-to-back alpha compositing.

The XLA tile blend (raster_tiled.py) materializes (T, K, px) intermediates in
HBM — alpha, prefix logs, weights — making it bandwidth-bound. This kernel
keeps the whole per-tile pipeline in VMEM and adds what XLA cannot express:
*early termination* — once every pixel of a tile is saturated
(transmittance < 1/255), remaining depth segments are skipped.

Layout: one grid step per 16x16 tile; the tile's K gathered Gaussians arrive
as a (K, 16) attribute block [mx, my, a, b, c, opacity, col0..col4, pad...];
alpha for a segment is a (SEG, 256) VPU array (256 px = 2x128 lanes); the
in-segment prefix product uses a log-space Hillis-Steele scan over sublanes;
the color accumulation is a (px, SEG) x (SEG, C) MXU matmul.

Used for forward-only renders (map queries, densification, panoramas).
Training keeps the XLA blend (autodiff); an analytic backward kernel is the
natural next step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from activesplat_tpu.ops.raster_xla import ALPHA_MAX, ALPHA_MIN

TILE = 16
PX = TILE * TILE  # 256 pixels per tile
SEG = 64  # gaussians per in-kernel segment
N_ATTR = 16  # padded attribute count
LOG_EPS = -5.55  # log(1/256): tile saturated below this transmittance


def _prefix_scan_inclusive(x: jnp.ndarray) -> jnp.ndarray:
    """Hillis-Steele inclusive prefix sum along axis 0 (static SEG rows)."""
    n = x.shape[0]
    d = 1
    while d < n:
        shifted = jnp.pad(x, ((d, 0), (0, 0)))[:-d]
        x = x + shifted
        d *= 2
    return x


def _blend_kernel(data_ref, u0_ref, v0_ref, accum_ref, logt_ref, n_channels: int):
    """One tile: data_ref (1, K, N_ATTR); outputs accum (1, PX, 8),
    logt (1, 1, PX)."""
    k = data_ref.shape[1]
    n_seg = k // SEG

    tile = pl.program_id(0)
    u0 = u0_ref[tile]
    v0 = v0_ref[tile]
    local = jax.lax.broadcasted_iota(jnp.int32, (1, PX), 1)
    px = (u0 + local % TILE).astype(jnp.float32)  # (1, PX)
    py = (v0 + local // TILE).astype(jnp.float32)

    def seg_body(s, carry):
        accum, logt = carry  # (PX, 8), (1, PX)

        def compute(_):
            block = data_ref[0, pl.ds(s * SEG, SEG), :]  # (SEG, N_ATTR)
            mx = block[:, 0:1]
            my = block[:, 1:2]
            ca = block[:, 2:3]
            cb = block[:, 3:4]
            cc = block[:, 4:5]
            op = block[:, 5:6]
            dx = mx - px  # (SEG, PX)
            dy = my - py
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            alpha = jnp.minimum(op * jnp.exp(power), ALPHA_MAX)
            alpha = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)
            logs = jnp.log1p(-alpha)
            cum = _prefix_scan_inclusive(logs)
            weight = alpha * jnp.exp(cum - logs + logt)  # (SEG, PX)
            colors = block[:, 6 : 6 + 8]  # (SEG, 8): channels + zero padding
            contrib = jax.lax.dot_general(
                weight,
                colors,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (PX, 8)
            return accum + contrib, logt + cum[-1:, :]

        saturated = jnp.max(logt) < LOG_EPS
        return jax.lax.cond(saturated, lambda _: (accum, logt), compute, None)

    accum0 = jnp.zeros((PX, 8), jnp.float32)
    logt0 = jnp.zeros((1, PX), jnp.float32)
    accum, logt = jax.lax.fori_loop(0, n_seg, seg_body, (accum0, logt0))
    accum_ref[0, :, :] = accum
    logt_ref[0, :, :] = logt


@functools.partial(jax.jit, static_argnames=("n_channels", "interpret"))
def blend_tiles_pallas(
    tile_data: jnp.ndarray,  # (T, K, N_ATTR) f32 gathered per-tile attributes
    tile_u0: jnp.ndarray,  # (T,) int32 tile origin x
    tile_v0: jnp.ndarray,  # (T,) int32
    n_channels: int = 5,
    interpret: bool = False,
):
    """Returns (accum (T, PX, n_channels), log_transmittance (T, PX))."""
    t, k, n_attr = tile_data.shape
    assert n_attr == N_ATTR and k % SEG == 0, (k, n_attr)

    kernel = functools.partial(_blend_kernel, n_channels=n_channels)
    accum, logt = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, k, N_ATTR), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, PX, 8), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, PX), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, PX, 8), jnp.float32),
            jax.ShapeDtypeStruct((t, 1, PX), jnp.float32),
        ],
        interpret=interpret,
    )(tile_data, tile_u0, tile_v0)
    return accum[:, :, :n_channels], logt[:, 0, :]
