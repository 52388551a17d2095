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

blend_tiles is fully differentiable: a custom VJP pairs this forward with an
analytic backward kernel (_blend_bwd_kernel: forward re-walk stashing entry
transmittances, then a back-to-front suffix-accumulation pass). It is the
TPU training path (mapper/step.py) as well as the forward path for map
queries, densification and panoramas. The wrapper (raster_tiled.py) pads
per-tile lists to a SEG multiple, so any k_per_tile works.
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


def _blend_kernel(
    data_ref, u0_ref, v0_ref, accum_ref, logt_ref, entry_ref, n_channels: int
):
    """One tile: data_ref (1, K, N_ATTR); outputs accum (1, PX, 8),
    logt (1, 1, PX) and — only when entry_ref is given (the AD forward) —
    entry (1, n_seg, PX): each segment's entry log-transmittance, stashed so
    the backward kernel can skip its forward-re-walk pass. Forward-only
    consumers (map queries, panoramas, densification) omit the entry output
    entirely, saving its VMEM->HBM write per tile."""
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
        if entry_ref is not None:
            entry_ref[0, pl.ds(s, 1), :] = logt

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


def _prefix_scan_exclusive(x: jnp.ndarray) -> jnp.ndarray:
    inc = _prefix_scan_inclusive(x)
    return inc - x


def _suffix_scan_exclusive(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive suffix sum along axis 0: out[k] = sum_{j>k} x[j]
    (total - inclusive prefix; Mosaic has no `rev` lowering)."""
    total = jnp.sum(x, axis=0, keepdims=True)
    return total - _prefix_scan_inclusive(x)


def _blend_bwd_kernel(
    data_ref,  # (1, K, N_ATTR)
    u0_ref,  # (T,) SMEM
    v0_ref,
    g_accum_ref,  # (1, PX, 8)
    g_logt_ref,  # (1, 1, PX)
    entry_ref,  # (1, n_seg, PX) — entry log-transmittances stashed by the fwd
    d_data_ref,  # (1, K, N_ATTR) output
    *,
    n_channels: int,
):
    """Analytic backward of the tile blend.

    The forward kernel stashed each segment's entry log-transmittance
    (entry_ref), so this walks segments back-to-front in a single pass,
    carrying the suffix colour-dot accumulation

        B_k(p) = sum_{j>k} w_j(p) * (col_j . g_accum_p),

    giving  dL/dalpha_k(p) = T_k(p) s_k(p) - (B_k(p) + g_logt(p)) / (1-a_k)
    with s_k(p) = col_k . g_accum_p, then chains through
    alpha = clip(op*exp(power)) to the attribute gradients.
    """
    k = data_ref.shape[1]
    n_seg = k // SEG

    tile = pl.program_id(0)
    u0 = u0_ref[tile]
    v0 = v0_ref[tile]
    local = jax.lax.broadcasted_iota(jnp.int32, (1, PX), 1)
    px = (u0 + local % TILE).astype(jnp.float32)
    py = (v0 + local // TILE).astype(jnp.float32)

    g_accum = g_accum_ref[0]  # (PX, 8); padding channels carry zero cotangent
    g_logt = g_logt_ref[0]  # (1, PX)

    def seg_alpha(s):
        block = data_ref[0, pl.ds(s * SEG, SEG), :]
        mx = block[:, 0:1]
        my = block[:, 1:2]
        ca = block[:, 2:3]
        cb = block[:, 3:4]
        cc = block[:, 4:5]
        op = block[:, 5:6]
        dx = mx - px
        dy = my - py
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        raw = op * jnp.exp(power)
        alpha = jnp.minimum(raw, ALPHA_MAX)
        live = (power <= 0.0) & (alpha >= ALPHA_MIN)
        alpha = jnp.where(live, alpha, 0.0)
        unclipped = live & (raw < ALPHA_MAX)
        return block, alpha, unclipped, power, dx, dy, ca, cb, cc, op

    # reverse walk with suffix accumulation (entry logts come from the fwd)
    def p2_body(i, b_carry):
        s = n_seg - 1 - i
        logt_in = entry_ref[0, pl.ds(s, 1), :]

        def compute(b):
            block, alpha, unclipped, power, dx, dy, ca, cb, cc, op = seg_alpha(s)
            logs = jnp.log1p(-alpha)
            prefix = _prefix_scan_exclusive(logs)
            t_k = jnp.exp(logt_in + prefix)  # (SEG, PX)
            w = alpha * t_k
            colors = block[:, 6:14]  # (SEG, 8)
            s_k = jax.lax.dot_general(
                colors,
                g_accum,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (SEG, PX)
            ws = w * s_k
            b_k = b + _suffix_scan_exclusive(ws)  # (SEG, PX)
            one_minus = jnp.maximum(1.0 - alpha, 1.0 / 256.0)
            d_alpha = t_k * s_k - (b_k + g_logt) / one_minus
            d_alpha = jnp.where(alpha > 0.0, d_alpha, 0.0)

            d_col = jax.lax.dot_general(
                w,
                g_accum,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (SEG, 8)

            d_raw = jnp.where(unclipped, d_alpha, 0.0)
            d_power = d_raw * alpha  # alpha == raw where unclipped
            # mask power BEFORE exp: power > 0 rows would overflow to inf
            exp_power = jnp.exp(jnp.where(unclipped, power, 0.0))
            d_op = jnp.sum(d_raw * exp_power, axis=1, keepdims=True)
            d_ca = jnp.sum(d_power * (-0.5 * dx * dx), axis=1, keepdims=True)
            d_cb = jnp.sum(d_power * (-dx * dy), axis=1, keepdims=True)
            d_cc = jnp.sum(d_power * (-0.5 * dy * dy), axis=1, keepdims=True)
            d_mx = jnp.sum(d_power * (-(ca * dx + cb * dy)), axis=1, keepdims=True)
            d_my = jnp.sum(d_power * (-(cc * dy + cb * dx)), axis=1, keepdims=True)

            d_block = jnp.concatenate(
                [d_mx, d_my, d_ca, d_cb, d_cc, d_op, d_col], axis=1
            )  # (SEG, 14)
            d_block = jnp.pad(d_block, ((0, 0), (0, N_ATTR - 14)))
            d_data_ref[0, pl.ds(s * SEG, SEG), :] = d_block
            return b + jnp.sum(ws, axis=0, keepdims=True)

        def skip(b):
            d_data_ref[0, pl.ds(s * SEG, SEG), :] = jnp.zeros(
                (SEG, N_ATTR), jnp.float32
            )
            return b

        saturated = jnp.max(logt_in) < LOG_EPS
        return jax.lax.cond(saturated, skip, compute, b_carry)

    jax.lax.fori_loop(0, n_seg, p2_body, jnp.zeros((1, PX), jnp.float32))


@functools.partial(jax.jit, static_argnames=("n_channels", "interpret"))
def _blend_bwd_pallas(
    tile_data, tile_u0, tile_v0, entry, g_accum, g_logt, n_channels, interpret
):
    t, k, _ = tile_data.shape
    n_seg = k // SEG
    g_accum_pad = jnp.pad(g_accum, ((0, 0), (0, 0), (0, 8 - n_channels)))
    kernel = functools.partial(_blend_bwd_kernel, n_channels=n_channels)
    d_data = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, k, N_ATTR), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, PX, 8), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, PX), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n_seg, PX), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, k, N_ATTR), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, k, N_ATTR), jnp.float32),
        interpret=interpret,
    )(tile_data, tile_u0, tile_v0, g_accum_pad, g_logt[:, None, :], entry)
    return d_data


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def blend_tiles(tile_data, tile_u0, tile_v0, n_channels=5, interpret=False):
    """Differentiable fused tile blend (Pallas fwd + analytic Pallas bwd)."""
    accum, logt = _blend_fwd_pallas(
        tile_data, tile_u0, tile_v0, n_channels, interpret, with_entry=False
    )
    return accum, logt


def _blend_tiles_fwd(tile_data, tile_u0, tile_v0, n_channels, interpret):
    accum, logt, entry = _blend_fwd_pallas(
        tile_data, tile_u0, tile_v0, n_channels, interpret, with_entry=True
    )
    return (accum, logt), (tile_data, tile_u0, tile_v0, entry)


def _blend_tiles_bwd(n_channels, interpret, residuals, cotangents):
    tile_data, tile_u0, tile_v0, entry = residuals
    g_accum, g_logt = cotangents
    d_data = _blend_bwd_pallas(
        tile_data, tile_u0, tile_v0, entry, g_accum, g_logt, n_channels,
        interpret,
    )
    return d_data, None, None


blend_tiles.defvjp(_blend_tiles_fwd, _blend_tiles_bwd)


@functools.partial(
    jax.jit, static_argnames=("n_channels", "interpret", "with_entry")
)
def _blend_fwd_pallas(
    tile_data: jnp.ndarray,  # (T, K, N_ATTR) f32 gathered per-tile attributes
    tile_u0: jnp.ndarray,  # (T,) int32 tile origin x
    tile_v0: jnp.ndarray,  # (T,) int32
    n_channels: int = 5,
    interpret: bool = False,
    with_entry: bool = False,
):
    """Returns (accum (T, PX, n_channels), log_transmittance (T, PX)[,
    entry (T, n_seg, PX)]). The entry output — each segment's entry
    log-transmittance, the backward's residual — is only emitted for the AD
    forward; pallas_call outputs cannot be dead-code-eliminated, so
    forward-only renders use the two-output variant."""
    t, k, n_attr = tile_data.shape
    assert n_attr == N_ATTR and k % SEG == 0, (k, n_attr)
    n_seg = k // SEG

    out_specs = [
        pl.BlockSpec((1, PX, 8), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, 1, PX), lambda i: (i, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t, PX, 8), jnp.float32),
        jax.ShapeDtypeStruct((t, 1, PX), jnp.float32),
    ]
    if with_entry:
        kernel = functools.partial(_blend_kernel, n_channels=n_channels)
        out_specs.append(pl.BlockSpec((1, n_seg, PX), lambda i: (i, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((t, n_seg, PX), jnp.float32))
    else:
        def kernel(data_ref, u0_ref, v0_ref, accum_ref, logt_ref):
            _blend_kernel(
                data_ref, u0_ref, v0_ref, accum_ref, logt_ref, None,
                n_channels=n_channels,
            )
    out = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, k, N_ATTR), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(tile_data, tile_u0, tile_v0)
    if with_entry:
        accum, logt, entry = out
        return accum[:, :, :n_channels], logt[:, 0, :], entry
    accum, logt = out
    return accum[:, :, :n_channels], logt[:, 0, :]


def blend_tiles_pallas(tile_data, tile_u0, tile_v0, n_channels=5, interpret=False):
    """Forward-only fused tile blend: (accum, log_transmittance)."""
    return _blend_fwd_pallas(
        tile_data, tile_u0, tile_v0, n_channels, interpret, with_entry=False
    )


# --------------------------------------------------------------------------- #
# CSR (exact, uncapped) segmented blend
#
# The dense (T, K) layout above walks every tile's full K window each
# multi-pass round, so an exact render of a skewed membership distribution
# (end-of-episode topdown: median tile ~3k members, wall tiles ~56k) costs
# T x K x passes. The CSR layout walks each tile's ACTUAL list once: entries
# are the depth-sorted memberships of all tiles concatenated (each tile's run
# padded to a CSEG multiple so every segment belongs to exactly one tile),
# and the kernel streams segments in grid order, accumulating into the
# per-tile output block selected by a prefetched segment->tile map. Work is
# O(total memberships), the CUDA reference's duplicate-and-sort semantics
# (diff-gaussian-rasterization forward) on the MXU/VPU.
# --------------------------------------------------------------------------- #

CSEG = 256  # entries per CSR grid step (per-tile runs are CSEG-aligned)


def _blend_csr_kernel(seg_tile_ref, seg_u0_ref, seg_v0_ref, data_ref,
                      accum_ref, logt_ref, entry_ref=None):
    s = pl.program_id(0)
    tile = seg_tile_ref[s]
    prev_tile = seg_tile_ref[jnp.maximum(s - 1, 0)]
    first = (s == 0) | (tile != prev_tile)

    # consecutive segments of one tile revisit the same output block (the
    # index map repeats), so it stays resident in VMEM; on first visit the
    # fetched block holds garbage and must be zeroed
    @pl.when(first)
    def _init():
        accum_ref[0] = jnp.zeros((PX, 8), jnp.float32)
        logt_ref[0] = jnp.zeros((1, PX), jnp.float32)

    if entry_ref is not None:
        # AD forward: stash this segment's entry log-transmittance (the
        # backward's residual, same trick as the dense blend's entry_ref)
        entry_ref[0] = logt_ref[0]

    u0 = seg_u0_ref[s]
    v0 = seg_v0_ref[s]
    local = jax.lax.broadcasted_iota(jnp.int32, (1, PX), 1)
    px = (u0 + local % TILE).astype(jnp.float32)
    py = (v0 + local // TILE).astype(jnp.float32)

    logt = logt_ref[0]  # (1, PX)
    saturated = jnp.max(logt) < LOG_EPS

    @pl.when(jnp.logical_not(saturated))
    def _compute():
        block = data_ref[...]  # (CSEG, N_ATTR)
        mx = block[:, 0:1]
        my = block[:, 1:2]
        ca = block[:, 2:3]
        cb = block[:, 3:4]
        cc = block[:, 4:5]
        op = block[:, 5:6]
        dx = mx - px  # (CSEG, PX)
        dy = my - py
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(op * jnp.exp(power), ALPHA_MAX)
        alpha = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)
        logs = jnp.log1p(-alpha)
        cum = _prefix_scan_inclusive(logs)
        weight = alpha * jnp.exp(cum - logs + logt)  # (CSEG, PX)
        colors = block[:, 6:14]  # (CSEG, 8)
        contrib = jax.lax.dot_general(
            weight,
            colors,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (PX, 8)
        accum_ref[0] = accum_ref[0] + contrib
        logt_ref[0] = logt + cum[-1:, :]


@functools.partial(
    jax.jit,
    static_argnames=("n_tiles", "n_channels", "interpret", "with_entry"),
)
def _blend_csr_fwd_pallas(
    entry_data: jnp.ndarray,  # (E, N_ATTR) f32, E % CSEG == 0
    seg_tile: jnp.ndarray,  # (E // CSEG,) int32 in [0, n_tiles]; n_tiles = pad
    seg_u0: jnp.ndarray,  # (E // CSEG,) int32 tile origin x
    seg_v0: jnp.ndarray,
    n_tiles: int,
    n_channels: int = 5,
    interpret: bool = False,
    with_entry: bool = False,
):
    e_tot, n_attr = entry_data.shape
    assert n_attr == N_ATTR and e_tot % CSEG == 0, (e_tot, n_attr)
    n_seg = e_tot // CSEG

    out_specs = [
        pl.BlockSpec((1, PX, 8), lambda s, st, su, sv: (st[s], 0, 0)),
        pl.BlockSpec((1, 1, PX), lambda s, st, su, sv: (st[s], 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles + 1, PX, 8), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles + 1, 1, PX), jnp.float32),
    ]
    if with_entry:
        # per-segment entry log-transmittance (the backward's residual);
        # forward-only renders omit the output and its HBM write entirely
        out_specs.append(pl.BlockSpec((1, 1, PX), lambda s, st, su, sv: (s, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((n_seg, 1, PX), jnp.float32))
        kernel = _blend_csr_kernel
    else:
        def kernel(st, su, sv, data_ref, accum_ref, logt_ref):
            _blend_csr_kernel(st, su, sv, data_ref, accum_ref, logt_ref, None)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_seg,),
        in_specs=[
            pl.BlockSpec((CSEG, N_ATTR), lambda s, st, su, sv: (s, 0)),
        ],
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(seg_tile, seg_u0, seg_v0, entry_data)
    if with_entry:
        accum, logt, entry = out
        return accum[:n_tiles, :, :n_channels], logt[:n_tiles, 0, :], entry
    accum, logt = out
    return accum[:n_tiles, :, :n_channels], logt[:n_tiles, 0, :]


def blend_csr_pallas(
    entry_data: jnp.ndarray,
    seg_tile: jnp.ndarray,
    seg_u0: jnp.ndarray,
    seg_v0: jnp.ndarray,
    n_tiles: int,
    n_channels: int = 5,
    interpret: bool = False,
):
    """Forward-only exact blend over CSR tile runs. Segments of a tile must
    be consecutive and runs CSEG-aligned; segment n_tiles is the discard
    target for padding past the last run. Returns (accum (n_tiles, PX,
    n_channels), log_transmittance (n_tiles, PX)); blocks of tiles with no
    segments hold GARBAGE — callers mask with their per-tile counts."""
    return _blend_csr_fwd_pallas(
        entry_data, seg_tile, seg_u0, seg_v0, n_tiles, n_channels, interpret,
        with_entry=False,
    )


# Padding column of the entry attribute row carrying the per-entry band bit
# for the dual-transmittance blend (colors occupy 6:14; 15 stays zero).
BAND_COL = 14


def _blend_csr_dual_kernel(seg_tile_ref, seg_u0_ref, seg_v0_ref, data_ref,
                           accum_ref, logt_ref, logt2_ref):
    """CSR blend carrying TWO transmittances: the full composite and a
    band-masked one (entries whose BAND_COL bit is 0 contribute alpha 0 to
    the second). One walk serves both topdown maps — the whole-map
    "unobserved" render (accum + logt) and the height-sliced "free" render
    (logt2) — where the old path ran two full CSR expansions (reference
    visualizer.py:926-976 renders the pair per GaussianPacket). Zeroed
    alphas contribute exact +0.0 terms to the second prefix sum, so logt2
    is bitwise what a band-only walk would produce in the same entry order.
    """
    s = pl.program_id(0)
    tile = seg_tile_ref[s]
    prev_tile = seg_tile_ref[jnp.maximum(s - 1, 0)]
    first = (s == 0) | (tile != prev_tile)

    @pl.when(first)
    def _init():
        accum_ref[0] = jnp.zeros((PX, 8), jnp.float32)
        logt_ref[0] = jnp.zeros((1, PX), jnp.float32)
        logt2_ref[0] = jnp.zeros((1, PX), jnp.float32)

    u0 = seg_u0_ref[s]
    v0 = seg_v0_ref[s]
    local = jax.lax.broadcasted_iota(jnp.int32, (1, PX), 1)
    px = (u0 + local % TILE).astype(jnp.float32)
    py = (v0 + local // TILE).astype(jnp.float32)

    logt = logt_ref[0]  # (1, PX)
    logt2 = logt2_ref[0]
    # band alpha <= full alpha pointwise, so T_band >= T_full and band
    # saturation implies full saturation: one exit test covers both carries
    saturated = jnp.max(logt2) < LOG_EPS

    @pl.when(jnp.logical_not(saturated))
    def _compute():
        block = data_ref[...]  # (CSEG, N_ATTR)
        mx = block[:, 0:1]
        my = block[:, 1:2]
        ca = block[:, 2:3]
        cb = block[:, 3:4]
        cc = block[:, 4:5]
        op = block[:, 5:6]
        dx = mx - px  # (CSEG, PX)
        dy = my - py
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(op * jnp.exp(power), ALPHA_MAX)
        alpha = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)
        logs = jnp.log1p(-alpha)
        cum = _prefix_scan_inclusive(logs)
        weight = alpha * jnp.exp(cum - logs + logt)  # (CSEG, PX)
        colors = block[:, 6:14]  # (CSEG, 8)
        contrib = jax.lax.dot_general(
            weight,
            colors,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (PX, 8)
        band = block[:, BAND_COL : BAND_COL + 1]  # (CSEG, 1) 0/1
        cum2 = _prefix_scan_inclusive(jnp.log1p(-alpha * band))
        accum_ref[0] = accum_ref[0] + contrib
        logt_ref[0] = logt + cum[-1:, :]
        logt2_ref[0] = logt2 + cum2[-1:, :]


@functools.partial(
    jax.jit, static_argnames=("n_tiles", "n_channels", "interpret")
)
def blend_csr_dual_pallas(
    entry_data: jnp.ndarray,  # (E, N_ATTR) f32 with the band bit at BAND_COL
    seg_tile: jnp.ndarray,
    seg_u0: jnp.ndarray,
    seg_v0: jnp.ndarray,
    n_tiles: int,
    n_channels: int = 3,
    interpret: bool = False,
):
    """Forward-only dual-transmittance CSR blend. Same contract as
    blend_csr_pallas plus a second log-transmittance output composited over
    the band-masked alphas; blocks of tiles with no segments hold GARBAGE —
    callers mask with their per-tile counts."""
    e_tot, n_attr = entry_data.shape
    assert n_attr == N_ATTR and e_tot % CSEG == 0, (e_tot, n_attr)
    n_seg = e_tot // CSEG

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_seg,),
        in_specs=[
            pl.BlockSpec((CSEG, N_ATTR), lambda s, st, su, sv: (s, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, PX, 8), lambda s, st, su, sv: (st[s], 0, 0)),
            pl.BlockSpec((1, 1, PX), lambda s, st, su, sv: (st[s], 0, 0)),
            pl.BlockSpec((1, 1, PX), lambda s, st, su, sv: (st[s], 0, 0)),
        ],
    )
    accum, logt, logt2 = pl.pallas_call(
        _blend_csr_dual_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles + 1, PX, 8), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles + 1, 1, PX), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles + 1, 1, PX), jnp.float32),
        ],
        interpret=interpret,
    )(seg_tile, seg_u0, seg_v0, entry_data)
    return (
        accum[:n_tiles, :, :n_channels],
        logt[:n_tiles, 0, :],
        logt2[:n_tiles, 0, :],
    )


def _blend_csr_bwd_kernel(
    seg_tile_ref,  # (n_seg,) scalar-prefetch
    seg_u0_ref,
    seg_v0_ref,
    data_ref,  # (CSEG, N_ATTR) — segment s = n_seg-1-i (reverse grid order)
    g_accum_ref,  # (1, PX, 8) — cotangent block of this segment's tile
    g_logt_ref,  # (1, 1, PX)
    entry_ref,  # (1, 1, PX) — entry log-transmittance stashed by the forward
    d_data_ref,  # (CSEG, N_ATTR) output
    b_ref,  # VMEM scratch (1, PX): per-tile suffix colour-dot carry
    *,
    n_seg: int,
):
    """Analytic backward of the CSR blend: the dense _blend_bwd_kernel's
    back-to-front suffix walk, restructured over the CSR segment stream.
    The grid runs in REVERSE segment order; segments of one tile are
    consecutive, so the suffix carry B lives in a VMEM scratch that resets
    whenever the walk crosses into a new tile (i.e. at the tile's LAST
    segment, the first one visited in reverse order)."""
    i = pl.program_id(0)
    s = n_seg - 1 - i
    tile = seg_tile_ref[s]
    nxt = seg_tile_ref[jnp.minimum(s + 1, n_seg - 1)]
    last_of_tile = (i == 0) | (tile != nxt)

    @pl.when(last_of_tile)
    def _reset():
        b_ref[...] = jnp.zeros((1, PX), jnp.float32)

    u0 = seg_u0_ref[s]
    v0 = seg_v0_ref[s]
    local = jax.lax.broadcasted_iota(jnp.int32, (1, PX), 1)
    px = (u0 + local % TILE).astype(jnp.float32)
    py = (v0 + local // TILE).astype(jnp.float32)

    logt_in = entry_ref[0]  # (1, PX)
    saturated = jnp.max(logt_in) < LOG_EPS

    @pl.when(saturated)
    def _skip():
        d_data_ref[...] = jnp.zeros((CSEG, N_ATTR), jnp.float32)

    @pl.when(jnp.logical_not(saturated))
    def _compute():
        g_accum = g_accum_ref[0]  # (PX, 8); padding channels carry zeros
        g_logt = g_logt_ref[0]  # (1, PX)
        block = data_ref[...]  # (CSEG, N_ATTR)
        mx = block[:, 0:1]
        my = block[:, 1:2]
        ca = block[:, 2:3]
        cb = block[:, 3:4]
        cc = block[:, 4:5]
        op = block[:, 5:6]
        dx = mx - px
        dy = my - py
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        raw = op * jnp.exp(power)
        alpha = jnp.minimum(raw, ALPHA_MAX)
        live = (power <= 0.0) & (alpha >= ALPHA_MIN)
        alpha = jnp.where(live, alpha, 0.0)
        unclipped = live & (raw < ALPHA_MAX)

        logs = jnp.log1p(-alpha)
        prefix = _prefix_scan_exclusive(logs)
        t_k = jnp.exp(logt_in + prefix)  # (CSEG, PX)
        w = alpha * t_k
        colors = block[:, 6:14]  # (CSEG, 8)
        s_k = jax.lax.dot_general(
            colors,
            g_accum,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (CSEG, PX)
        ws = w * s_k
        b = b_ref[...]  # (1, PX)
        b_k = b + _suffix_scan_exclusive(ws)  # (CSEG, PX)
        one_minus = jnp.maximum(1.0 - alpha, 1.0 / 256.0)
        d_alpha = t_k * s_k - (b_k + g_logt) / one_minus
        d_alpha = jnp.where(alpha > 0.0, d_alpha, 0.0)

        d_col = jax.lax.dot_general(
            w,
            g_accum,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (CSEG, 8)

        d_raw = jnp.where(unclipped, d_alpha, 0.0)
        d_power = d_raw * alpha  # alpha == raw where unclipped
        # mask power BEFORE exp: power > 0 rows would overflow to inf
        exp_power = jnp.exp(jnp.where(unclipped, power, 0.0))
        d_op = jnp.sum(d_raw * exp_power, axis=1, keepdims=True)
        d_ca = jnp.sum(d_power * (-0.5 * dx * dx), axis=1, keepdims=True)
        d_cb = jnp.sum(d_power * (-dx * dy), axis=1, keepdims=True)
        d_cc = jnp.sum(d_power * (-0.5 * dy * dy), axis=1, keepdims=True)
        d_mx = jnp.sum(d_power * (-(ca * dx + cb * dy)), axis=1, keepdims=True)
        d_my = jnp.sum(d_power * (-(cc * dy + cb * dx)), axis=1, keepdims=True)

        d_block = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_op, d_col], axis=1
        )  # (CSEG, 14)
        d_data_ref[...] = jnp.pad(d_block, ((0, 0), (0, N_ATTR - 14)))
        b_ref[...] = b + jnp.sum(ws, axis=0, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("n_tiles", "n_channels", "interpret")
)
def _blend_csr_bwd_pallas(
    entry_data, seg_tile, seg_u0, seg_v0, entry, g_accum, g_logt,
    n_tiles, n_channels, interpret,
):
    e_tot, n_attr = entry_data.shape
    n_seg = e_tot // CSEG
    # +1 zero row: segments keyed to the padding tile n_tiles read it
    g_accum_pad = jnp.pad(
        g_accum, ((0, 1), (0, 0), (0, 8 - n_channels))
    )  # (n_tiles+1, PX, 8)
    g_logt_pad = jnp.pad(g_logt[:, None, :], ((0, 1), (0, 0), (0, 0)))

    rev = lambda i: n_seg - 1 - i  # noqa: E731 — reverse grid order
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_seg,),
        in_specs=[
            pl.BlockSpec((CSEG, N_ATTR), lambda i, st, su, sv: (rev(i), 0)),
            pl.BlockSpec((1, PX, 8), lambda i, st, su, sv: (st[rev(i)], 0, 0)),
            pl.BlockSpec((1, 1, PX), lambda i, st, su, sv: (st[rev(i)], 0, 0)),
            pl.BlockSpec((1, 1, PX), lambda i, st, su, sv: (rev(i), 0, 0)),
        ],
        out_specs=pl.BlockSpec((CSEG, N_ATTR), lambda i, st, su, sv: (rev(i), 0)),
        scratch_shapes=[pltpu.VMEM((1, PX), jnp.float32)],
    )
    d_data = pl.pallas_call(
        functools.partial(_blend_csr_bwd_kernel, n_seg=n_seg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e_tot, N_ATTR), jnp.float32),
        interpret=interpret,
    )(seg_tile, seg_u0, seg_v0, entry_data, g_accum_pad, g_logt_pad, entry)
    return d_data


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def blend_csr(entry_data, seg_tile, seg_u0, seg_v0, n_tiles, n_channels=5,
              interpret=False):
    """Differentiable exact CSR blend (Pallas fwd + analytic Pallas bwd).

    Same contract as blend_csr_pallas; additionally differentiable in
    entry_data (the gathered per-entry attribute rows) — the training path
    for exact (uncapped) compositing, eliminating k-truncation gradient
    bias (the CUDA reference's dynamic lists are likewise uncapped,
    reference splatam.py:208-212)."""
    return blend_csr_pallas(
        entry_data, seg_tile, seg_u0, seg_v0, n_tiles, n_channels, interpret
    )


def _blend_csr_vjp_fwd(entry_data, seg_tile, seg_u0, seg_v0, n_tiles,
                       n_channels, interpret):
    accum, logt, entry = _blend_csr_fwd_pallas(
        entry_data, seg_tile, seg_u0, seg_v0, n_tiles, n_channels, interpret,
        with_entry=True,
    )
    return (accum, logt), (entry_data, seg_tile, seg_u0, seg_v0, entry)


def _blend_csr_vjp_bwd(n_tiles, n_channels, interpret, residuals, cotangents):
    entry_data, seg_tile, seg_u0, seg_v0, entry = residuals
    g_accum, g_logt = cotangents
    d_data = _blend_csr_bwd_pallas(
        entry_data, seg_tile, seg_u0, seg_v0, entry, g_accum, g_logt,
        n_tiles, n_channels, interpret,
    )
    return d_data, None, None, None


blend_csr.defvjp(_blend_csr_vjp_fwd, _blend_csr_vjp_bwd)


# --------------------------------------------------------------------------- #
# Per-tile slot search (binning). The XLA bin (raster_tiled.bin_gaussians)
# materializes its per-slot intermediates in HBM: the (T, K, nb) block-scan
# compares, the (T, K, blk) gathered AABB rows and their bit cumsums — ~100 MB
# of traffic per bin at the benchmark size, the last stage above its
# primitive floor (CLAUDE.md iter breakdown). This kernel runs the whole
# slot walk VMEM-resident, one grid step per tile:
#   - the per-(tile, block) member-count cumsum arrives precomputed (it falls
#     out of the counting einsum for free) as one (nb, 1) column per tile;
#   - the k-th member's block is found by a flat (nb, K) compare (the XLA
#     path needs a 2/3-level hierarchy only because its compares are
#     HBM-sized; in VMEM flat is cheaper than the gathers a hierarchy costs);
#   - `prior` (members before the block) is a masked max — no gather;
#   - the block's AABB rows are fetched by ONE-HOT MXU MATMULS against four
#     bf16 byte planes (values <= 255, exact in bf16) kept VMEM-resident
#     across all grid steps — the gather never touches HBM;
#   - the in-block bit prefix is the blend kernel's sublane Hillis-Steele.
# Work per tile: O(K * nb) VPU compares + 4 tiny MXU matmuls, all on-chip.
# --------------------------------------------------------------------------- #


def _bin_slots_kernel(
    off_ref, cum_ref, planes_ref, idx_ref, *, tiles_x: int, blk: int, n: int
):
    # Column-oriented layout throughout: Mosaic only allows blocks whose last
    # two dims are (8k, 128k) or whole-array, so the per-tile cumsum arrives
    # as a (1, 1, nb) ROW block and every per-slot vector is a (kc, 1) COLUMN
    # (slots on sublanes) — reductions over nb/blk land on the lane axis and
    # nothing ever needs an in-kernel transpose. The in-block prefix scan is
    # an MXU matmul against a triangular ones matrix (exact: f32 accum of
    # 0/1 values).
    t = pl.program_id(0)
    kc_i = pl.program_id(1)  # slot-chunk index (bounds VMEM at large nb)
    ttx = (t % tiles_x).astype(jnp.float32)
    tty = (t // tiles_x).astype(jnp.float32)
    cum = cum_ref[0]  # (1, nb) int32: inclusive block cumsum of this tile
    nb = cum.shape[1]
    kc = idx_ref.shape[2]
    count_full = cum[0, nb - 1]

    ks = (
        off_ref[0]
        + kc_i * kc
        + jax.lax.broadcasted_iota(jnp.int32, (kc, 1), 0)
    )  # (kc, 1) global slot ids of this chunk
    cmp = cum <= ks  # (kc, nb): blocks fully before slot k
    blk_idx = jnp.sum(cmp.astype(jnp.int32), axis=1, keepdims=True)  # (kc, 1)
    blk_safe = jnp.minimum(blk_idx, nb - 1)
    prior = jnp.max(
        jnp.where(cmp, cum, 0), axis=1, keepdims=True
    )  # (kc, 1) members before the chosen block (cumsum is nondecreasing)

    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (kc, nb), 1) == blk_safe
    ).astype(jnp.bfloat16)  # (kc, nb)

    def fetch(plane):  # (kc, nb) bf16 x (blk, nb) bf16 -> (kc, blk) f32
        return jax.lax.dot_general(
            onehot,
            plane,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    bits = (
        (fetch(planes_ref[0]) <= ttx)
        & (ttx <= fetch(planes_ref[1]))
        & (fetch(planes_ref[2]) <= tty)
        & (tty <= fetch(planes_ref[3]))
    )  # (kc, blk) membership of the block's gaussians in this tile
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
    ).astype(jnp.bfloat16)
    local_cum = jax.lax.dot_general(  # (kc, blk) inclusive prefix over blk
        bits.astype(jnp.bfloat16),
        tri,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    needed = (ks - prior + 1).astype(jnp.float32)  # (kc, 1)
    pos = jnp.sum(
        (local_cum < needed).astype(jnp.int32), axis=1, keepdims=True
    )  # (kc, 1) position of the needed-th set bit
    idx = blk_safe * blk + pos
    idx_ref[0, 0] = jnp.where(ks < count_full, idx, n)


@functools.partial(
    jax.jit, static_argnames=("k", "tiles_x", "blk", "n", "interpret")
)
def bin_slots_pallas(
    slot_offset: jnp.ndarray,  # () or (1,) int32 window start
    cum_t: jnp.ndarray,  # (nb, T) int32 inclusive per-block member cumsums
    planes: jnp.ndarray,  # (4, blk, nb) bf16 [tx0, tx1, ty0, ty1] byte planes
    k: int,
    tiles_x: int,
    blk: int,
    n: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-tile depth-ordered member indices (T, K) — see block comment.

    Planes hold one AABB byte per SORTED gaussian in transposed block layout
    (plane[c, j, b] = byte c of gaussian b * blk + j); entries past the
    member count are the sentinel `n`. K must be a lane multiple (128).

    At large block counts the (nb, K) slot compares dominate VMEM, so K is
    split over a second grid dimension: each step searches a 128-slot chunk
    against the full block column (the chunks are independent — `ks` are
    global slot ids)."""
    nb, n_tiles = cum_t.shape
    assert planes.shape == (4, blk, nb), (planes.shape, blk, nb)
    assert k % 128 == 0, k
    off = jnp.asarray(slot_offset, jnp.int32).reshape(1)

    # bound the (kc, nb) int32 compare + (kc, nb) bf16 one-hot to ~2.5 MB
    kc = k
    while kc > 128 and nb * kc > 2048 * 256:
        kc //= 2
    n_chunks = k // kc

    # (T, 1, nb) row layout: Mosaic requires the last two BLOCK dims to be
    # (8k, 128k)-divisible or whole-array — a (nb, 1) column block of the
    # natural (nb, T) cumsum is illegal, a (1, 1, nb) row block is not.
    cum_rows = cum_t.T.reshape(n_tiles, 1, nb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, nb), lambda t, c, off: (t, 0, 0)),
            # constant index map: the byte planes stay VMEM-resident across
            # all grid steps instead of being re-fetched per tile
            pl.BlockSpec((4, blk, nb), lambda t, c, off: (0, 0, 0)),
        ],
        # 4-D so the per-step write is a legal whole-(kc, 1) block; slots of
        # chunk c are rows [c * kc, (c + 1) * kc), so the reshape below
        # restores the (T, K) slot order exactly
        out_specs=pl.BlockSpec((1, 1, kc, 1), lambda t, c, off: (t, c, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_bin_slots_kernel, tiles_x=tiles_x, blk=blk, n=n),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, n_chunks, kc, 1), jnp.int32),
        interpret=interpret,
    )(off, cum_rows, planes)
    return out.reshape(n_tiles, k)
