"""Tile-binned rasterizer: the production render path.

The dense chunked rasterizer (raster_xla.py) evaluates every Gaussian against
every pixel — O(N * P). Real scenes are sparse: a splat touches a handful of
16x16 tiles. This module implements the TPU-shaped equivalent of the CUDA
rasterizer's tile binning WITHOUT dynamic lists:

  1. project + depth-sort globally (one multi-operand XLA sort per frame,
     binning attributes packed into two extra operands);
  2. build fixed-capacity per-tile index lists (T, K) by counting-sort over
     the depth order: per-block member counts come from batched MXU matmuls
     of the separable tile-interval indicators, a hierarchical block-count
     scan locates the block holding each slot, and the block's membership
     bits are recomputed from byte-packed screen AABBs — no (T, N) matrix,
     no scatters. The K *nearest* (depth-sorted) members are kept; farther
     ones are occluded and dropped (counted, so callers can raise K);
  3. gather per-tile parameters and run the same log-space front-to-back
     blend per tile, vmapped over tiles — identical math to raster_xla, but
     each tile only sees its own K Gaussians.

Work drops from N*P to T*K*tile_px. Everything stays dense/static-shaped,
fully differentiable (the backward of the gather is a scatter-add).

Tile size 16x16 = 256 px keeps the pixel dimension a multiple of the VPU
lane width after the (K, px) reshape.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from activesplat_tpu.ops.raster_xla import ALPHA_MAX, ALPHA_MIN

TILE = 16

# Pallas bin-slots kernel opt-in (until Mosaic lowering is validated on
# hardware). Read ONCE at import: bin_gaussians is traced inside jitted
# graphs whose cache keys don't include env state, so a mid-process toggle
# would silently keep stale traces — set before process start.
import os as _os

_BIN_KERNEL = _os.environ.get("ACTIVESPLAT_BIN_KERNEL", "0") == "1"


def tile_aabbs(
    mx: jnp.ndarray,
    my: jnp.ndarray,
    radius: jnp.ndarray,
    valid: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
):
    """Per-Gaussian tile-grid AABBs with the off-grid cull.

    Shared by the k-capped binning (bin_gaussians) and the CSR exact
    expansion (rasterize_tiled_exact) so the membership predicate cannot
    diverge between the two paths. A Gaussian whose AABB misses the grid
    entirely must not clamp into a border tile as a phantom member: it would
    waste a k slot / an entry and inflate the dropped counter. Matters
    doubly under shard_map, where each device sees the whole Gaussian set
    but only its own row block. Returns (valid, tx0, tx1, ty0, ty1) with the
    bounds as floats (integral values; callers cast as needed)."""
    inside = (
        (mx + radius >= 0.0)
        & (mx - radius < tiles_x * TILE)
        & (my + radius >= 0.0)
        & (my - radius < tiles_y * TILE)
    )
    valid = valid & inside
    tx0 = jnp.clip(jnp.floor((mx - radius) / TILE), 0, tiles_x - 1)
    tx1 = jnp.clip(jnp.floor((mx + radius) / TILE), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor((my - radius) / TILE), 0, tiles_y - 1)
    ty1 = jnp.clip(jnp.floor((my + radius) / TILE), 0, tiles_y - 1)
    return valid, tx0, tx1, ty0, ty1


class TileLists(NamedTuple):
    indices: jnp.ndarray  # (T, K) int32 — Gaussian ids, depth-ascending; N = invalid
    count: jnp.ndarray  # (T,) int32 — number of valid entries per tile
    overflow: jnp.ndarray  # (T,) int32 — per-tile memberships dropped by the K cap


def bin_gaussians(
    mean2d: jnp.ndarray,  # (N, 2) DEPTH-SORTED order
    radius: jnp.ndarray,  # (N,)
    valid: jnp.ndarray,  # (N,)
    width: int,
    height: int,
    k_per_tile: int,
    slot_offset=0,
    backend: str = "xla",
    use_kernel=None,  # None -> the module-level _BIN_KERNEL import default
) -> TileLists:
    """Fixed-capacity per-tile lists from Gaussian screen AABBs.

    `slot_offset` (dynamic scalar) selects the members at list positions
    [offset, offset + k) of each tile instead of the first k — the window a
    multi-pass blend walks (rasterize_tiled_exact): pass p reads offset p*k.

    backend="pallas" runs the slot walk in a VMEM-resident kernel
    (raster_pallas.bin_slots_pallas) when its static preconditions hold
    (K a lane multiple, block count within VMEM); the counting einsum and
    the XLA hierarchy remain the fallback and the parity oracle.
    """
    n = mean2d.shape[0]
    tiles_x = -(-width // TILE)
    tiles_y = -(-height // TILE)
    t = tiles_x * tiles_y

    valid, tx0, tx1, ty0, ty1 = tile_aabbs(
        mean2d[:, 0], mean2d[:, 1], radius, valid, tiles_x, tiles_y
    )

    # Counting-sort by hierarchical dense compaction, WITHOUT materializing
    # the (T, N) membership matrix (whose construction dominated whole-map
    # binning: 322M elements for a 360px topdown at N = 1M). Entry k of tile
    # t is the index of the (k+1)-th member of row t. Three dense stages, no
    # scatters (serialized on TPU), no searchsorted (lowers to a while loop):
    #   counts:  per-(tile, 128-block) member counts as batched MXU matmuls
    #            over the separable (N, tiles_y) x (N, tiles_x) interval
    #            indicators — O(N*(tx+ty)) construction instead of O(N*T),
    #            and counts <= 128 are exact in bf16;
    #   scan:    block-count cumsums locate the block holding entry k; the
    #            per-(tile, slot) compare work is linear in the top-level
    #            block count, so the hierarchy depth adapts to N — two levels
    #            up to 512 blocks (N <= 64k), three levels (32-block
    #            superblocks) beyond (a flat scan at N = 1M is ~20x the work);
    #   bits:    the chosen block's membership bits are recomputed on the fly
    #            from ONE gathered int32 of byte-packed tile AABBs per
    #            gaussian — 4x less gather traffic than four interval rows.
    blk = 128
    n_pad = -(-n // blk) * blk
    pad = n_pad - n
    tile_col = jnp.arange(tiles_x, dtype=jnp.float32)
    tile_row = jnp.arange(tiles_y, dtype=jnp.float32)
    in_x = (
        (tile_col[None, :] >= tx0[:, None])
        & (tile_col[None, :] <= tx1[:, None])
        & valid[:, None]
    )
    in_y = (tile_row[None, :] >= ty0[:, None]) & (tile_row[None, :] <= ty1[:, None])
    if pad:
        in_x = jnp.pad(in_x, ((0, pad), (0, 0)))
        in_y = jnp.pad(in_y, ((0, pad), (0, 0)))
    nb = n_pad // blk
    counts_yx = jnp.einsum(
        "nky,nkx->nyx",
        in_y.reshape(nb, blk, tiles_y).astype(jnp.int8),
        in_x.reshape(nb, blk, tiles_x).astype(jnp.int8),
        preferred_element_type=jnp.int32,
    )  # (nb, ty, tx) exact integer counts (int8 MXU runs at 2x bf16 rate)

    if (
        backend == "pallas"
        and k_per_tile % 128 == 0
        # VMEM gate: the resident byte planes (8 * n_pad bytes) plus the
        # K-chunked slot compares must fit on-chip (<= 4 MB + ~3 MB)
        and nb <= 4096
        and (_BIN_KERNEL if use_kernel is None else use_kernel)
    ):
        from activesplat_tpu.ops.raster_pallas import bin_slots_pallas

        # the (nb, T) cumsum layout falls out of the einsum for free
        cum_t = jnp.cumsum(counts_yx.reshape(nb, t), axis=0)
        count_full = cum_t[-1]

        def plane(a, pad_value):
            p = jnp.where(valid, a, pad_value)
            if pad:
                p = jnp.pad(p, (0, pad), constant_values=pad_value)
            # transposed block layout (blk, nb): gaussian b*blk + j at [j, b]
            return p.reshape(nb, blk).T.astype(jnp.bfloat16)

        planes = jnp.stack(
            [
                plane(tx0, 255.0),  # invalid/pad -> empty interval 255 > 0
                plane(tx1, 0.0),
                plane(ty0, 255.0),
                plane(ty1, 0.0),
            ]
        )
        indices = bin_slots_pallas(
            slot_offset, cum_t, planes, k_per_tile, tiles_x, blk, n,
            interpret=jax.default_backend() != "tpu",
        )
        in_window = jnp.clip(count_full - jnp.int32(slot_offset), 0, k_per_tile)
        overflow = jnp.maximum(
            count_full - jnp.int32(slot_offset) - k_per_tile, 0
        )
        return TileLists(indices=indices, count=in_window, overflow=overflow)

    block_counts = counts_yx.reshape(nb, t).T  # (T, nb)

    # byte-packed per-gaussian AABB (tile grids are <= 256 wide: 4096 px)
    packed_aabb = (
        (jnp.where(valid, tx0, 255.0).astype(jnp.int32) << 24)
        | (tx1.astype(jnp.int32) << 16)
        | (ty0.astype(jnp.int32) << 8)
        | ty1.astype(jnp.int32)
    )  # invalid -> tx0 = 255 > tx1: empty interval
    if pad:
        packed_aabb = jnp.pad(
            packed_aabb, (0, pad), constant_values=np.int32(np.uint32(255 << 24))
        )
    aabb_blocks = packed_aabb.reshape(1, nb, blk)
    ks = jnp.arange(k_per_tile, dtype=jnp.int32) + jnp.int32(
        slot_offset
    )  # 0-based slot ids of this window

    if nb <= 512:
        # two levels: block scan -> in-block bit scan
        block_cum = jnp.cumsum(block_counts, axis=1)  # inclusive (T, nb)
        count_full = block_cum[:, -1]
        # block holding the (k+1)-th member: #blocks with cum count <= k
        blk_idx = jnp.sum(
            block_cum[:, None, :] <= ks[None, :, None], axis=2, dtype=jnp.int32
        )  # (T, K), == nb when k >= count
        blk_idx_safe = jnp.minimum(blk_idx, nb - 1)
        prior = jnp.where(
            blk_idx_safe > 0,
            jnp.take_along_axis(
                block_cum, jnp.maximum(blk_idx_safe - 1, 0), axis=1
            ),
            0,
        )  # members before the block (T, K)
    else:
        # three levels: superblock scan -> 32-entry sub-block row -> bits
        subs = 32
        nb_pad = -(-nb // subs) * subs
        if nb_pad != nb:
            block_counts = jnp.pad(block_counts, ((0, 0), (0, nb_pad - nb)))
        nb0 = nb_pad // subs
        sub_cum = jnp.cumsum(
            block_counts.reshape(t, nb0, subs), axis=2
        )  # (T, nb0, subs) inclusive within superblock
        sup_cum = jnp.cumsum(sub_cum[:, :, -1], axis=1)  # (T, nb0) inclusive
        count_full = sup_cum[:, -1]
        sup_idx = jnp.sum(
            sup_cum[:, None, :] <= ks[None, :, None], axis=2, dtype=jnp.int32
        )  # (T, K)
        sup_safe = jnp.minimum(sup_idx, nb0 - 1)
        prior0 = jnp.where(
            sup_safe > 0,
            jnp.take_along_axis(sup_cum, jnp.maximum(sup_safe - 1, 0), axis=1),
            0,
        )  # members before the superblock (T, K)
        sub_row = jnp.take_along_axis(
            sub_cum, sup_safe[:, :, None], axis=1
        )  # (T, K, subs)
        need1 = (ks[None, :] - prior0 + 1)[:, :, None]
        sub_idx = jnp.sum(sub_row < need1, axis=2, dtype=jnp.int32)  # (T, K)
        sub_safe = jnp.minimum(sub_idx, subs - 1)
        prior = prior0 + jnp.where(
            sub_safe > 0,
            jnp.take_along_axis(
                sub_row, jnp.maximum(sub_safe - 1, 0)[:, :, None], axis=2
            )[:, :, 0],
            0,
        )  # members before the 128-block (T, K)
        blk_idx_safe = jnp.minimum(sup_safe * subs + sub_safe, nb - 1)

    rows = jnp.take_along_axis(
        aabb_blocks, blk_idx_safe[:, :, None], axis=1
    )  # (T, K, blk) — one packed-AABB int32 per gaussian of the chosen block
    tile_tx = (jnp.arange(t, dtype=jnp.int32) % tiles_x)[:, None, None]
    tile_ty = (jnp.arange(t, dtype=jnp.int32) // tiles_x)[:, None, None]
    bits = (
        ((rows >> 24) & 0xFF) <= tile_tx
    ) & (tile_tx <= ((rows >> 16) & 0xFF)) & (
        ((rows >> 8) & 0xFF) <= tile_ty
    ) & (tile_ty <= (rows & 0xFF))
    local_cum = jnp.cumsum(bits.astype(jnp.int32), axis=2)
    needed = (ks[None, :] - prior + 1)[:, :, None]  # (T, K, 1)
    pos = jnp.sum(local_cum < needed, axis=2, dtype=jnp.int32)  # (T, K)
    indices = blk_idx_safe * blk + pos
    indices = jnp.where(ks[None, :] < count_full[:, None], indices, n).astype(
        jnp.int32
    )
    in_window = jnp.clip(count_full - jnp.int32(slot_offset), 0, k_per_tile)
    overflow = jnp.maximum(count_full - jnp.int32(slot_offset) - k_per_tile, 0)
    return TileLists(indices=indices, count=in_window, overflow=overflow)


def _blend_tile(
    ids: jnp.ndarray,  # (K,) into sorted arrays; == N means empty
    mean2d: jnp.ndarray,  # (N+1, 2) sorted + one padding row
    conic: jnp.ndarray,
    opacity: jnp.ndarray,
    colors: jnp.ndarray,
    px: jnp.ndarray,  # (TILE*TILE,) this tile's pixel x coords
    py: jnp.ndarray,
):
    m = mean2d[ids]  # (K, 2)
    c = conic[ids]
    op = opacity[ids]
    col = colors[ids]  # (K, C)

    dx = m[:, 0:1] - px[None, :]
    dy = m[:, 1:2] - py[None, :]
    power = -0.5 * (c[:, 0:1] * dx * dx + c[:, 2:3] * dy * dy) - c[:, 1:2] * dx * dy
    alpha = jnp.minimum(op[:, None] * jnp.exp(power), ALPHA_MAX)
    alpha = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)

    logs = jnp.log1p(-alpha)
    cum = jnp.cumsum(logs, axis=0)
    weight = alpha * jnp.exp(cum - logs)  # (K, px)
    accum = jnp.dot(
        weight.T,
        col,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (px, C)
    return accum, cum[-1]


def _prefix_buckets(n: int, smallest: int = 4096) -> Tuple[int, ...]:
    """Static prefix sizes for the visible-count dispatch (x4 steps)."""
    buckets = []
    b = smallest
    while b < n:
        buckets.append(b)
        b *= 4
    buckets.append(n)
    return tuple(buckets)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "k_per_tile", "backend", "max_passes"),
)
def rasterize_tiled(
    mean2d: jnp.ndarray,  # (N, 2) UNSORTED (projection order)
    conic: jnp.ndarray,
    opacity: jnp.ndarray,
    colors: jnp.ndarray,  # (N, C)
    valid: jnp.ndarray,
    radius: jnp.ndarray,
    depth: jnp.ndarray,  # (N,)
    *,
    width: int,
    height: int,
    k_per_tile: int = 256,
    backend: str = "xla",
    max_passes: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Tile-binned front-to-back compositing.

    Memory-traffic-shaped for TPU: the ONLY full-capacity gather is a single
    packed stop-gradient (N, 4) [mean_x, mean_y, radius, valid] used for
    binning (indices carry no gradient, so its transpose scatter-add is
    eliminated); the blend gathers per-tile rows directly from the UNSORTED
    differentiable arrays through composed indices (order[tile_list]).
    Depth-sorting the full per-Gaussian payload — and scatter-adding its
    gradient back — would dominate the whole iteration otherwise.

    Visible Gaussians form a prefix of the sorted order, so a `lax.switch`
    over static prefix buckets (x4 steps) scales cost with the visible count
    rather than buffer capacity.

    backend="pallas" runs the blend in the fused Pallas kernel
    (ops/raster_pallas.py: everything VMEM-resident + early termination on
    tile saturation). It is fully differentiable — blend_tiles carries an
    analytic custom VJP — and is the TPU training path (mapper/step.py);
    "xla" is the pure-XLA blend used off-TPU and as the parity oracle.

    Returns (accum (H*W, C), log_transmittance (H*W,), dropped ()).
    `dropped` counts HARMFUL truncations: memberships cut by the k cap in
    tiles that did not saturate (some pixel's end-of-list transmittance
    > 2%). Drops behind a fully opaque tile change nothing — neither the
    image, the gradients (zero blend weight), nor the silhouette channel
    that gates densification — and a converged dense map overflows
    saturated tiles everywhere, so counting them would drive the mapper's
    k escalation (mapper/splatam.py) to the ceiling for no benefit.

    max_passes > 1 composites EXACTLY like the uncapped CUDA reference:
    farther k-windows of each tile list fold in (associative front-to-back)
    until every tile saturates or exhausts — FORWARD-ONLY (lax.while_loop);
    use it for densify silhouettes, planner queries and eval, never for the
    gradient path.
    """
    n = mean2d.shape[0]
    key = jnp.where(valid, depth, jnp.inf)
    data = jnp.concatenate(
        [mean2d, conic, opacity[:, None], colors], -1
    )  # (N, 6 + C)
    return _rasterize_tiled_data(
        data,
        key,
        radius,
        valid,
        width=width,
        height=height,
        k_per_tile=k_per_tile,
        backend=backend,
        max_passes=max_passes,
    )


def _sort_pack(
    data: jnp.ndarray,  # (N, 6 + C): [mean2d, conic, opacity, channels]
    key: jnp.ndarray,  # (N,) depth sort key, +inf where invalid
    radius: jnp.ndarray,
    valid: jnp.ndarray,
):
    """Depth sort with packed binning attributes.

    One multi-operand sort carries the binning attributes with the keys —
    ~3x cheaper than argsort + a row gather (random-access row gathers are
    slow on TPU). Sort cost scales with operand count, so the four binning
    attributes ride in two operands: mean2d as two 16-bit fixed-point
    (1/8 px) halves of one int32, and (radius, valid) sign-packed in one
    f32. Binning only needs a conservative screen AABB, so the quantization
    is absorbed by inflating the radius by the 1/8-px rounding bound —
    extra marginal tile members blend at zero alpha (< ALPHA_MIN cut).

    Returns (packed (N, 4) [mx, my, radius, valid>0], order (N,) int32
    sorted -> original index map)."""
    n = data.shape[0]
    sg = jax.lax.stop_gradient
    # 1/8 px fixed point spans +/-4096 px in int16 — the same limit as the
    # byte-packed tile AABBs (256 tiles of 16 px); finer scales would
    # silently mis-bin renders wider than their range
    scale = 8.0
    lim = float(2**15 - 2)
    qx = jnp.clip(jnp.round(sg(data[:, 0]) * scale), -lim, lim).astype(jnp.int32)
    qy = jnp.clip(jnp.round(sg(data[:, 1]) * scale), -lim, lim).astype(jnp.int32)
    packed_xy = (qx << 16) | (qy & 0xFFFF)
    val_rad = jnp.where(valid, sg(radius), -1.0)
    _, s_xy, s_vr, order = jax.lax.sort(
        (sg(key), packed_xy, val_rad, jnp.arange(n, dtype=jnp.int32)),
        dimension=0,
        num_keys=1,
    )
    s_mx = (s_xy >> 16).astype(data.dtype) / scale  # arithmetic shift: signed
    s_my = (((s_xy & 0xFFFF) ^ 0x8000) - 0x8000).astype(data.dtype) / scale
    s_val = (s_vr >= 0.0).astype(data.dtype)
    s_rad = jnp.maximum(s_vr, 0.0) + 2.0 / scale  # rounding-bound inflation
    return jnp.stack([s_mx, s_my, s_rad, s_val], -1), order  # (N, 4), (N,)


def _rasterize_tiled_data(
    data: jnp.ndarray,  # (N, 6 + C): [mean2d, conic, opacity, channels]
    key: jnp.ndarray,  # (N,) depth sort key, +inf where invalid
    radius: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    width: int,
    height: int,
    k_per_tile: int,
    backend: str,
    max_passes: int = 1,
):
    n = data.shape[0]
    packed, order = _sort_pack(data, key, radius, valid)

    n_valid = jnp.sum(valid.astype(jnp.int32))
    buckets = _prefix_buckets(n)

    def branch(b):
        def run():
            return _rasterize_tiled_prefix(
                packed[:b],
                order,
                data,
                width=width,
                height=height,
                k_per_tile=min(k_per_tile, b),
                backend=backend,
                max_passes=max_passes,
            )

        return run

    index = jnp.searchsorted(jnp.asarray(buckets), n_valid, side="left")
    return jax.lax.switch(index, [branch(b) for b in buckets])


_SATURATED_LOG_T = float(np.log(0.02))  # < 2% transmittance left

# absolute ceiling on the CSR entry budget (see rasterize_tiled_exact):
# 8.4M entries = 4.3 GB padded for the entry gather, comfortable on a 16 GB
# chip next to the ~2 GB attribute table at 4M capacity
_ENTRY_CAP = int(_os.environ.get("ACTIVESPLAT_EXACT_ENTRY_CAP", 1 << 23))


def _rasterize_tiled_prefix(
    packed,  # (B, 4) sorted [mx, my, radius, valid]
    order,  # (N,) sorted -> original index map
    data,  # (N, 6 + C) [mean2d, conic, opacity, channels] — differentiable
    *,
    width: int,
    height: int,
    k_per_tile: int,
    backend: str = "xla",
    max_passes: int = 1,
    return_tiles: bool = False,
):
    n = data.shape[0]
    c_dim = data.shape[1] - 6
    tiles_x = -(-width // TILE)
    tiles_y = -(-height // TILE)

    b = packed.shape[0]

    # padding row (index n): off-screen mean, unit conic, zero opacity/colors
    pad_row = jnp.concatenate(
        [
            jnp.full((1, 2), -1e9, data.dtype),
            jnp.ones((1, 3), data.dtype),
            jnp.zeros((1, 1 + c_dim), data.dtype),
        ],
        -1,
    )
    pad_data = jnp.concatenate([data, pad_row], 0)  # (N+1, 6+C)

    tile_ids = jnp.arange(tiles_x * tiles_y)
    tile_u0 = (tile_ids % tiles_x) * TILE
    tile_v0 = (tile_ids // tiles_x) * TILE
    local = jnp.arange(TILE * TILE, dtype=data.dtype)
    lx = local % TILE
    ly = local // TILE

    def blend_pass(slot_offset):
        """Bin + blend ONE k-wide window of every tile's member list.
        Returns (accum_t (T, px, C), logt_t (T, px), overflow (T,))."""
        lists = bin_gaussians(
            packed[:, :2], packed[:, 2], packed[:, 3] > 0, width, height,
            k_per_tile, slot_offset, backend=backend,
        )
        # map sorted-order list entries to original Gaussian ids; bin
        # padding (b) becomes the blend padding row (n)
        global_ids = jnp.where(
            lists.indices >= b, n, order[jnp.minimum(lists.indices, n - 1)]
        )
        if backend == "pallas":
            import jax as _jax

            from activesplat_tpu.ops.raster_pallas import SEG, blend_tiles

            # the kernel walks SEG-gaussian segments: round the per-tile list
            # capacity up with padding entries (index n = the zero-opacity
            # padding row, blended as a no-op)
            if k_per_tile % SEG != 0:
                pad_k = SEG - k_per_tile % SEG
                global_ids = jnp.concatenate(
                    [
                        global_ids,
                        jnp.full((global_ids.shape[0], pad_k), n, jnp.int32),
                    ],
                    axis=1,
                )
            if c_dim > 8:
                raise ValueError(
                    f"pallas blend supports at most 8 channels (MXU "
                    f"lane-packed colour block), got {c_dim}; use "
                    "backend='xla'"
                )
            # no padding columns in the gather: its transpose scatter-add in
            # the backward then moves only live attributes
            tile_data = jnp.pad(
                pad_data[global_ids], ((0, 0), (0, 0), (0, 16 - 6 - c_dim))
            )  # (T, K, 16)
            accum_t, logt_t = blend_tiles(
                tile_data,
                tile_u0.astype(jnp.int32),
                tile_v0.astype(jnp.int32),
                c_dim,
                _jax.default_backend() != "tpu",
            )
        else:

            def tile_fn(ids, u0, v0):
                px = u0.astype(data.dtype) + lx
                py = v0.astype(data.dtype) + ly
                return _blend_tile(
                    ids,
                    pad_data[:, 0:2],
                    pad_data[:, 2:5],
                    pad_data[:, 5],
                    pad_data[:, 6:],
                    px,
                    py,
                )

            accum_t, logt_t = jax.vmap(tile_fn)(global_ids, tile_u0, tile_v0)
        return accum_t, logt_t, lists.overflow

    accum_t, logt_t, overflow = blend_pass(jnp.int32(0))

    if max_passes > 1:
        # Exact (uncapped, reference-semantics) compositing: walk farther
        # k-windows of every tile list until all overflowing tiles saturate
        # or exhaust. Front-to-back blending is associative —
        # total = accum_1 + T_1 * accum_2 + T_1 T_2 * accum_3 ... — so each
        # pass's output folds in with one elementwise multiply-add. Uses
        # lax.while_loop, hence FORWARD-ONLY (reverse-mode jax cannot
        # differentiate while_loop); the training path keeps max_passes=1.
        def needs_more(carry):
            p, accum_c, logt_c, overflow_c = carry
            unsat = jnp.max(logt_c, axis=1) > _SATURATED_LOG_T
            return (p < max_passes) & jnp.any((overflow_c > 0) & unsat)

        def next_pass(carry):
            p, accum_c, logt_c, overflow_c = carry
            accum_p, logt_p, overflow_p = blend_pass(p * k_per_tile)
            t_c = jnp.exp(logt_c)
            return (
                p + 1,
                accum_c + t_c[:, :, None] * accum_p,
                logt_c + logt_p,
                overflow_p,
            )

        _, accum_t, logt_t, overflow = jax.lax.while_loop(
            needs_more, next_pass, (jnp.int32(1), accum_t, logt_t, overflow)
        )

    if return_tiles:
        # tile-granularity outputs for the hybrid compositor: identical
        # shapes across prefix buckets, so the lax.switch stays legal
        return accum_t, logt_t, overflow

    accum_img, logt_img = _tiles_to_image(
        accum_t, logt_t, tiles_x, tiles_y, width, height
    )
    # harmful-drop counter: overflow only matters in unsaturated tiles (see
    # rasterize_tiled docstring). logt is end-of-list log-transmittance.
    unsaturated = jnp.max(logt_t, axis=1) > _SATURATED_LOG_T
    dropped = jnp.sum(jnp.where(unsaturated, overflow, 0))
    return (
        accum_img.reshape(height * width, c_dim),
        logt_img.reshape(height * width),
        jax.lax.stop_gradient(dropped),
    )


def _tiles_to_image(accum_t, logt_t, tiles_x, tiles_y, width, height):
    """(T, TILE*TILE, C)/(T, TILE*TILE) tile blocks -> cropped images."""
    c_dim = accum_t.shape[-1]
    accum_img = (
        accum_t.reshape(tiles_y, tiles_x, TILE, TILE, c_dim)
        .transpose(0, 2, 1, 3, 4)
        .reshape(tiles_y * TILE, tiles_x * TILE, c_dim)[:height, :width]
    )
    logt_img = (
        logt_t.reshape(tiles_y, tiles_x, TILE, TILE)
        .transpose(0, 2, 1, 3)
        .reshape(tiles_y * TILE, tiles_x * TILE)[:height, :width]
    )
    return accum_img, logt_img


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "entry_budget", "ladder", "interpret",
        "differentiable",
    ),
)
def rasterize_tiled_exact(
    mean2d: jnp.ndarray,  # (N, 2) UNSORTED (projection order)
    conic: jnp.ndarray,
    opacity: jnp.ndarray,
    colors: jnp.ndarray,  # (N, C)
    valid: jnp.ndarray,
    radius: jnp.ndarray,
    depth: jnp.ndarray,  # (N,)
    band: Optional[jnp.ndarray] = None,  # (N,) bool: dual-transmittance bit
    *,
    width: int,
    height: int,
    entry_budget: int = 0,
    ladder: Tuple[float, ...] = (),
    interpret: bool = False,
    differentiable: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Exact (uncapped) forward-only tile compositing in CSR layout.

    The multi-pass exact path (rasterize_tiled max_passes>1) re-bins and
    re-blends EVERY tile's k-window each round, so its cost is
    T x k x max_tile_members/k — quadratic pain under the skewed membership
    distributions of converged maps (end-of-episode topdown: wall tiles hold
    ~56k members while the median tile has ~3k; measured 150-220 rounds).
    This path is the CUDA reference's duplicate-and-sort forward
    (diff-gaussian-rasterization) rebuilt TPU-style: work and memory are
    O(total memberships).

      1. depth-sort Gaussians once (multi-operand lax.sort, as the k-capped
         path does);
      2. expand to one entry per (gaussian, touched tile) WITHOUT a span
         cap: entry slots are allocated by a cumsum over per-Gaussian AABB
         tile areas, and the entry->gaussian inverse map is a scatter of
         ones at each Gaussian's first slot + a cumsum — no searchsorted,
         no (T, N) matrix;
      3. stable-sort entries by tile id (depth order preserved within each
         tile), with per-tile padding entries so every run is CSEG-aligned;
      4. gather entry attribute rows once and stream them through the
         segmented Pallas blend (blend_csr_pallas), which accumulates into
         each tile's output block with early termination on saturation.

    Returns (accum (H*W, C), log_transmittance (H*W,), dropped ()) where
    `dropped` counts memberships past `entry_budget` (the deepest entries of
    the whole render; callers escalate the budget when nonzero).

    `band` (forward-only) enables the DUAL-transmittance walk: one extra
    (H*W,) log-transmittance output composited over band-masked alphas —
    entries whose Gaussian has band=0 contribute exact +0.0 log terms, so
    the result is bitwise what a band-restricted render would produce in the
    same entry order. One expansion/sort/gather/walk then serves both
    topdown maps (the whole-map "unobserved" view and the height-sliced
    "free" view, reference visualizer.py:926-976) where the pair previously
    cost two full CSR instantiations per ladder rung — the dominant term of
    both the program's compile size and its executable cache footprint.
    Return becomes (accum, log_t, log_t_band, dropped).

    entry_budget = 0 picks 4 * N entries (topdown at 877k Gaussians measures
    ~2 memberships per Gaussian; perspective views frustum-cull most of the
    map but carry larger per-splat spans — ~3 in the parity tests).

    `ladder` (static fractions of N, e.g. (0.5, 1.0)) enables budget
    RIGHT-SIZING: every entry-sized op (the tile-key sort, the inverse-map
    cumsums, the attribute-row gather, the blend grid) costs O(budget), and
    small views need far less than 4N — a 120x150 panorama view frustum-culls
    ~2/3 of the map and carries ~1-tile spans, so its true membership total is
    ~0.5N and a fixed 4N budget wastes ~8x. The actual total is known after
    the cheap N-sized prework, so a lax.switch picks the smallest rung that
    fits (rungs: the ladder fractions plus the 4N/entry_budget top rung, which
    keeps the overflow->multipass exactness guarantee unchanged). Each rung
    compiles its own branch — callers with recompile-sensitive cold paths
    should keep ladders short.
    """
    from activesplat_tpu.ops.raster_pallas import BAND_COL, CSEG, N_ATTR

    assert not (differentiable and band is not None), (
        "dual-transmittance mode is forward-only"
    )
    n = mean2d.shape[0]
    c_dim = colors.shape[-1]
    tiles_x = -(-width // TILE)
    tiles_y = -(-height // TILE)
    t = tiles_x * tiles_y
    if entry_budget <= 0:
        entry_budget = 4 * n
    # HBM guard on the top rung: every E-sized f32 table is laid out
    # T(8, 128), so its 16 attribute columns pad to 128 lanes — 512 B/entry.
    # The un-capped 4N rung at N = 4M capacity is 16.8M entries = 8.6 GB for
    # the entry gather ALONE, which blew the 16 GB HBM inside the r04
    # high-resolution densify program (512px episode crash, VERDICT r4
    # missing #1). Overflow past the cap takes the existing provably-exact
    # multi-pass fallback instead of an allocation failure.
    entry_budget = min(entry_budget, _ENTRY_CAP)

    def _align(v: int) -> int:
        return -(-max(int(v), CSEG) // CSEG) * CSEG

    top = _align(entry_budget)
    rungs = sorted({_align(f * n) for f in ladder if _align(f * n) < top}) + [top]

    sg = jax.lax.stop_gradient
    if not differentiable:
        mean2d = sg(mean2d)
        conic = sg(conic)
        opacity = sg(opacity)
        colors = sg(colors)
    # binning/sort geometry NEVER carries gradients (matching the k-capped
    # path, whose gradients flow only through the gathered attribute rows);
    # in differentiable mode the attribute table below still does
    g_mean2d = sg(mean2d)
    radius = sg(radius)
    depth = sg(depth)

    # ---- 1. depth sort (same packed-operand trick as the k-capped path) ----
    key = jnp.where(valid, depth, jnp.inf)
    scale = 8.0
    lim = float(2**15 - 2)
    qx = jnp.clip(jnp.round(g_mean2d[:, 0] * scale), -lim, lim).astype(jnp.int32)
    qy = jnp.clip(jnp.round(g_mean2d[:, 1] * scale), -lim, lim).astype(jnp.int32)
    packed_xy = (qx << 16) | (qy & 0xFFFF)
    val_rad = jnp.where(valid, radius, -1.0)
    # STABLE: equal-depth Gaussians keep index order, so a window-culled
    # render (fewer valid bits, same keys) composites its common entries in
    # the same order as the full render — topdown views are full of exact
    # depth ties (floor/ceiling points share heights)
    _, s_xy, s_vr, order = jax.lax.sort(
        (key, packed_xy, val_rad, jnp.arange(n, dtype=jnp.int32)),
        dimension=0,
        is_stable=True,
        num_keys=1,
    )
    s_mx = (s_xy >> 16).astype(jnp.float32) / scale
    s_my = (((s_xy & 0xFFFF) ^ 0x8000) - 0x8000).astype(jnp.float32) / scale
    s_val = s_vr >= 0.0
    s_rad = jnp.maximum(s_vr, 0.0) + 2.0 / scale

    # ---- 2. AABBs + per-tile totals (counting matmul) ----
    s_val, tx0, tx1, ty0, ty1 = tile_aabbs(
        s_mx, s_my, s_rad, s_val, tiles_x, tiles_y
    )
    tx0, tx1, ty0, ty1 = (
        a.astype(jnp.int32) for a in (tx0, tx1, ty0, ty1)
    )
    w_g = tx1 - tx0 + 1
    h_g = ty1 - ty0 + 1
    span = jnp.where(s_val, w_g * h_g, 0)

    # budget cut at GAUSSIAN granularity: a partially-expanded Gaussian would
    # leave some tiles' runs short of their counted length, breaking the
    # CSEG alignment the blend kernel relies on
    g_off = jnp.cumsum(span) - span  # exclusive (N,)
    m_total = g_off[-1] + span[-1]

    tile_col = jnp.arange(tiles_x, dtype=jnp.int32)
    tile_row = jnp.arange(tiles_y, dtype=jnp.int32)
    in_y = (tile_row[None, :] >= ty0[:, None]) & (tile_row[None, :] <= ty1[:, None])
    # per-gaussian AABB byte-pack: one scalar gather per entry
    pga = (tx0 << 16) | (ty0 << 8) | (w_g - 1)
    pj = jnp.arange(CSEG - 1, dtype=jnp.int32)

    # ---- 5a. attribute table (shared by all rungs) ----
    # Forward-only: the table carries its N_ATTR zero padding columns so the
    # per-entry gather below produces the kernel layout DIRECTLY — a separate
    # (E, 6+C) gather + (E, N_ATTR) pad materializes TWO E-sized lane-padded
    # arrays (512 B/entry each; at the 512px/4M-capacity densify shape that
    # alone was 16.2 GB — the r04 HBM exhaustion). Differentiable mode keeps
    # the narrow table: the gather's transpose scatter-add in the backward
    # then moves only the 6+C live columns (measured win, CLAUDE.md).
    if band is not None:
        assert c_dim <= BAND_COL - 6, (c_dim, BAND_COL)
        tail = [
            jnp.zeros((n, BAND_COL - 6 - c_dim), mean2d.dtype),
            band.astype(mean2d.dtype)[:, None],
            jnp.zeros((n, N_ATTR - BAND_COL - 1), mean2d.dtype),
        ]
    elif differentiable:
        tail = []
    else:
        tail = [jnp.zeros((n, N_ATTR - 6 - c_dim), mean2d.dtype)]
    data = jnp.concatenate(
        [mean2d, conic, opacity[:, None], colors] + tail, -1
    )  # (N, 6 + C) or (N, N_ATTR)
    pad_row = jnp.concatenate(
        [
            jnp.full((1, 2), -1e9, data.dtype),
            jnp.ones((1, 3), data.dtype),
            jnp.zeros((1, data.shape[1] - 5), data.dtype),
        ],
        -1,
    )
    pad_data = jnp.concatenate([data, pad_row], 0)

    from activesplat_tpu.ops.raster_pallas import (
        blend_csr,
        blend_csr_dual_pallas,
        blend_csr_pallas,
    )

    if band is not None:
        blend_fn = blend_csr_dual_pallas
    elif differentiable:
        blend_fn = blend_csr
    else:
        blend_fn = blend_csr_pallas

    def _body(e: int):
        """Expansion + sort + blend at one static entry budget."""
        kept = (g_off + span) <= e
        v = s_val & kept
        m_kept = jnp.max(jnp.where(kept, g_off + span, 0))

        in_x = (
            (tile_col[None, :] >= tx0[:, None])
            & (tile_col[None, :] <= tx1[:, None])
            & v[:, None]
        )
        count_full = jnp.einsum(
            "ny,nx->yx",
            in_y.astype(jnp.int8),
            in_x.astype(jnp.int8),
            preferred_element_type=jnp.int32,
        ).reshape(t)

        # ---- 3. entry -> (gaussian, tile) inverse map ----
        e_idx = jnp.arange(e, dtype=jnp.int32)
        marks = jnp.zeros((e,), jnp.int32).at[g_off].add(1, mode="drop")
        gid = jnp.cumsum(marks) - 1  # (E,) owning sorted-gaussian id
        is_first = jnp.concatenate([jnp.ones((1,), bool), gid[1:] != gid[:-1]])
        run_start = jax.lax.cummax(jnp.where(is_first, e_idx, 0))
        local = e_idx - run_start
        pv = pga[gid]
        ew = (pv & 0xFF) + 1
        dx = local % ew
        dy = local // ew
        tile_of = (
            ((pv >> 8) & 0xFF) * tiles_x + dy * tiles_x + ((pv >> 16) & 0xFF) + dx
        )
        valid_entry = e_idx < m_kept
        entry_key = jnp.where(valid_entry, tile_of, t)

        # ---- 4. per-tile CSEG-alignment padding entries ----
        pad_needed = (-count_full) % CSEG  # (T,)
        pad_key = jnp.where(
            pj[None, :] < pad_needed[:, None],
            jnp.arange(t, dtype=jnp.int32)[:, None],
            t,
        ).reshape(-1)

        keys_all = jnp.concatenate([entry_key, pad_key])
        gid_all = jnp.concatenate(
            [jnp.where(valid_entry, gid, n), jnp.full(pad_key.shape, n, jnp.int32)]
        )
        e_tot = -(-keys_all.shape[0] // CSEG) * CSEG
        if e_tot != keys_all.shape[0]:
            extra = e_tot - keys_all.shape[0]
            keys_all = jnp.concatenate([keys_all, jnp.full((extra,), t, jnp.int32)])
            gid_all = jnp.concatenate([gid_all, jnp.full((extra,), n, jnp.int32)])
        sorted_key, sorted_gid = jax.lax.sort(
            (keys_all, gid_all), dimension=0, is_stable=True, num_keys=1
        )

        # ---- 5b. attribute rows + segmented blend ----
        global_ids = jnp.where(
            sorted_gid >= n, n, order[jnp.minimum(sorted_gid, n - 1)]
        )
        rows = pad_data[global_ids]
        entry_data = (
            rows
            if rows.shape[1] == N_ATTR
            else jnp.pad(rows, ((0, 0), (0, N_ATTR - 6 - c_dim)))
        )  # (E_tot, N_ATTR)

        # segment -> tile map derived from the (padded) per-tile counts with
        # the same scatter+cumsum inverse-map trick — a strided slice of
        # sorted_key (sorted_key[::CSEG]) measures 26 ms at 4M entries, this
        # is ~1 ms
        n_seg = e_tot // CSEG
        seg_counts = (count_full + pad_needed) // CSEG  # (T,)
        seg_starts = jnp.cumsum(seg_counts) - seg_counts
        seg_marks = (
            jnp.zeros((n_seg,), jnp.int32).at[seg_starts].add(1, mode="drop")
        )
        seg_of = jnp.cumsum(seg_marks) - 1
        s_used = jnp.sum(seg_counts)
        seg_tile = jnp.where(jnp.arange(n_seg) < s_used, seg_of, t)
        in_grid = seg_tile < t
        seg_u0 = jnp.where(in_grid, (seg_tile % tiles_x) * TILE, 0)
        seg_v0 = jnp.where(in_grid, (seg_tile // tiles_x) * TILE, 0)

        out = blend_fn(
            entry_data, seg_tile, seg_u0, seg_v0, t, c_dim, interpret
        )
        accum_t, logt_t = out[0], out[1]
        # tiles with no entries are never visited by the kernel: mask garbage
        visited = count_full > 0
        accum_t = jnp.where(visited[:, None, None], accum_t, 0.0)
        logt_t = jnp.where(visited[:, None], logt_t, 0.0)

        accum_img, logt_img = _tiles_to_image(
            accum_t, logt_t, tiles_x, tiles_y, width, height
        )
        dropped = m_total - m_kept
        if band is None:
            return (
                accum_img.reshape(height * width, c_dim),
                logt_img.reshape(height * width),
                dropped,
            )
        logt2_t = jnp.where(visited[:, None], out[2], 0.0)
        _, logt2_img = _tiles_to_image(
            accum_t, logt2_t, tiles_x, tiles_y, width, height
        )
        return (
            accum_img.reshape(height * width, c_dim),
            logt_img.reshape(height * width),
            logt2_img.reshape(height * width),
            dropped,
        )

    if len(rungs) == 1:
        return _body(rungs[0])
    # smallest rung that fits m_total (the last rung also catches overflow,
    # whose nonzero `dropped` triggers the caller's multipass fallback)
    idx = jnp.int32(0)
    for r in rungs[:-1]:
        idx = idx + (m_total > r).astype(jnp.int32)
    return jax.lax.switch(idx, [functools.partial(_body, r) for r in rungs])


def _csr_harmful_fold(
    packed,  # (N, 4) sorted [mx, my, radius, valid] from _sort_pack
    order,  # (N,) sorted -> original index map
    data,  # (N, 6 + C) UNSORTED differentiable attributes
    harm,  # (T,) bool, stop-gradient: tiles to recomposite exactly
    *,
    tiles_x: int,
    tiles_y: int,
    ladder: Tuple[float, ...],
    interpret: bool,
):
    """Exact differentiable CSR recompositing of the `harm` tile subset.

    The entry expansion mirrors rasterize_tiled_exact step-for-step, with two
    restrictions that shrink the budget to roughly the harmful membership
    total: (1) only Gaussians whose AABB covers >= 1 harmful tile allocate
    entry slots (the coverage count is one int8 MXU bilinear form per
    Gaussian: in_y @ harm_image, dotted with in_x — no (N, T) matrix); (2)
    enumeration stays RECTANGULAR (a kept Gaussian emits its full AABB span,
    non-harmful cells are routed to the discard key before the tile sort),
    so no per-Gaussian non-rectangular indexing is ever needed. Every
    Gaussian covering a harmful tile is by definition kept, so each harmful
    tile's entry run is complete and depth-ordered — identical to the full
    CSR walk's run for that tile.

    Returns (accum_t (T, PX, C), logt_t (T, PX), dropped ()) where `dropped`
    counts entry slots cut by the top budget rung (callers must discard the
    result and fall back when nonzero). Tiles outside `harm` hold zeros."""
    from activesplat_tpu.ops.raster_pallas import CSEG, N_ATTR, blend_csr

    n = data.shape[0]
    c_dim = data.shape[1] - 6
    t = tiles_x * tiles_y

    s_val, tx0, tx1, ty0, ty1 = tile_aabbs(
        packed[:, 0], packed[:, 1], packed[:, 2], packed[:, 3] > 0,
        tiles_x, tiles_y,
    )
    tx0, tx1, ty0, ty1 = (a.astype(jnp.int32) for a in (tx0, tx1, ty0, ty1))
    w_g = tx1 - tx0 + 1
    h_g = ty1 - ty0 + 1

    tile_col = jnp.arange(tiles_x, dtype=jnp.int32)
    tile_row = jnp.arange(tiles_y, dtype=jnp.int32)
    in_x = (
        (tile_col[None, :] >= tx0[:, None])
        & (tile_col[None, :] <= tx1[:, None])
        & s_val[:, None]
    )
    in_y = (tile_row[None, :] >= ty0[:, None]) & (tile_row[None, :] <= ty1[:, None])

    # harmful-tile coverage per Gaussian: in_y[g] @ harm @ in_x[g]^T
    harm_yx = harm.reshape(tiles_y, tiles_x).astype(jnp.int8)
    cover_x = jnp.einsum(
        "ny,yx->nx", in_y.astype(jnp.int8), harm_yx,
        preferred_element_type=jnp.int32,
    )  # (N, tiles_x): harmful rows under each Gaussian's y-interval
    touch = jnp.sum(cover_x * in_x.astype(jnp.int32), axis=1) > 0
    v = s_val & touch
    span = jnp.where(v, w_g * h_g, 0)
    g_off = jnp.cumsum(span) - span  # exclusive (N,)
    m_total = g_off[-1] + span[-1]

    # per-tile entry counts: every kept Gaussian covering a harmful tile
    # emits that entry, so harmful tiles count ALL their covering Gaussians
    in_x_v = in_x & touch[:, None]
    count_v = jnp.einsum(
        "ny,nx->yx", in_y.astype(jnp.int8), in_x_v.astype(jnp.int8),
        preferred_element_type=jnp.int32,
    ).reshape(t)
    count_harm = jnp.where(harm, count_v, 0)

    pga = (tx0 << 16) | (ty0 << 8) | (w_g - 1)
    pj = jnp.arange(CSEG - 1, dtype=jnp.int32)
    harm_pad = jnp.concatenate([harm, jnp.zeros((1,), bool)])  # slot t -> False

    pad_row = jnp.concatenate(
        [
            jnp.full((1, 2), -1e9, data.dtype),
            jnp.ones((1, 3), data.dtype),
            jnp.zeros((1, 1 + c_dim), data.dtype),
        ],
        -1,
    )
    pad_data = jnp.concatenate([data, pad_row], 0)  # (N+1, 6+C)

    def _align(vv: int) -> int:
        return -(-max(int(vv), CSEG) // CSEG) * CSEG

    top = _align(min(4 * n, _ENTRY_CAP))
    rungs = sorted({_align(f * n) for f in ladder if _align(f * n) < top}) + [top]

    def _body(e: int):
        kept = (g_off + span) <= e
        m_kept = jnp.max(jnp.where(kept, g_off + span, 0))

        e_idx = jnp.arange(e, dtype=jnp.int32)
        marks = jnp.zeros((e,), jnp.int32).at[g_off].add(1, mode="drop")
        gid = jnp.cumsum(marks) - 1  # (E,) owning sorted-gaussian id
        is_first = jnp.concatenate([jnp.ones((1,), bool), gid[1:] != gid[:-1]])
        run_start = jax.lax.cummax(jnp.where(is_first, e_idx, 0))
        local = e_idx - run_start
        pv = pga[gid]
        ew = (pv & 0xFF) + 1
        dx = local % ew
        dy = local // ew
        tile_of = (
            ((pv >> 8) & 0xFF) * tiles_x + dy * tiles_x + ((pv >> 16) & 0xFF) + dx
        )
        valid_entry = e_idx < m_kept
        # entries in non-harmful cells of a kept rectangle go to the discard
        # key: they waste budget slots (bounded by the rectangle/harmful
        # ratio) but never an indexing structure
        keep_e = valid_entry & harm_pad[jnp.clip(tile_of, 0, t)]
        entry_key = jnp.where(keep_e, tile_of, t)
        gid_e = jnp.where(keep_e, gid, n)

        pad_needed = (-count_harm) % CSEG  # (T,)
        pad_key = jnp.where(
            pj[None, :] < pad_needed[:, None],
            jnp.arange(t, dtype=jnp.int32)[:, None],
            t,
        ).reshape(-1)

        keys_all = jnp.concatenate([entry_key, pad_key])
        gid_all = jnp.concatenate([gid_e, jnp.full(pad_key.shape, n, jnp.int32)])
        e_tot = -(-keys_all.shape[0] // CSEG) * CSEG
        if e_tot != keys_all.shape[0]:
            extra = e_tot - keys_all.shape[0]
            keys_all = jnp.concatenate([keys_all, jnp.full((extra,), t, jnp.int32)])
            gid_all = jnp.concatenate([gid_all, jnp.full((extra,), n, jnp.int32)])
        sorted_key, sorted_gid = jax.lax.sort(
            (keys_all, gid_all), dimension=0, is_stable=True, num_keys=1
        )

        global_ids = jnp.where(
            sorted_gid >= n, n, order[jnp.minimum(sorted_gid, n - 1)]
        )
        entry_data = jnp.pad(
            pad_data[global_ids], ((0, 0), (0, N_ATTR - 6 - c_dim))
        )  # (E_tot, N_ATTR) — narrow gather: its transpose scatter-add in
        # the backward moves only the live columns

        n_seg = e_tot // CSEG
        seg_counts = (count_harm + pad_needed) // CSEG
        seg_starts = jnp.cumsum(seg_counts) - seg_counts
        seg_marks = (
            jnp.zeros((n_seg,), jnp.int32).at[seg_starts].add(1, mode="drop")
        )
        seg_of = jnp.cumsum(seg_marks) - 1
        s_used = jnp.sum(seg_counts)
        seg_tile = jnp.where(jnp.arange(n_seg) < s_used, seg_of, t)
        in_grid = seg_tile < t
        seg_u0 = jnp.where(in_grid, (seg_tile % tiles_x) * TILE, 0)
        seg_v0 = jnp.where(in_grid, (seg_tile // tiles_x) * TILE, 0)

        accum_t, logt_t = blend_csr(
            entry_data, seg_tile, seg_u0, seg_v0, t, c_dim, interpret
        )
        visited = count_harm > 0
        accum_t = jnp.where(visited[:, None, None], accum_t, 0.0)
        logt_t = jnp.where(visited[:, None], logt_t, 0.0)
        return accum_t, logt_t, m_total - m_kept

    if len(rungs) == 1:
        return _body(rungs[0])
    idx = jnp.int32(0)
    for r in rungs[:-1]:
        idx = idx + (m_total > r).astype(jnp.int32)
    return jax.lax.switch(idx, [functools.partial(_body, r) for r in rungs])


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "k_per_tile", "backend", "ladder"),
)
def rasterize_tiled_hybrid(
    mean2d: jnp.ndarray,  # (N, 2) UNSORTED (projection order)
    conic: jnp.ndarray,
    opacity: jnp.ndarray,
    colors: jnp.ndarray,  # (N, C)
    valid: jnp.ndarray,
    radius: jnp.ndarray,
    depth: jnp.ndarray,  # (N,)
    *,
    width: int,
    height: int,
    k_per_tile: int = 256,
    backend: str = "xla",
    ladder: Tuple[float, ...] = (0.0625, 0.25),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Hybrid exact differentiable compositing: k-capped everywhere, CSR
    only where the cap actually bites.

    The full differentiable CSR walk (rasterize_tiled_exact
    differentiable=True) pays O(total memberships) on EVERY training render
    — measured a flat ~2.5x over the capped path (84.6 vs 33.5 ms/iter at
    1M/k=1024) — even though in a converged map only a minority of tiles
    overflow HARMFULLY: saturated tiles early-exit at the same LOG_EPS
    transmittance in both kernels (truncation past saturation is invisible
    to image and gradients alike), and under-k tiles are already uncapped.
    So: run the k-capped differentiable blend for every tile (with its
    visible-prefix bucket switch), mark tiles with `overflow > 0` whose
    end-of-list transmittance is still above the blend kernels' shared
    LOG_EPS exit threshold, recomposite exactly those tiles with the
    differentiable CSR blend (_csr_harmful_fold), and select per tile with
    a stop-gradient mask — AD routes each tile's cotangents to whichever
    branch produced it. Matches the CUDA reference's uncapped dynamic-list
    training semantics (reference splatam.py:208-212) at a cost of capped +
    O(harmful memberships).

    `ladder`: static fractions of N offered as CSR entry-budget rungs below
    the exactness bound min(4N, entry cap); the actual harmful total picks
    the smallest rung that fits (usually far below the full walk's).

    Returns (accum (H*W, C), log_transmittance (H*W,), dropped (),
    csr_overflow ()). `dropped` is the k-capped path's harmful-truncation
    TELEMETRY (the mapper's k-escalation pressure signal — escalating k
    shrinks the harmful set and with it the CSR work); exactness does not
    depend on it. `csr_overflow` > 0 means the harmful expansion exceeded
    the top budget rung: the caller MUST discard this result and fall back
    (render_projected degrades to the k-capped render, exactly as the full
    CSR training path does)."""
    from activesplat_tpu.ops.raster_pallas import LOG_EPS

    n = mean2d.shape[0]
    c_dim = colors.shape[-1]
    tiles_x = -(-width // TILE)
    tiles_y = -(-height // TILE)
    key = jnp.where(valid, depth, jnp.inf)
    data = jnp.concatenate([mean2d, conic, opacity[:, None], colors], -1)
    packed, order = _sort_pack(data, key, radius, valid)  # ONE sort, shared
    # by the capped pass and the harmful-tile CSR expansion

    n_valid = jnp.sum(valid.astype(jnp.int32))
    buckets = _prefix_buckets(n)

    def branch(b):
        def run():
            return _rasterize_tiled_prefix(
                packed[:b],
                order,
                data,
                width=width,
                height=height,
                k_per_tile=min(k_per_tile, b),
                backend=backend,
                max_passes=1,
                return_tiles=True,
            )

        return run

    index = jnp.searchsorted(jnp.asarray(buckets), n_valid, side="left")
    accum_t, logt_t, overflow = jax.lax.switch(
        index, [branch(b) for b in buckets]
    )

    end_logt = jnp.max(logt_t, axis=1)  # (T,) end-of-k-list log-transmittance
    harm = jax.lax.stop_gradient((overflow > 0) & (end_logt > LOG_EPS))
    csr_accum, csr_logt, csr_overflow = _csr_harmful_fold(
        packed,
        order,
        data,
        harm,
        tiles_x=tiles_x,
        tiles_y=tiles_y,
        ladder=ladder,
        interpret=jax.default_backend() != "tpu",
    )

    accum_t = jnp.where(harm[:, None, None], csr_accum, accum_t)
    logt_t = jnp.where(harm[:, None], csr_logt, logt_t)

    unsaturated = end_logt > _SATURATED_LOG_T  # 2% telemetry threshold
    dropped = jnp.sum(jnp.where(unsaturated, overflow, 0))

    accum_img, logt_img = _tiles_to_image(
        accum_t, logt_t, tiles_x, tiles_y, width, height
    )
    return (
        accum_img.reshape(height * width, c_dim),
        logt_img.reshape(height * width),
        jax.lax.stop_gradient(dropped),
        csr_overflow,
    )
