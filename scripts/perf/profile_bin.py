"""Decompose bin_gaussians' cost and race candidate replacements.

CLAUDE.md round-3 ledger: of the 8.7 ms mapping iteration @200k, binning is
~1.5 ms and is the only stage believed above its primitive floor. This
script times the three bin stages in isolation (einsum counts / block scan /
rows-gather+bits walk) and the candidate variants:

  counts-int8   int8 MXU matmuls for the member counts (2x rate vs bf16?)
  bits-u16mask  byte-packed AABB row gather (T,K,128 i32 = 33 MB) replaced
                by 16-gaussian bitmask chunks: gather 8 u16 per slot (1 MB)
                + popcount rank walk
  bwd-sortseg   the blend gather's transpose scatter-add (measured 1.7 ms
                floor) replaced by sort-by-id + sorted-boundary segment sum

Timing convention: reps chained in ONE jitted program, value-fetch sync
(axon relay; see profile_prims.py).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

from activesplat_tpu.ops.raster_tiled import TILE, bin_gaussians

T_X = T_Y = 16  # 256px / TILE
T = T_X * T_Y
K = 256
BLK = 128


def timeit_chained(make_step, init, n=30, label=""):
    @jax.jit
    def run(init):
        return jax.lax.fori_loop(0, n, make_step, init)

    out = run(init)
    float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    out = run(init)
    float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label:56s} {dt:8.3f} ms", flush=True)
    return dt


def synth_aabbs(n, n_valid, seed=0):
    """Realistic screen AABBs: uniform centers, lognormal radii (px)."""
    rng = np.random.default_rng(seed)
    mean2d = rng.uniform(0, 256, size=(n, 2)).astype(np.float32)
    radius = np.exp(rng.normal(1.0, 0.7, size=n)).astype(np.float32)  # ~e px
    valid = np.zeros(n, bool)
    valid[:n_valid] = True
    return jnp.asarray(mean2d), jnp.asarray(radius), jnp.asarray(valid)


def stage_inputs(mean2d, radius, valid):
    tx0 = jnp.clip(jnp.floor((mean2d[:, 0] - radius) / TILE), 0, T_X - 1)
    tx1 = jnp.clip(jnp.floor((mean2d[:, 0] + radius) / TILE), 0, T_X - 1)
    ty0 = jnp.clip(jnp.floor((mean2d[:, 1] - radius) / TILE), 0, T_Y - 1)
    ty1 = jnp.clip(jnp.floor((mean2d[:, 1] + radius) / TILE), 0, T_Y - 1)
    return tx0, tx1, ty0, ty1


def counts_bf16(tx0, tx1, ty0, ty1, valid):
    n = tx0.shape[0]
    nb = n // BLK
    tile_col = jnp.arange(T_X, dtype=jnp.float32)
    tile_row = jnp.arange(T_Y, dtype=jnp.float32)
    in_x = (tile_col[None] >= tx0[:, None]) & (tile_col[None] <= tx1[:, None]) & valid[:, None]
    in_y = (tile_row[None] >= ty0[:, None]) & (tile_row[None] <= ty1[:, None])
    counts = jnp.einsum(
        "nky,nkx->nyx",
        in_y.reshape(nb, BLK, T_Y).astype(jnp.bfloat16),
        in_x.reshape(nb, BLK, T_X).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return counts.reshape(nb, T).T.astype(jnp.int32)


def counts_int8(tx0, tx1, ty0, ty1, valid):
    n = tx0.shape[0]
    nb = n // BLK
    tile_col = jnp.arange(T_X, dtype=jnp.float32)
    tile_row = jnp.arange(T_Y, dtype=jnp.float32)
    in_x = (tile_col[None] >= tx0[:, None]) & (tile_col[None] <= tx1[:, None]) & valid[:, None]
    in_y = (tile_row[None] >= ty0[:, None]) & (tile_row[None] <= ty1[:, None])
    counts = jnp.einsum(
        "nky,nkx->nyx",
        in_y.reshape(nb, BLK, T_Y).astype(jnp.int8),
        in_x.reshape(nb, BLK, T_X).astype(jnp.int8),
        preferred_element_type=jnp.int32,
    )
    return counts.reshape(nb, T).T


def main():
    print(f"device={jax.devices()[0].platform}", flush=True)
    n = int(os.environ.get("BIN_N", 262_144))
    n_valid = int(os.environ.get("BIN_VALID", 200_000))
    mean2d, radius, valid = synth_aabbs(n, n_valid)
    tx0, tx1, ty0, ty1 = stage_inputs(mean2d, radius, valid)
    nb = n // BLK

    # --- end-to-end current bin -------------------------------------------
    def bin_step(i, carry):
        m, acc = carry
        lists = bin_gaussians(
            m + 1e-6 * acc, radius, valid, 256, 256, K
        )
        return m, acc + lists.indices[0, 0].astype(jnp.float32) * 1e-9

    timeit_chained(bin_step, (mean2d, jnp.float32(0)), label=f"bin_gaussians current (N={n})")

    # --- stage 1: counts einsum -------------------------------------------
    def c_bf16(i, carry):
        t0_, acc = carry
        c = counts_bf16(tx0 + acc * 1e-30, tx1, ty0, ty1, valid)
        return t0_, acc + c[0, 0].astype(jnp.float32) * 1e-9

    def c_i8(i, carry):
        t0_, acc = carry
        c = counts_int8(tx0 + acc * 1e-30, tx1, ty0, ty1, valid)
        return t0_, acc + c[0, 0].astype(jnp.float32) * 1e-9

    timeit_chained(c_bf16, (tx0, jnp.float32(0)), label="  counts einsum bf16 (indicators incl.)")
    timeit_chained(c_i8, (tx0, jnp.float32(0)), label="  counts einsum int8 (indicators incl.)")

    block_counts = counts_bf16(tx0, tx1, ty0, ty1, valid)

    # --- stage 2: 3-level scan -> blk_idx/prior ---------------------------
    ks = jnp.arange(K, dtype=jnp.int32)

    def scan3(block_counts):
        subs = 32
        nb0 = nb // subs
        sub_cum = jnp.cumsum(block_counts.reshape(T, nb0, subs), axis=2)
        sup_cum = jnp.cumsum(sub_cum[:, :, -1], axis=1)
        count_full = sup_cum[:, -1]
        sup_idx = jnp.sum(sup_cum[:, None, :] <= ks[None, :, None], axis=2, dtype=jnp.int32)
        sup_safe = jnp.minimum(sup_idx, nb0 - 1)
        prior0 = jnp.where(
            sup_safe > 0,
            jnp.take_along_axis(sup_cum, jnp.maximum(sup_safe - 1, 0), axis=1), 0,
        )
        sub_row = jnp.take_along_axis(sub_cum, sup_safe[:, :, None], axis=1)
        need1 = (ks[None, :] - prior0 + 1)[:, :, None]
        sub_idx = jnp.sum(sub_row < need1, axis=2, dtype=jnp.int32)
        sub_safe = jnp.minimum(sub_idx, subs - 1)
        prior = prior0 + jnp.where(
            sub_safe > 0,
            jnp.take_along_axis(sub_row, jnp.maximum(sub_safe - 1, 0)[:, :, None], axis=2)[:, :, 0],
            0,
        )
        blk_idx_safe = jnp.minimum(sup_safe * subs + sub_safe, nb - 1)
        return blk_idx_safe, prior, count_full

    def s_step(i, carry):
        bc, acc = carry
        b, p, c = scan3(bc + (acc * 1e-30).astype(jnp.int32))
        return bc, acc + b[0, 0].astype(jnp.float32) * 1e-9 + p[0, 0].astype(jnp.float32) * 1e-9

    timeit_chained(s_step, (block_counts, jnp.float32(0)), label="  3-level scan -> blk_idx/prior")

    blk_idx_safe, prior, count_full = scan3(block_counts)

    # --- stage 3a: rows gather + bits + cumsum (current) ------------------
    packed_aabb = (
        (jnp.where(valid, tx0, 255.0).astype(jnp.int32) << 24)
        | (tx1.astype(jnp.int32) << 16)
        | (ty0.astype(jnp.int32) << 8)
        | ty1.astype(jnp.int32)
    )
    aabb_blocks = packed_aabb.reshape(1, nb, BLK)

    def bits_current(blk_idx_safe, prior):
        rows = jnp.take_along_axis(aabb_blocks, blk_idx_safe[:, :, None], axis=1)
        tile_tx = (jnp.arange(T, dtype=jnp.int32) % T_X)[:, None, None]
        tile_ty = (jnp.arange(T, dtype=jnp.int32) // T_X)[:, None, None]
        bits = (
            (((rows >> 24) & 0xFF) <= tile_tx)
            & (tile_tx <= ((rows >> 16) & 0xFF))
            & (((rows >> 8) & 0xFF) <= tile_ty)
            & (tile_ty <= (rows & 0xFF))
        )
        local_cum = jnp.cumsum(bits.astype(jnp.int32), axis=2)
        needed = (ks[None, :] - prior + 1)[:, :, None]
        pos = jnp.sum(local_cum < needed, axis=2, dtype=jnp.int32)
        return blk_idx_safe * BLK + pos

    def b_step(i, carry):
        bi, acc = carry
        idx = bits_current(bi + (acc * 1e-30).astype(jnp.int32), prior)
        return bi, acc + idx[0, 0].astype(jnp.float32) * 1e-9

    timeit_chained(b_step, (blk_idx_safe, jnp.float32(0)), label="  rows gather+bits+cumsum (current)")

    # --- stage 3b: u16 bitmask variant -------------------------------------
    # mask chunks: (T, nc) u16 where chunk g covers gaussians 16g..16g+15
    CH = 16
    nc = n // CH
    tile_col = jnp.arange(T_X, dtype=jnp.float32)
    tile_row = jnp.arange(T_Y, dtype=jnp.float32)
    in_x = (tile_col[None] >= tx0[:, None]) & (tile_col[None] <= tx1[:, None]) & valid[:, None]
    in_y = (tile_row[None] >= ty0[:, None]) & (tile_row[None] <= ty1[:, None])
    w = (2.0 ** jnp.arange(CH, dtype=jnp.float32))  # fold weights into in_y

    def build_masks(eps=0.0):
        wy = in_y.reshape(nc, CH, T_Y).astype(jnp.float32) * (w[None, :, None] + eps)
        mx = in_x.reshape(nc, CH, T_X).astype(jnp.float32)
        chunk = jnp.einsum("gjy,gjx->gyx", wy, mx,
                           preferred_element_type=jnp.float32)  # exact < 2^16
        return chunk.reshape(nc, T).T.astype(jnp.int32)  # (T, nc)

    def m_step(i, carry):
        t0_, acc = carry
        m = build_masks(acc * 1e-30)
        return t0_, acc + m[0, 0].astype(jnp.float32) * 1e-9

    timeit_chained(m_step, (tx0, jnp.float32(0)), label="  u16 mask build (einsum, contraction 16)")

    masks = build_masks()  # (T, nc) int32 holding u16 values

    def bits_mask(blk_idx_safe, prior):
        # gather the 8 chunks of the chosen 128-block: (T, K, 8)
        chunk0 = blk_idx_safe * (BLK // CH)
        gidx = chunk0[:, :, None] + jnp.arange(BLK // CH, dtype=jnp.int32)[None, None]
        rows = jnp.take_along_axis(
            masks[:, None, :], gidx.reshape(T, K * (BLK // CH))[:, None, :], axis=2
        ).reshape(T, K, BLK // CH)
        pc = jax.lax.population_count(rows)
        pc_cum = jnp.cumsum(pc, axis=2)  # (T, K, 8)
        needed = (ks[None, :] - prior + 1)[:, :, None]  # q, 1-based
        chunk_i = jnp.sum(pc_cum < needed, axis=2, dtype=jnp.int32)  # (T, K)
        chunk_safe = jnp.minimum(chunk_i, BLK // CH - 1)
        before = jnp.where(
            chunk_safe > 0,
            jnp.take_along_axis(pc_cum, jnp.maximum(chunk_safe - 1, 0)[:, :, None], axis=2)[:, :, 0],
            0,
        )
        rem = needed[:, :, 0] - before  # 1-based rank within chunk
        the_chunk = jnp.take_along_axis(rows, chunk_safe[:, :, None], axis=2)[:, :, 0]
        # rank-th set bit of a u16: cumsum of bits over 16 lanes
        bit = (the_chunk[:, :, None] >> jnp.arange(CH, dtype=jnp.int32)[None, None]) & 1
        bit_cum = jnp.cumsum(bit, axis=2)
        bpos = jnp.sum(bit_cum < rem[:, :, None], axis=2, dtype=jnp.int32)
        return blk_idx_safe * BLK + chunk_safe * CH + bpos

    def bm_step(i, carry):
        bi, acc = carry
        idx = bits_mask(bi + (acc * 1e-30).astype(jnp.int32), prior)
        return bi, acc + idx[0, 0].astype(jnp.float32) * 1e-9

    timeit_chained(bm_step, (blk_idx_safe, jnp.float32(0)), label="  u16-mask gather+rank (variant)")

    # parity check
    ref = bits_current(blk_idx_safe, prior)
    alt = bits_mask(blk_idx_safe, prior)
    in_range = ks[None, :] < count_full[:, None]
    ok = bool(jnp.all(jnp.where(in_range, ref == alt, True)))
    print(f"  mask-variant parity: {ok}")

    # --- bwd: scatter-add vs sort+segment-sum ------------------------------
    rng = np.random.default_rng(1)
    A = 16
    g = jnp.asarray(rng.normal(size=(T, K, A)), jnp.float32)
    gids = jnp.asarray(
        np.sort(rng.integers(0, n, size=(T, K)), axis=1), jnp.int32
    )

    def scat_step(i, carry):
        gg, acc = carry
        out = jnp.zeros((n + 1, A), jnp.float32).at[gids.reshape(-1)].add(
            (gg + acc * 1e-9).reshape(-1, A)
        )
        return gg, acc + out[0, 0] * 1e-9

    timeit_chained(scat_step, (g, jnp.float32(0)), label=f"bwd scatter-add ({T*K}x{A} -> {n})")

    # cost-model probes: does scatter cost scale with row width? with the
    # indices_are_sorted hint?
    gids_flat_sorted = jnp.sort(gids.reshape(-1))

    def scat1_step(i, carry):
        gg, acc = carry
        out = jnp.zeros((n + 1,), jnp.float32).at[gids.reshape(-1)].add(
            gg[:, :, 0].reshape(-1) + acc * 1e-9
        )
        return gg, acc + out[0] * 1e-9

    timeit_chained(scat1_step, (g, jnp.float32(0)), label=f"bwd scatter-add scalar ({T*K} -> {n})")

    def scats_step(i, carry):
        gg, acc = carry
        zeros = jnp.zeros((n + 1, A), jnp.float32)
        out = jax.lax.scatter_add(
            zeros,
            gids_flat_sorted[:, None],
            (gg + acc * 1e-9).reshape(-1, A),
            jax.lax.ScatterDimensionNumbers(
                update_window_dims=(1,),
                inserted_window_dims=(0,),
                scatter_dims_to_operand_dims=(0,),
            ),
            indices_are_sorted=True,
        )
        return gg, acc + out[0, 0] * 1e-9

    timeit_chained(scats_step, (g, jnp.float32(0)), label="bwd scatter-add sorted-indices hint")

    def sortseg_step(i, carry):
        gg, acc = carry
        flat_ids = gids.reshape(-1)
        flat = (gg + acc * 1e-9).reshape(-1, A)
        ops = (flat_ids,) + tuple(flat[:, j] for j in range(A))
        sorted_ops = jax.lax.sort(ops, dimension=0, num_keys=1)
        sid = sorted_ops[0]
        payload = jnp.stack(sorted_ops[1:], -1)  # (M, A)
        csum = jnp.cumsum(payload, axis=0)
        # boundary of each segment: last row with this id
        m = sid.shape[0]
        is_last = jnp.concatenate([sid[1:] != sid[:-1], jnp.ones((1,), bool)])
        seg_tot = jnp.zeros((n + 1, A), jnp.float32).at[sid].add(
            jnp.where(is_last[:, None], csum, 0.0)
        )  # still a scatter but only boundary rows carry values — same cost?
        return gg, acc + seg_tot[0, 0] * 1e-9

    timeit_chained(sortseg_step, (g, jnp.float32(0)), label="bwd sort+cumsum+boundary-scatter")


if __name__ == "__main__":
    main()
