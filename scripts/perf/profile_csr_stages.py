"""Stage-level microbenchmark of rasterize_tiled_exact on the 877k map's
topdown 'full' view: construction (sort prep + expansion), attribute gather,
and the segmented blend kernel, each timed in isolation on TPU.
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import jax
import jax.numpy as jnp

from activesplat_tpu.io.params_io import load_params, buffer_from_params
from activesplat_tpu.ops.projection import project_gaussians
from activesplat_tpu.ops.raster_pallas import CSEG, N_ATTR, blend_csr_pallas
from activesplat_tpu.ops.raster_tiled import TILE
from activesplat_tpu.queries.topdown import (
    TOPDOWN_SCALE_MODIFIER,
    topdown_camera,
    topdown_config_from_bbox,
)

PARAMS = os.environ.get(
    "PROFILE_PARAMS", "/root/repo/episodes/r03_exact/gaussians_data/params.npz"
)
BUDGET = int(os.environ.get("PROFILE_BUDGET", "0"))


_checksum = jax.jit(
    lambda o: jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32)), o, jnp.float32(0)
    )
)


def timed(fn, *args, reps=5, label=""):
    out = fn(*args)
    float(np.asarray(_checksum(out)))  # force completion without bulk fetch
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        float(np.asarray(_checksum(out)))
    print(f"  {label}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms", flush=True)
    return out


def main():
    params = load_params(PARAMS)
    buf = buffer_from_params(params)
    m = params["means3D"]
    bbox = np.stack([m.min(0), m.max(0)], -1)
    foot = float(np.percentile(m[:, 1], 2.0))
    cfg = topdown_config_from_bbox(bbox, foot, foot + 1.35, pixel_max=360)
    cam = topdown_camera(cfg)
    width, height = cfg.width, cfg.height
    tiles_x, tiles_y = -(-width // TILE), -(-height // TILE)
    t = tiles_x * tiles_y
    n = buf.params.means3d.shape[0]
    e = -(-(BUDGET or 4 * n) // CSEG) * CSEG
    print(f"backend={jax.default_backend()} n={n} t={t} e={e}")

    @jax.jit
    def proj_fn(buf):
        p = buf.params
        return project_gaussians(
            p.means3d, p.quats, p.log_scales, buf.active,
            cam.w2c, cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
            near=cam.near, far=cam.far, scale_modifier=TOPDOWN_SCALE_MODIFIER,
        )

    proj = timed(proj_fn, buf, label="projection")

    @jax.jit
    def sort_prep(proj, valid):
        key = jnp.where(valid, proj.depth, jnp.inf)
        scale = 8.0
        lim = float(2**15 - 2)
        qx = jnp.clip(jnp.round(proj.mean2d[:, 0] * scale), -lim, lim).astype(jnp.int32)
        qy = jnp.clip(jnp.round(proj.mean2d[:, 1] * scale), -lim, lim).astype(jnp.int32)
        packed_xy = (qx << 16) | (qy & 0xFFFF)
        val_rad = jnp.where(valid, proj.radius, -1.0)
        _, s_xy, s_vr, order = jax.lax.sort(
            (key, packed_xy, val_rad, jnp.arange(n, dtype=jnp.int32)),
            dimension=0, num_keys=1,
        )
        s_mx = (s_xy >> 16).astype(jnp.float32) / scale
        s_my = (((s_xy & 0xFFFF) ^ 0x8000) - 0x8000).astype(jnp.float32) / scale
        s_val = s_vr >= 0.0
        s_rad = jnp.maximum(s_vr, 0.0) + 2.0 / scale
        return s_mx, s_my, s_rad, s_val, order

    s_mx, s_my, s_rad, s_val, order = timed(sort_prep, proj, proj.valid, label="depth sort")

    @functools.partial(jax.jit, static_argnames=())
    def expansion(s_mx, s_my, s_rad, s_val):
        inside = (
            (s_mx + s_rad >= 0.0) & (s_mx - s_rad < tiles_x * TILE)
            & (s_my + s_rad >= 0.0) & (s_my - s_rad < tiles_y * TILE)
        )
        sv = s_val & inside
        tx0 = jnp.clip(jnp.floor((s_mx - s_rad) / TILE), 0, tiles_x - 1).astype(jnp.int32)
        tx1 = jnp.clip(jnp.floor((s_mx + s_rad) / TILE), 0, tiles_x - 1).astype(jnp.int32)
        ty0 = jnp.clip(jnp.floor((s_my - s_rad) / TILE), 0, tiles_y - 1).astype(jnp.int32)
        ty1 = jnp.clip(jnp.floor((s_my + s_rad) / TILE), 0, tiles_y - 1).astype(jnp.int32)
        w_g = tx1 - tx0 + 1
        h_g = ty1 - ty0 + 1
        span = jnp.where(sv, w_g * h_g, 0)
        g_off = jnp.cumsum(span) - span
        m_total = g_off[-1] + span[-1]
        kept = (g_off + span) <= e
        sv = sv & kept
        tile_col = jnp.arange(tiles_x, dtype=jnp.int32)
        tile_row = jnp.arange(tiles_y, dtype=jnp.int32)
        in_x = ((tile_col[None] >= tx0[:, None]) & (tile_col[None] <= tx1[:, None]) & sv[:, None])
        in_y = (tile_row[None] >= ty0[:, None]) & (tile_row[None] <= ty1[:, None])
        count_full = jnp.einsum(
            "ny,nx->yx", in_y.astype(jnp.int8), in_x.astype(jnp.int8),
            preferred_element_type=jnp.int32,
        ).reshape(t)
        e_idx = jnp.arange(e, dtype=jnp.int32)
        marks = jnp.zeros((e,), jnp.int32).at[g_off].add(1, mode="drop")
        gid = jnp.cumsum(marks) - 1
        is_first = jnp.concatenate([jnp.ones((1,), bool), gid[1:] != gid[:-1]])
        run_start = jax.lax.cummax(jnp.where(is_first, e_idx, 0))
        local = e_idx - run_start
        pga = (tx0 << 16) | (ty0 << 8) | (w_g - 1)
        pv = pga[gid]
        ew = (pv & 0xFF) + 1
        dx = local % ew
        dy = local // ew
        tile_of = ((pv >> 8) & 0xFF) * tiles_x + dy * tiles_x + ((pv >> 16) & 0xFF) + dx
        m_kept = jnp.max(jnp.where(kept, g_off + span, 0))
        valid_entry = e_idx < m_kept
        entry_key = jnp.where(valid_entry, tile_of, t)
        gid_e = jnp.where(valid_entry, gid, n)
        return entry_key, gid_e, count_full

    entry_key, gid_e, count_full = timed(expansion, s_mx, s_my, s_rad, s_val, label="expansion")

    pad_flat = t * (CSEG - 1)
    e_tot = -(-(e + pad_flat) // CSEG) * CSEG

    @jax.jit
    def sort_entries(entry_key, gid_e, count_full):
        pad_needed = (-count_full) % CSEG
        pj = jnp.arange(CSEG - 1, dtype=jnp.int32)
        pad_key = jnp.where(
            pj[None, :] < pad_needed[:, None],
            jnp.arange(t, dtype=jnp.int32)[:, None], t,
        ).reshape(-1)
        keys_all = jnp.concatenate([entry_key, pad_key])
        gid_all = jnp.concatenate([gid_e, jnp.full(pad_key.shape, n, jnp.int32)])
        extra = e_tot - keys_all.shape[0]
        if extra:
            keys_all = jnp.concatenate([keys_all, jnp.full((extra,), t, jnp.int32)])
            gid_all = jnp.concatenate([gid_all, jnp.full((extra,), n, jnp.int32)])
        return jax.lax.sort((keys_all, gid_all), dimension=0, is_stable=True, num_keys=1)

    sorted_key, sorted_gid = timed(sort_entries, entry_key, gid_e, count_full, label="tile sort")

    @jax.jit
    def gather(sorted_gid, order, buf, proj):
        p = buf.params
        opacity = jax.nn.sigmoid(p.logit_opacities)
        zc = proj.depth
        colors = jnp.concatenate([p.rgb, zc[:, None], (zc * zc)[:, None]], -1)
        data = jnp.concatenate([proj.mean2d, proj.conic, opacity[:, None], colors], -1)
        pad_row = jnp.concatenate(
            [jnp.full((1, 2), -1e9), jnp.ones((1, 3)), jnp.zeros((1, 6))], -1)
        pad_data = jnp.concatenate([data, pad_row], 0)
        global_ids = jnp.where(sorted_gid >= n, n, order[jnp.minimum(sorted_gid, n - 1)])
        return jnp.pad(pad_data[global_ids], ((0, 0), (0, N_ATTR - 11)))

    entry_data = timed(gather, sorted_gid, order, buf, proj, label="attr gather")

    @jax.jit
    def segmaps(sorted_key):
        seg_tile = sorted_key[::CSEG]
        in_grid = seg_tile < t
        su = jnp.where(in_grid, (seg_tile % tiles_x) * TILE, 0)
        sv2 = jnp.where(in_grid, (seg_tile // tiles_x) * TILE, 0)
        return seg_tile, su, sv2

    seg_tile, su, sv2 = timed(segmaps, sorted_key, label="segmaps")

    blend = functools.partial(blend_csr_pallas, n_tiles=t, n_channels=5, interpret=False)
    timed(blend, entry_data, seg_tile, su, sv2, label="csr blend kernel")


if __name__ == "__main__":
    main()
