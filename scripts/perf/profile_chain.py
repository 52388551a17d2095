"""Incremental-prefix timing of the tiled rasterize/optimize pipeline.

Times pipeline PREFIXES, each as n chained reps inside ONE jitted program
(fori_loop, data-dependent carry), so relay dispatch overhead amortizes away;
stage cost = difference between consecutive prefixes. Value-fetch sync
(CLAUDE.md: block_until_ready is unreliable through the axon relay)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp

from bench import build_map


def timeit_prefix(stage_fn, buf, cam, n=30, label="", prev=0.0):
    """stage_fn(params, eps) -> scalar; eps serializes iterations."""

    @jax.jit
    def run(params):
        def body(i, acc):
            return acc + stage_fn(params, acc * 1e-30) * 1e-20

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    out = run(buf.params)
    float(np.asarray(out))
    t0 = time.perf_counter()
    float(np.asarray(run(buf.params)))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label:46s} {dt:8.3f} ms   (+{dt - prev:7.3f})")
    return dt


def main():
    n_g = int(os.environ.get("BENCH_GAUSSIANS", 200_000))
    width = height = int(os.environ.get("BENCH_RES", 256))
    buf, cam, rgb, depth, cfg = build_map(n_g, width, height)
    k_per_tile = cfg.k_per_tile
    print(f"device={jax.devices()[0].platform} n={n_g} res={width} k={k_per_tile}")

    from activesplat_tpu.mapper.adam import AdamState
    from activesplat_tpu.mapper.step import mapping_iteration, mapping_loss
    from activesplat_tpu.ops.projection import project_gaussians
    from activesplat_tpu.ops.raster_pallas import SEG, blend_tiles, blend_tiles_pallas
    from activesplat_tpu.ops.raster_tiled import TILE, bin_gaussians, _prefix_buckets

    def proj(params, eps):
        p = project_gaussians(
            params.means3d + eps, params.quats, params.log_scales, buf.active,
            cam.w2c, cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
            near=cam.near, far=cam.far,
        )
        return p.mean2d[0, 0]

    t = timeit_prefix(proj, buf, cam, label="projection")

    # full pipeline pieces, mirroring rasterize_tiled at the real bucket
    def pipeline(params, eps, upto):
        p = project_gaussians(
            params.means3d + eps, params.quats, params.log_scales, buf.active,
            cam.w2c, cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
            near=cam.near, far=cam.far,
        )
        opac = jax.nn.sigmoid(params.logit_opacities)
        depth_ch = p.depth
        colors = jnp.concatenate(
            [params.rgb, depth_ch[:, None], (depth_ch * depth_ch)[:, None]], -1
        )
        n = p.mean2d.shape[0]
        key = jnp.where(p.valid, p.depth, jnp.inf)
        sg = jax.lax.stop_gradient
        _, s_mx, s_my, s_rad, s_val, order = jax.lax.sort(
            (sg(key), sg(p.mean2d[:, 0]), sg(p.mean2d[:, 1]), sg(p.radius),
             p.valid.astype(jnp.float32), jnp.arange(n, dtype=jnp.int32)),
            dimension=0, num_keys=1,
        )
        if upto == "sort":
            return s_mx[0]
        b = 65536  # the bucket this scene actually hits
        lists = bin_gaussians(
            jnp.stack([s_mx[:b], s_my[:b]], -1), s_rad[:b], s_val[:b] > 0,
            width, height, k_per_tile,
        )
        if upto == "bin":
            return lists.indices[0, 0].astype(jnp.float32)
        global_ids = jnp.where(
            lists.indices >= b, n, order[jnp.minimum(lists.indices, n - 1)]
        )
        pad_mean = jnp.concatenate([p.mean2d, jnp.full((1, 2), -1e9, jnp.float32)], 0)
        pad_conic = jnp.concatenate([p.conic, jnp.ones((1, 3), jnp.float32)], 0)
        pad_op = jnp.concatenate([opac, jnp.zeros((1,), jnp.float32)], 0)
        pad_col = jnp.concatenate([colors, jnp.zeros((1, 5), jnp.float32)], 0)
        data = jnp.concatenate(
            [pad_mean, pad_conic, pad_op[:, None], pad_col,
             jnp.zeros((n + 1, 16 - 6 - 5), jnp.float32)], -1,
        )
        tile_data = data[global_ids]
        if upto == "gather":
            return tile_data[0, 0, 0]
        tiles_x = width // TILE
        tile_ids = jnp.arange((width // TILE) * (height // TILE))
        tile_u0 = ((tile_ids % tiles_x) * TILE).astype(jnp.int32)
        tile_v0 = ((tile_ids // tiles_x) * TILE).astype(jnp.int32)
        accum, logt = blend_tiles_pallas(tile_data, tile_u0, tile_v0, 5, False)
        return accum[0, 0, 0]

    t_s = timeit_prefix(lambda q, e: pipeline(q, e, "sort"), buf, cam,
                        label="+ multi-operand sort", prev=t)
    t_b = timeit_prefix(lambda q, e: pipeline(q, e, "bin"), buf, cam,
                        label="+ bin_gaussians", prev=t_s)
    t_g = timeit_prefix(lambda q, e: pipeline(q, e, "gather"), buf, cam,
                        label="+ tile_data gather", prev=t_b)
    t_f = timeit_prefix(lambda q, e: pipeline(q, e, "blend"), buf, cam,
                        label="+ pallas blend fwd", prev=t_g)

    def loss_fwd(params, eps):
        l, _ = mapping_loss(params, buf, cam, rgb + eps, depth, cfg)
        return l

    t_l = timeit_prefix(loss_fwd, buf, cam, label="full loss fwd", prev=t_f)

    def loss_bwd(params, eps):
        g = jax.grad(lambda q: mapping_loss(q, buf, cam, rgb + eps, depth, cfg)[0])(params)
        return g.means3d[0, 0]

    t_gb = timeit_prefix(loss_bwd, buf, cam, label="loss fwd+bwd", prev=t_l)

    opt = AdamState.init(buf.params)

    @jax.jit
    def full(buf, opt):
        def body(i, c):
            b, o = c
            b, o, m = mapping_iteration(b, o, cam, rgb, depth, cfg)
            return (b, o)
        return jax.lax.fori_loop(0, 30, body, (buf, opt))

    out = full(buf, opt)
    float(np.asarray(out[0].params.means3d[0, 0]))
    t0 = time.perf_counter()
    out = full(buf, opt)
    float(np.asarray(out[0].params.means3d[0, 0]))
    dt = (time.perf_counter() - t0) / 30 * 1000
    print(f"{'full mapping_iteration (chained)':46s} {dt:8.3f} ms   (+{dt - t_gb:7.3f})")


if __name__ == "__main__":
    main()
