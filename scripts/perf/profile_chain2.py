"""Chained timing of the REAL render/loss path plus bucket-16384 pipeline
prefixes (the bench scene has ~7.8k visible -> bucket 16384, not 65536).
Methodology as profile_chain.py."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import build_map


def timeit_chained(stage_fn, init, n=30, label="", prev=0.0):
    @jax.jit
    def run(init):
        def body(i, acc):
            return acc + stage_fn(init, acc * 1e-30) * 1e-20

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(np.asarray(run(init)))
    t0 = time.perf_counter()
    float(np.asarray(run(init)))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label:52s} {dt:8.3f} ms   (+{dt - prev:7.3f})")
    return dt


def main():
    n_g = int(os.environ.get("BENCH_GAUSSIANS", 200_000))
    width = height = int(os.environ.get("BENCH_RES", 256))
    buf, cam, rgb, depth, cfg = build_map(n_g, width, height)
    print(f"device={jax.devices()[0].platform} n={n_g} res={width} k={cfg.k_per_tile}")

    from activesplat_tpu.mapper.step import mapping_loss
    from activesplat_tpu.ops.projection import project_gaussians
    from activesplat_tpu.ops.raster_pallas import blend_tiles_pallas
    from activesplat_tpu.ops.raster_tiled import TILE, bin_gaussians
    from activesplat_tpu.ops.render import render

    p = buf.params

    # real render fwd (pallas backend, real buckets)
    def real_render(params, eps):
        import dataclasses as dc
        out = render(
            buf.replace(params=dc.replace(params, means3d=params.means3d + eps)),
            cam, chunk=cfg.chunk, k_per_tile=cfg.k_per_tile, backend="pallas",
        )
        return out.rgb[0, 0, 0]

    t_r = timeit_chained(real_render, p, label="REAL render fwd (pallas)")

    # real loss fwd
    def real_loss(params, eps):
        import dataclasses as dc
        l, _ = mapping_loss(
            dc.replace(params, means3d=params.means3d + eps),
            buf, cam, rgb, depth, cfg,
        )
        return l

    t_l = timeit_chained(real_loss, p, label="REAL loss fwd", prev=t_r)

    # pipeline prefixes at the REAL bucket (16384)
    def pipeline(params, eps, upto):
        pr = project_gaussians(
            params.means3d + eps, params.quats, params.log_scales, buf.active,
            cam.w2c, cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
            near=cam.near, far=cam.far,
        )
        opac = jax.nn.sigmoid(params.logit_opacities)
        colors = jnp.concatenate(
            [params.rgb, pr.depth[:, None], (pr.depth ** 2)[:, None]], -1
        )
        n = pr.mean2d.shape[0]
        key = jnp.where(pr.valid, pr.depth, jnp.inf)
        sg = jax.lax.stop_gradient
        _, s_mx, s_my, s_rad, s_val, order = jax.lax.sort(
            (sg(key), sg(pr.mean2d[:, 0]), sg(pr.mean2d[:, 1]), sg(pr.radius),
             pr.valid.astype(jnp.float32), jnp.arange(n, dtype=jnp.int32)),
            dimension=0, num_keys=1,
        )
        if upto == "sort":
            return s_mx[0]
        b = 16384
        lists = bin_gaussians(
            jnp.stack([s_mx[:b], s_my[:b]], -1), s_rad[:b], s_val[:b] > 0,
            width, height, cfg.k_per_tile,
        )
        if upto == "bin":
            return lists.indices[0, 0].astype(jnp.float32)
        global_ids = jnp.where(
            lists.indices >= b, n, order[jnp.minimum(lists.indices, n - 1)]
        )
        pad_mean = jnp.concatenate([pr.mean2d, jnp.full((1, 2), -1e9, jnp.float32)], 0)
        pad_conic = jnp.concatenate([pr.conic, jnp.ones((1, 3), jnp.float32)], 0)
        pad_op = jnp.concatenate([opac, jnp.zeros((1,), jnp.float32)], 0)
        pad_col = jnp.concatenate([colors, jnp.zeros((1, 5), jnp.float32)], 0)
        data = jnp.concatenate(
            [pad_mean, pad_conic, pad_op[:, None], pad_col,
             jnp.zeros((n + 1, 5), jnp.float32)], -1,
        )
        tile_data = data[global_ids]
        if upto == "gather":
            return tile_data[0, 0, 0]
        tiles_x = width // TILE
        tile_ids = jnp.arange((width // TILE) * (height // TILE))
        u0 = ((tile_ids % tiles_x) * TILE).astype(jnp.int32)
        v0 = ((tile_ids // tiles_x) * TILE).astype(jnp.int32)
        accum, logt = blend_tiles_pallas(tile_data, u0, v0, 5, False)
        return accum[0, 0, 0]

    t_s = timeit_chained(lambda q, e: pipeline(q, e, "sort"), p,
                         label="prefix: proj+sort", prev=0)
    t_b = timeit_chained(lambda q, e: pipeline(q, e, "bin"), p,
                         label="prefix: + bin @16384", prev=t_s)
    t_g = timeit_chained(lambda q, e: pipeline(q, e, "gather"), p,
                         label="prefix: + gather", prev=t_b)
    t_f = timeit_chained(lambda q, e: pipeline(q, e, "blend"), p,
                         label="prefix: + blend fwd", prev=t_g)

    # real loss fwd+bwd
    def real_grad(params, eps):
        import dataclasses as dc
        g = jax.grad(
            lambda m: mapping_loss(
                dc.replace(params, means3d=m), buf, cam, rgb, depth, cfg
            )[0]
        )(params.means3d + eps)
        return g[0, 0]

    timeit_chained(real_grad, p, label="REAL loss fwd+bwd (d/means)", prev=t_l)


if __name__ == "__main__":
    main()
