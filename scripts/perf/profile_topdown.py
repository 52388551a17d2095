"""Stage profile of the topdown query at 1M Gaussians (whole-map view:
bucket = full capacity). Chained methodology as profile_chain2.py."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import build_map


def timeit_chained(stage_fn, init, n=10, label="", prev=0.0):
    @jax.jit
    def run(init):
        def body(i, acc):
            return acc + stage_fn(init, acc * 1e-30) * 1e-20

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(np.asarray(run(init)))
    t0 = time.perf_counter()
    float(np.asarray(run(init)))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label:52s} {dt:8.3f} ms   (+{dt - prev:7.3f})", flush=True)
    return dt


def main():
    n_g = int(os.environ.get("BENCH_GAUSSIANS", 1_000_000))
    buf, _, _, _, cfg = build_map(n_g, 256, 256)

    from activesplat_tpu.queries.topdown import (
        TOPDOWN_SCALE_MODIFIER,
        render_topdown,
        topdown_camera,
        topdown_config_from_bbox,
    )
    from activesplat_tpu.ops.projection import project_gaussians
    from activesplat_tpu.ops.raster_tiled import TILE, bin_gaussians
    from activesplat_tpu.ops.render import render_jit

    bbox = np.array([[0.0, 10.0], [0.0, 3.0], [0.0, 6.0]])
    td = topdown_config_from_bbox(bbox, agent_foot=0.0, agent_head=1.5,
                                  pixel_max=360)
    cam = topdown_camera(td)
    print(f"device={jax.devices()[0].platform} n={n_g} grid={td.grid_shape}")
    p = buf.params

    # full query (two renders + host post)
    def full_query():
        t0 = time.perf_counter()
        render_topdown(buf, td)
        return (time.perf_counter() - t0) * 1000

    full_query()
    print(f"{'render_topdown (2 renders, host)':52s} {full_query():8.3f} ms",
          flush=True)

    def one_render(params, eps):
        import dataclasses as dc
        out = render_jit(
            buf.replace(params=dc.replace(params, means3d=params.means3d + eps)),
            cam, scale_modifier=TOPDOWN_SCALE_MODIFIER, chunk=cfg.chunk,
            k_per_tile=cfg.k_per_tile, backend="pallas",
        )
        return out.alpha[0, 0]

    t_r = timeit_chained(one_render, p, label="one topdown render (device)")

    def proj(params, eps):
        pr = project_gaussians(
            params.means3d + eps, params.quats, params.log_scales, buf.active,
            cam.w2c, cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
            near=cam.near, far=cam.far,
            scale_modifier=TOPDOWN_SCALE_MODIFIER,
        )
        return pr.mean2d[0, 0]

    t_p = timeit_chained(proj, p, label="projection")

    def proj_sort(params, eps):
        pr = project_gaussians(
            params.means3d + eps, params.quats, params.log_scales, buf.active,
            cam.w2c, cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
            near=cam.near, far=cam.far,
            scale_modifier=TOPDOWN_SCALE_MODIFIER,
        )
        n = pr.mean2d.shape[0]
        sg = jax.lax.stop_gradient
        scale = 16.0
        lim = float(2**15 - 2)
        qx = jnp.clip(jnp.round(sg(pr.mean2d[:, 0]) * scale), -lim, lim).astype(jnp.int32)
        qy = jnp.clip(jnp.round(sg(pr.mean2d[:, 1]) * scale), -lim, lim).astype(jnp.int32)
        packed_xy = (qx << 16) | (qy & 0xFFFF)
        val_rad = jnp.where(pr.valid, sg(pr.radius), -1.0)
        key = jnp.where(pr.valid, pr.depth, jnp.inf)
        out = jax.lax.sort(
            (sg(key), packed_xy, val_rad, jnp.arange(n, dtype=jnp.int32)),
            dimension=0, num_keys=1,
        )
        return out[2][0]

    t_s = timeit_chained(proj_sort, p, label="projection + packed sort",
                         prev=t_p)

    def proj_sort_bin(params, eps):
        pr = project_gaussians(
            params.means3d + eps, params.quats, params.log_scales, buf.active,
            cam.w2c, cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
            near=cam.near, far=cam.far,
            scale_modifier=TOPDOWN_SCALE_MODIFIER,
        )
        n = pr.mean2d.shape[0]
        sg = jax.lax.stop_gradient
        scale = 16.0
        lim = float(2**15 - 2)
        qx = jnp.clip(jnp.round(sg(pr.mean2d[:, 0]) * scale), -lim, lim).astype(jnp.int32)
        qy = jnp.clip(jnp.round(sg(pr.mean2d[:, 1]) * scale), -lim, lim).astype(jnp.int32)
        packed_xy = (qx << 16) | (qy & 0xFFFF)
        val_rad = jnp.where(pr.valid, sg(pr.radius), -1.0)
        key = jnp.where(pr.valid, pr.depth, jnp.inf)
        _, s_xy, s_vr, order = jax.lax.sort(
            (sg(key), packed_xy, val_rad, jnp.arange(n, dtype=jnp.int32)),
            dimension=0, num_keys=1,
        )
        s_mx = (s_xy >> 16).astype(jnp.float32) / scale
        s_my = (((s_xy & 0xFFFF) ^ 0x8000) - 0x8000).astype(jnp.float32) / scale
        s_val = s_vr >= 0.0
        s_rad = jnp.maximum(s_vr, 0.0) + 2.0 / scale
        lists = bin_gaussians(s_mx[:, None] * jnp.ones((1, 2)) * 0 +
                              jnp.stack([s_mx, s_my], -1),
                              s_rad, s_val, cam.width, cam.height,
                              cfg.k_per_tile)
        return lists.indices[0, 0].astype(jnp.float32)

    timeit_chained(proj_sort_bin, p, label="projection + sort + bin @1M",
                   prev=t_s)
    # visible under the topdown camera
    pr = project_gaussians(
        p.means3d, p.quats, p.log_scales, buf.active,
        cam.w2c, cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
        near=cam.near, far=cam.far, scale_modifier=TOPDOWN_SCALE_MODIFIER,
    )
    print("visible:", int(np.asarray(jnp.sum(pr.valid.astype(jnp.int32)))))


if __name__ == "__main__":
    main()
