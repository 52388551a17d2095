"""Stage profile of the forward-only render at 1M Gaussians (the
render-FPS headline). Chained-in-program methodology as profile_chain2.py."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import build_map


def timeit_chained(stage_fn, init, n=20, label="", prev=0.0):
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
    width = height = int(os.environ.get("BENCH_RES", 256))
    buf, cam, rgb, depth, cfg = build_map(n_g, width, height)
    print(f"device={jax.devices()[0].platform} n={n_g} res={width} "
          f"k={cfg.k_per_tile} capacity={buf.params.means3d.shape[0]}")

    from activesplat_tpu.ops.projection import project_gaussians
    from activesplat_tpu.ops.render import render

    p = buf.params

    def real_render(params, eps):
        import dataclasses as dc
        out = render(
            buf.replace(params=dc.replace(params, means3d=params.means3d + eps)),
            cam, chunk=cfg.chunk, k_per_tile=cfg.k_per_tile, backend="pallas",
        )
        return out.rgb[0, 0, 0]

    t_r = timeit_chained(real_render, p, label="REAL render fwd (pallas)")

    def proj_only(params, eps):
        pr = project_gaussians(
            params.means3d + eps, params.quats, params.log_scales, buf.active,
            cam.w2c, cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
            near=cam.near, far=cam.far,
        )
        return pr.mean2d[0, 0]

    t_p = timeit_chained(proj_only, p, label="projection only")

    def proj_sort(params, eps):
        pr = project_gaussians(
            params.means3d + eps, params.quats, params.log_scales, buf.active,
            cam.w2c, cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
            near=cam.near, far=cam.far,
        )
        n = pr.mean2d.shape[0]
        key = jnp.where(pr.valid, pr.depth, jnp.inf)
        sg = jax.lax.stop_gradient
        out = jax.lax.sort(
            (sg(key), sg(pr.mean2d[:, 0]), sg(pr.mean2d[:, 1]), sg(pr.radius),
             pr.valid.astype(jnp.float32), jnp.arange(n, dtype=jnp.int32)),
            dimension=0, num_keys=1,
        )
        return out[1][0]

    timeit_chained(proj_sort, p, label="projection + 6-op sort", prev=t_p)

    # how many are visible? (drives the prefix bucket)
    pr = project_gaussians(
        p.means3d, p.quats, p.log_scales, buf.active,
        cam.w2c, cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
        near=cam.near, far=cam.far,
    )
    print("visible:", int(np.asarray(jnp.sum(pr.valid.astype(jnp.int32)))))


if __name__ == "__main__":
    main()
