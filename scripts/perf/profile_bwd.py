"""Decompose the mapping backward pass: chained VJP timings of each
differentiable stage (ssim, blend kernel, gather+blend, projection, full
loss). Methodology as profile_prims.py (one program, value-fetch sync)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import build_map


def timeit_chained(step, init, n=30, label=""):
    @jax.jit
    def run(init):
        return jax.lax.fori_loop(0, n, step, init)

    out = run(init)
    float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    out = run(init)
    float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label:52s} {dt:8.3f} ms")
    return dt


def main():
    n_g = int(os.environ.get("BENCH_GAUSSIANS", 200_000))
    width = height = int(os.environ.get("BENCH_RES", 256))
    buf, cam, rgb, depth, cfg = build_map(n_g, width, height)
    print(f"device={jax.devices()[0].platform} n={n_g} res={width}")

    from activesplat_tpu.mapper.step import mapping_loss
    from activesplat_tpu.ops.projection import project_gaussians
    from activesplat_tpu.ops.raster_pallas import blend_tiles
    from activesplat_tpu.ops.ssim import ssim

    rng = np.random.default_rng(0)

    # --- ssim fwd / vjp ---
    a = jnp.asarray(rng.uniform(0, 1, (height, width, 3)), jnp.float32)

    def ssim_fwd(i, carry):
        x, acc = carry
        return x, acc + ssim(x + acc * 1e-30, a)

    timeit_chained(ssim_fwd, (a, jnp.float32(0)), label="ssim fwd")

    def ssim_vjp(i, carry):
        x, acc = carry
        g = jax.grad(lambda y: ssim(y, a))(x + acc * 1e-30)
        return x, acc + g[0, 0, 0]

    timeit_chained(ssim_vjp, (a, jnp.float32(0)), label="ssim fwd+bwd")

    # --- blend kernel fwd / vjp with fixed tile_data ---
    T, K = (width // 16) * (height // 16), cfg.k_per_tile
    tile_data = jnp.asarray(rng.normal(size=(T, K, 16)), jnp.float32)
    tiles_x = width // 16
    tile_ids = np.arange(T)
    u0 = jnp.asarray((tile_ids % tiles_x) * 16, jnp.int32)
    v0 = jnp.asarray((tile_ids // tiles_x) * 16, jnp.int32)

    def blend_fwd(i, carry):
        td, acc = carry
        accum, logt = blend_tiles(td + acc * 1e-30, u0, v0, 5, False)
        return td, acc + accum[0, 0, 0]

    timeit_chained(blend_fwd, (tile_data, jnp.float32(0)), label="blend kernel fwd")

    def blend_vjp(i, carry):
        td, acc = carry
        g = jax.grad(
            lambda d: blend_tiles(d, u0, v0, 5, False)[0].sum()
        )(td + acc * 1e-30)
        return td, acc + g[0, 0, 0]

    timeit_chained(blend_vjp, (tile_data, jnp.float32(0)), label="blend kernel fwd+bwd")

    # --- projection vjp ---
    p = buf.params

    def proj_vjp(i, carry):
        m, acc = carry
        def f(means):
            pr = project_gaussians(
                means, p.quats, p.log_scales, buf.active, cam.w2c,
                cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
                near=cam.near, far=cam.far,
            )
            return pr.mean2d.sum() + pr.conic.sum() + pr.depth.sum()
        g = jax.grad(f)(m + acc * 1e-30)
        return m, acc + g[0, 0]

    timeit_chained(proj_vjp, (p.means3d, jnp.float32(0)), label="projection fwd+bwd")

    # --- full loss fwd+bwd (reference point) ---
    def loss_vjp(i, carry):
        m, acc = carry
        def f(means):
            params = p._replace(means3d=means) if hasattr(p, "_replace") else None
            import dataclasses as dc
            params = dc.replace(p, means3d=means)
            l, _ = mapping_loss(params, buf, cam, rgb, depth, cfg)
            return l
        g = jax.grad(f)(m + acc * 1e-30)
        return m, acc + g[0, 0]

    timeit_chained(loss_vjp, (p.means3d, jnp.float32(0)), label="full loss fwd+bwd (means only)")


if __name__ == "__main__":
    main()
