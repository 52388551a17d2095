"""Per-stage timing of the tiled rasterize/optimize pipeline on the live
device. Times each piece jitted in a loop with a value-fetch sync (the axon
relay's block_until_ready is unreliable — CLAUDE.md)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import build_map


def timeit(fn, args, n=30, label=""):
    out = fn(*args)
    jax.tree.map(lambda x: float(np.asarray(x).reshape(-1)[0]), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree.map(lambda x: float(np.asarray(x).reshape(-1)[0]), out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label:42s} {dt:8.3f} ms")
    return dt


def main():
    n_g = int(os.environ.get("BENCH_GAUSSIANS", 200_000))
    width = height = int(os.environ.get("BENCH_RES", 256))
    k = int(os.environ.get("BENCH_K_PER_TILE", 256))
    buf, cam, rgb, depth, cfg = build_map(n_g, width, height)
    print(f"device={jax.devices()[0].platform} n={n_g} res={width} k={k}")

    from activesplat_tpu.mapper.adam import AdamState
    from activesplat_tpu.mapper.step import mapping_iteration, mapping_loss
    from activesplat_tpu.ops.projection import project_gaussians
    from activesplat_tpu.ops.raster_tiled import TILE, bin_gaussians, rasterize_tiled
    from activesplat_tpu.ops.raster_pallas import blend_tiles, blend_tiles_pallas

    opt = AdamState.init(buf.params)
    timeit(
        lambda *a: mapping_iteration(*a, cfg)[2]["loss"],
        (buf, opt, cam, rgb, depth),
        label="full mapping_iteration",
    )

    p = buf.params
    proj_fn = jax.jit(
        lambda p, act: project_gaussians(
            p.means3d, p.quats, p.log_scales, act, cam.w2c, cam.fx, cam.fy,
            cam.cx, cam.cy, cam.width, cam.height, near=cam.near, far=cam.far,
        )
    )
    timeit(proj_fn, (p, buf.active), label="projection")
    proj = proj_fn(p, buf.active)
    opac = jax.nn.sigmoid(p.logit_opacities)
    channels = jnp.concatenate(
        [p.rgb, proj.depth[:, None], (proj.depth**2)[:, None]], -1
    )

    def fwd(mean2d, conic, opac, channels, valid, radius, depth_, backend):
        return rasterize_tiled(
            mean2d, conic, opac, channels, valid, radius, depth_,
            width=width, height=height, k_per_tile=k, backend=backend,
        )

    args = (proj.mean2d, proj.conic, opac, channels, proj.valid, proj.radius, proj.depth)
    timeit(
        jax.jit(lambda *a: fwd(*a, "pallas")[0]), args, label="rasterize fwd (pallas)"
    )
    timeit(jax.jit(lambda *a: fwd(*a, "xla")[0]), args, label="rasterize fwd (xla)")

    def loss_pallas(mean2d, conic, opac, channels, valid, radius, depth_):
        accum, logt, _ = fwd(mean2d, conic, opac, channels, valid, radius, depth_, "pallas")
        return jnp.sum(accum) + jnp.sum(logt)

    grad_fn = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2, 3)))
    timeit(lambda *a: grad_fn(*a)[0], args, label="rasterize fwd+bwd (pallas)")

    # --- stage decomposition --------------------------------------------
    sg = jax.lax.stop_gradient
    n = proj.mean2d.shape[0]

    @jax.jit
    def sort_stage(mean2d, radius, valid, depth_):
        key = jnp.where(valid, depth_, jnp.inf)
        _, s_mx, s_my, s_rad, s_val, order = jax.lax.sort(
            (sg(key), sg(mean2d[:, 0]), sg(mean2d[:, 1]), sg(radius),
             valid.astype(mean2d.dtype), jnp.arange(n, dtype=jnp.int32)),
            dimension=0, num_keys=1,
        )
        return jnp.stack([s_mx, s_my, s_rad, s_val], -1), order

    timeit(
        lambda *a: sort_stage(*a)[0],
        (proj.mean2d, proj.radius, proj.valid, proj.depth),
        label="multi-operand depth sort",
    )
    packed, order = sort_stage(proj.mean2d, proj.radius, proj.valid, proj.depth)
    B = 65536  # typical visible-prefix bucket at 200k
    bin_fn = jax.jit(
        lambda pk: bin_gaussians(pk[:B, :2], pk[:B, 2], pk[:B, 3] > 0, width, height, k)
    )
    timeit(lambda pk: bin_fn(pk).indices, (packed,), label=f"bin_gaussians (B={B})")
    lists = bin_fn(packed)

    @jax.jit
    def gather_stage(mean2d, conic, opac, channels, order, indices):
        ids = jnp.where(indices >= B, n, order[jnp.minimum(indices, n - 1)])
        data = jnp.concatenate(
            [
                jnp.concatenate([mean2d, jnp.full((1, 2), -1e9, jnp.float32)], 0),
                jnp.concatenate([conic, jnp.ones((1, 3), jnp.float32)], 0),
                jnp.concatenate([opac[:, None], jnp.zeros((1, 1), jnp.float32)], 0),
                jnp.concatenate([channels, jnp.zeros((1, 5), jnp.float32)], 0),
                jnp.zeros((n + 1, 5), jnp.float32),
            ],
            -1,
        )
        return data[ids]

    timeit(
        gather_stage,
        (proj.mean2d, proj.conic, opac, channels, order, lists.indices),
        label="tile_data gather (T,K,16)",
    )
    tile_data = gather_stage(proj.mean2d, proj.conic, opac, channels, order, lists.indices)
    t_tiles = tile_data.shape[0]
    u0 = jnp.asarray((np.arange(t_tiles) % (width // TILE)) * TILE, jnp.int32)
    v0 = jnp.asarray((np.arange(t_tiles) // (width // TILE)) * TILE, jnp.int32)
    timeit(
        lambda td: blend_tiles_pallas(td, u0, v0, 5, False)[0],
        (tile_data,),
        label="pallas blend fwd only",
    )
    blend_grad = jax.jit(
        jax.grad(lambda td: jnp.sum(blend_tiles(td, u0, v0, 5, False)[0]))
    )
    timeit(blend_grad, (tile_data,), label="pallas blend fwd+bwd")

    @jax.jit
    def scatter_back(d_tile_data, order, indices):
        ids = jnp.where(indices >= B, n, order[jnp.minimum(indices, n - 1)])
        out = jnp.zeros((n + 1, 16), jnp.float32)
        return out.at[ids].add(d_tile_data)

    d_td = jnp.ones_like(tile_data)
    timeit(
        scatter_back, (d_td, order, lists.indices), label="bwd scatter-add (T,K,16)->(N,16)"
    )


if __name__ == "__main__":
    main()
