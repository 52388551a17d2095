"""Device-mesh sharding of the rasterize/optimize hot path.

The reference is a single-GPU system (SURVEY.md section 2.3: no DP/TP/PP).
The TPU rebuild's parallelism axis is *image space*: tile rasterization is
embarrassingly parallel across pixels, so the render shards image ROWS across
the mesh while the Gaussian buffer stays replicated (tens of MB — cheap), and
gradients of the replicated parameters are combined by the all_gather
transpose (reduce-scatter + replication) XLA inserts automatically.

Design notes (scaling-book recipe):
  * mesh: 1D ('px',) over all chips; collectives ride ICI.
  * forward: shard_map over row blocks; each shard renders its rows with a
    row-shifted principal point (identical math to a full-frame render);
    outputs are all_gathered so the loss (incl. the windowed SSIM, which
    crosses row boundaries) is computed replicated.
  * backward: jax.grad through shard_map — the all_gather transposes to
    psum_scatter, yielding the correct summed parameter gradients.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from activesplat_tpu.mapper.adam import AdamState, adam_update, lr_pytree
from activesplat_tpu.mapper.config import MapperConfig
from activesplat_tpu.models.gaussians import Camera, GaussianBuffer
from activesplat_tpu.ops.render import render
from activesplat_tpu.ops.ssim import psnr, ssim


def make_render_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("px",))


def mesh_for_height(height: int, devices=None):
    """Largest usable render mesh for an image height: the production path
    shards whole 16px tile rows, so use the biggest device count d with
    height % (d * TILE) == 0. Returns None when even 2 devices don't fit
    (callers fall back to single-device)."""
    from activesplat_tpu.ops.raster_tiled import TILE

    devices = devices if devices is not None else jax.devices()
    d = len(devices)
    while d > 1 and height % (d * TILE) != 0:
        d -= 1
    if d < 2:
        return None
    return make_render_mesh(devices[:d])


def render_sharded(
    buf: GaussianBuffer,
    cam: Camera,
    mesh: Mesh,
    bg: jnp.ndarray | None = None,
    chunk: int = 128,
):
    """Full-frame render with image rows sharded over mesh axis 'px';
    returns replicated (rgb, depth, alpha, radii, dropped=0). Differentiable.

    Projection + depth sort run replicated (O(N), cheap); only the per-pixel
    compositing — the dominant cost — is sharded, so results are bitwise
    identical to the single-device render.
    """
    from activesplat_tpu.ops.projection import project_gaussians
    from activesplat_tpu.ops.raster_xla import depth_sort, rasterize_sorted

    n_dev = mesh.shape["px"]
    assert cam.height % n_dev == 0, (
        f"image height {cam.height} must divide the mesh ({n_dev} devices)"
    )
    rows = cam.height // n_dev
    if bg is None:
        bg = jnp.zeros(3, jnp.float32)

    params = buf.params
    proj = project_gaussians(
        params.means3d,
        params.quats,
        params.log_scales,
        buf.active,
        cam.w2c,
        cam.fx,
        cam.fy,
        cam.cx,
        cam.cy,
        cam.width,
        cam.height,
        near=cam.near,
        far=cam.far,
    )
    opac = jax.nn.sigmoid(params.logit_opacities)
    channels = jnp.concatenate(
        [params.rgb, proj.depth[:, None], (proj.depth * proj.depth)[:, None]], -1
    )
    _, s_valid, s_mean2d, s_conic, s_opac, s_channels = depth_sort(
        proj.depth, proj.valid, proj.mean2d, proj.conic, opac, channels
    )

    def shard_fn(mean2d, conic, opacity, chans, valid, bg_rep):
        row0 = jax.lax.axis_index("px") * rows
        accum, log_t = rasterize_sorted(
            mean2d,
            conic,
            opacity,
            chans,
            valid,
            width=cam.width,
            height=rows,
            chunk=chunk,
            row_offset=row0,
        )
        t = jnp.exp(log_t)
        rgb = (accum[:, :3] + t[:, None] * bg_rep[None, :]).reshape(
            rows, cam.width, 3
        )
        depth = accum[:, 3].reshape(rows, cam.width)
        alpha = (1.0 - t).reshape(rows, cam.width)
        rgb = jax.lax.all_gather(rgb, "px", tiled=True)
        depth = jax.lax.all_gather(depth, "px", tiled=True)
        alpha = jax.lax.all_gather(alpha, "px", tiled=True)
        return rgb, depth, alpha

    rgb, depth, alpha = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(s_mean2d, s_conic, s_opac, s_channels, s_valid, bg)
    return rgb, depth, alpha, proj.radius, jnp.int32(0)


def render_sharded_tiled(
    buf: GaussianBuffer,
    cam: Camera,
    mesh: Mesh,
    bg: jnp.ndarray | None = None,
    k_per_tile: int = 256,
    backend: str = "xla",
    exact: bool = False,
    grad_exact: bool = False,
):
    """Tile-sharded production render: projection/sort replicated (O(N)),
    each device bins + blends its block of tile rows with the tiled
    rasterizer, outputs all_gathered; the k_per_tile overflow counters are
    psum'd so training sees the whole-frame drop count. Returns
    (rgb, depth, alpha, radii, dropped). Differentiable (grads of replicated
    params combine via the all_gather transpose).

    backend="pallas" runs the fused Pallas blend (with its analytic VJP)
    inside shard_map — interpret mode off-TPU, so the multichip dryrun
    covers Pallas-under-shard_map on the virtual CPU mesh.

    grad_exact=True composites each shard's row block exactly AND
    differentiably through the CSR rasterizer (blend_csr's analytic
    backward) — the mesh form of the exact-training path (see
    ops/render.py render_projected). The phantom-membership cull keeps each
    shard's entry total to its own rows, so the per-shard budget ladder
    starts well below N."""
    from activesplat_tpu.ops.projection import project_gaussians
    from activesplat_tpu.ops.raster_tiled import (
        TILE,
        rasterize_tiled,
        rasterize_tiled_exact,
    )

    n_dev = mesh.shape["px"]
    rows = cam.height // n_dev
    assert rows * n_dev == cam.height and rows % TILE == 0, (
        f"height {cam.height} must split into {n_dev} blocks of whole "
        f"{TILE}px tile rows"
    )
    if bg is None:
        bg = jnp.zeros(3, jnp.float32)

    params = buf.params
    proj = project_gaussians(
        params.means3d, params.quats, params.log_scales, buf.active,
        cam.w2c, cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
        near=cam.near, far=cam.far,
    )
    opac = jax.nn.sigmoid(params.logit_opacities)
    channels = jnp.concatenate(
        [params.rgb, proj.depth[:, None], (proj.depth * proj.depth)[:, None]], -1
    )
    # binning-only opacity-adaptive cull (lossless; see adaptive_cull_radius);
    # the returned radii keep the original 3-sigma values
    from activesplat_tpu.ops.projection import adaptive_cull_radius

    bin_radius, bin_valid = adaptive_cull_radius(proj.radius, proj.valid, opac)

    def shard_fn(mean2d, conic, opacity, chans, valid, radius, depth, bg_rep):
        row0 = (jax.lax.axis_index("px") * rows).astype(mean2d.dtype)
        local_mean = mean2d - jnp.stack(
            [jnp.zeros_like(row0), row0]
        )  # shift rows into this shard's frame

        def _capped(max_passes):
            return rasterize_tiled(
                local_mean,
                conic,
                opacity,
                chans,
                valid,
                radius,
                depth,
                width=cam.width,
                height=rows,
                k_per_tile=k_per_tile,
                backend=backend,
                max_passes=max_passes,
            )

        if grad_exact:
            accum0, log_t0, csr_dropped = rasterize_tiled_exact(
                local_mean, conic, opacity, chans, valid, radius, depth,
                width=cam.width, height=rows,
                ladder=(0.25, 0.5, 1.0),
                interpret=jax.default_backend() != "tpu",
                differentiable=True,
            )
            # entry-budget overflow: degrade THIS shard to the k-capped
            # differentiable render (collective-free branches, so the cond
            # is safe under shard_map)
            accum, log_t, dropped = jax.lax.cond(
                csr_dropped > 0,
                lambda _: _capped(1),
                lambda _: (accum0, log_t0, jnp.int32(0)),
                None,
            )
        else:
            # ceil(N/k) windows are provably exact (a tile list cannot
            # exceed the gaussian count); the while_loop early-exits
            accum, log_t, dropped = _capped(
                -(-mean2d.shape[0] // k_per_tile) if exact else 1
            )
        t = jnp.exp(log_t)
        rgb = (accum[:, :3] + t[:, None] * bg_rep[None, :]).reshape(
            rows, cam.width, 3
        )
        dep = accum[:, 3].reshape(rows, cam.width)
        alpha = (1.0 - t).reshape(rows, cam.width)
        rgb = jax.lax.all_gather(rgb, "px", tiled=True)
        dep = jax.lax.all_gather(dep, "px", tiled=True)
        alpha = jax.lax.all_gather(alpha, "px", tiled=True)
        dropped = jax.lax.psum(dropped, "px")
        return rgb, dep, alpha, dropped

    rgb, depth, alpha, dropped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(),) * 8,
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )(proj.mean2d, proj.conic, opac, channels, bin_valid, bin_radius, proj.depth, bg)
    return rgb, depth, alpha, proj.radius, dropped


def sharded_mapping_loss(
    params,
    buf: GaussianBuffer,
    cam: Camera,
    im_gt: jnp.ndarray,
    depth_gt: jnp.ndarray,
    cfg: MapperConfig,
    mesh: Mesh,
    backend: str = "xla",
):
    """mapping_loss (mapper/step.py) with the render sharded over the mesh.
    Uses the tiled rasterizer when the image splits into whole tile rows per
    device, else the dense row-sharded path."""
    from activesplat_tpu.ops.raster_tiled import TILE

    rows = cam.height // mesh.shape["px"]
    if cfg.k_per_tile > 0 and rows % TILE == 0:
        rgb, depth, alpha, radii, dropped = render_sharded_tiled(
            buf.replace(params=params), cam, mesh,
            k_per_tile=cfg.k_per_tile, backend=backend,
            # mesh path: "hybrid" maps to the full shard-block CSR walk (the
            # harmful-tile fold is single-device only for now)
            grad_exact=cfg.exact_training in ("on", "hybrid"),
        )
    else:
        rgb, depth, alpha, radii, dropped = render_sharded(
            buf.replace(params=params), cam, mesh, chunk=cfg.chunk
        )
    mask = depth_gt > 0
    if cfg.ignore_outlier_depth_loss:
        depth_error = jnp.abs(depth_gt - depth) * mask
        mask = mask & (depth_error < 10.0 * jnp.median(depth_error))
    if cfg.use_sil_for_loss:
        mask = mask & (alpha > cfg.sil_thres)
    mask = jax.lax.stop_gradient(mask)
    depth_l1 = jnp.sum(jnp.abs(depth_gt - depth) * mask) / jnp.maximum(
        jnp.sum(mask), 1.0
    )
    rgb_l1 = jnp.mean(jnp.abs(rgb - im_gt))
    ssim_val = ssim(rgb, im_gt)
    loss = cfg.loss_w_im * (0.8 * rgb_l1 + 0.2 * (1.0 - ssim_val)) + (
        cfg.loss_w_depth * depth_l1
    )
    # rgb_l1/ssim are cheap replicated reductions — return them so mesh-path
    # logs carry the same fields as single-device LossAux rows
    return loss, (radii, psnr(rgb, im_gt), depth_l1, dropped, rgb_l1, ssim_val)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "backend"))
def sharded_mapping_step(
    buf: GaussianBuffer,
    opt_state: AdamState,
    cam: Camera,
    im_gt: jnp.ndarray,
    depth_gt: jnp.ndarray,
    cfg: MapperConfig,
    mesh: Mesh,
    backend: str = "xla",
) -> Tuple[GaussianBuffer, AdamState, dict]:
    """One full multi-chip training step: sharded render, loss, backward
    (reduce-scatter + replicate of parameter grads), per-group Adam update."""
    grad_fn = jax.value_and_grad(sharded_mapping_loss, has_aux=True)
    (loss, (radii, psnr_val, depth_l1, dropped, rgb_l1, ssim_val)), grads = (
        grad_fn(buf.params, buf, cam, im_gt, depth_gt, cfg, mesh, backend)
    )
    new_params, opt_state = adam_update(
        buf.params, grads, opt_state, lr_pytree(cfg), cfg.adam_b1, cfg.adam_b2, cfg.adam_eps
    )
    seen = radii > 0
    buf = buf.replace(
        params=new_params,
        max_radius=jnp.where(seen, jnp.maximum(buf.max_radius, radii), buf.max_radius),
    )
    return buf, opt_state, {
        "loss": loss, "psnr": psnr_val, "depth_l1": depth_l1,
        "dropped": dropped, "rgb_l1": rgb_l1, "ssim": ssim_val,
    }
