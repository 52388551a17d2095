"""Instrument the exact (multi-pass) tiled raster on a real 877k map:
per-tile membership distribution, pass count to saturation, per-pass cost.
Drives the topdown 'free' view (the planner's hot query).
Run on TPU: python scripts/perf/profile_exact_passes.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import functools

import numpy as np
import jax
import jax.numpy as jnp

from activesplat_tpu.io.params_io import load_params, buffer_from_params
from activesplat_tpu.ops.projection import project_gaussians
from activesplat_tpu.ops.raster_tiled import bin_gaussians
from activesplat_tpu.queries.topdown import (
    TOPDOWN_SCALE_MODIFIER,
    _band_mask,
    topdown_camera,
    topdown_config_from_bbox,
)

PARAMS = os.environ.get(
    "PROFILE_PARAMS", "/root/repo/episodes/r03_exact/gaussians_data/params.npz"
)
K = int(os.environ.get("PROFILE_K", "256"))


@functools.partial(jax.jit, static_argnames=("k", "sliced"))
def prep(buf, cam, foot, head, *, k, sliced):
    params = buf.params
    active = buf.active
    if sliced:
        active = active & _band_mask(params.means3d, 1, foot, head)
    proj = project_gaussians(
        params.means3d, params.quats, params.log_scales, active,
        cam.w2c, cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
        near=cam.near, far=cam.far, scale_modifier=TOPDOWN_SCALE_MODIFIER,
    )
    # replicate _rasterize_tiled_data's sort prep
    valid = proj.valid
    key = jnp.where(valid, proj.depth, jnp.inf)
    n = key.shape[0]
    scale = 8.0
    lim = float(2 ** 15 - 2)
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
    return s_mx, s_my, s_rad, s_val, jnp.sum(valid.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("w", "h", "k"))
def bin_counts(s_mx, s_my, s_rad, s_val, *, w, h, k):
    lists = bin_gaussians(
        jnp.stack([s_mx, s_my], -1), s_rad, s_val, w, h, k, jnp.int32(0)
    )
    total = jnp.sum(jnp.minimum(lists.indices, 1) * 0)  # placeholder
    return lists.overflow


def main():
    params = load_params(PARAMS)
    buf = buffer_from_params(params)
    m = params["means3D"]
    bbox = np.stack([m.min(0), m.max(0)], -1)
    agent_foot = float(np.percentile(m[:, 1], 2.0))
    cfg = topdown_config_from_bbox(bbox, agent_foot, agent_foot + 1.35, pixel_max=360)
    cam = topdown_camera(cfg)
    w, h = cfg.width, cfg.height
    print(f"backend={jax.default_backend()} grid={cfg.grid_shape} K={K}")

    for sliced in (True, False):
        s_mx, s_my, s_rad, s_val, nv = prep(
            buf, cam, jnp.float32(cfg.agent_foot), jnp.float32(cfg.agent_head),
            k=K, sliced=sliced,
        )
        nv = int(np.asarray(nv))
        ov = np.asarray(bin_counts(s_mx, s_my, s_rad, s_val, w=w, h=h, k=K))
        tot = ov + np.where(ov > 0, K, 0)  # lower bound: >=K where overflowed
        print(
            f"  sliced={sliced}: visible={nv} tiles={ov.size} "
            f"overflowed={int((ov > 0).sum())} max_members>={int(tot.max())} "
            f"sum_overflow={int(ov.sum())} implied_passes~{int(tot.max() + K - 1) // K}"
        )

    # per-pass cost: bin one window at increasing offsets, timed
    s_mx, s_my, s_rad, s_val, _ = prep(
        buf, cam, jnp.float32(cfg.agent_foot), jnp.float32(cfg.agent_head),
        k=K, sliced=False,
    )
    fb = jax.jit(
        lambda a, b, c, d, off: bin_gaussians(
            jnp.stack([a, b], -1), c, d, w, h, K, off
        ).overflow
    )
    _ = np.asarray(fb(s_mx, s_my, s_rad, s_val, jnp.int32(0)))
    t0 = time.perf_counter()
    for i in range(10):
        _ = np.asarray(fb(s_mx, s_my, s_rad, s_val, jnp.int32(i * K)))
    print(f"  bin-one-window: {(time.perf_counter()-t0)/10*1e3:.1f} ms")


if __name__ == "__main__":
    main()
