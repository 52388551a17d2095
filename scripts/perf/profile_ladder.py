"""Measure the CSR entry-budget ladder on a real end-of-episode map.

Compares exact renders at panorama-view and perspective shapes with a fixed
4N budget (ladder=()) vs right-sized rungs, on TPU:

    python scripts/perf/profile_ladder.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import jax
import jax.numpy as jnp

from activesplat_tpu.io.params_io import load_params, buffer_from_params
from activesplat_tpu.models.gaussians import make_camera
from activesplat_tpu.ops.render import render_jit
from activesplat_tpu.queries.panorama import (
    PANO_HFOV_DEG,
    PANO_VFOV_DEG,
    pano_dims,
    pano_view_poses,
)
from activesplat_tpu.utils.transforms import compute_intrinsics

PARAMS = os.environ.get(
    "PROFILE_PARAMS", "/root/repo/episodes/r03_fast/gaussians_data/params.npz"
)


def fetch(x):
    return float(np.asarray(x).reshape(-1)[0])


def timed(fn, reps=5):
    fetch(fn())  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        v = fetch(fn())
    return (time.perf_counter() - t0) / reps * 1e3, v


def main():
    params = load_params(PARAMS)
    n = params["means3D"].shape[0]
    print(f"map: {n} gaussians, backend={jax.default_backend()}", flush=True)
    buf = buffer_from_params(params)

    m = params["means3D"]
    center = m.mean(0)
    c2w = np.eye(4)
    c2w[:3, :3] = np.diag([1.0, -1.0, -1.0])
    c2w[:3, 3] = center + np.array([0.0, 0.0, 0.0])

    # --- panorama view shape (120x150) ---
    w, h = pano_dims(1.0)
    fx, fy, cx, cy = compute_intrinsics(
        w, h, np.deg2rad(PANO_HFOV_DEG), np.deg2rad(PANO_VFOV_DEG)
    )
    intr = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
    pose = pano_view_poses(c2w)[0]
    cam = make_camera(w, h, intr, np.linalg.inv(pose), near=0.01, far=100.0)

    for label, ladder in [("fixed-4N", ()), ("ladder", (0.25, 0.5, 1.0))]:
        t0 = time.perf_counter()
        out = render_jit(buf, cam, k_per_tile=256, backend="pallas",
                         exact=True, exact_ladder=ladder)
        fetch(out.alpha)
        compile_s = time.perf_counter() - t0
        ms, _ = timed(
            lambda: render_jit(buf, cam, k_per_tile=256, backend="pallas",
                               exact=True, exact_ladder=ladder).alpha
        )
        print(f"pano view {label}: {ms:.1f} ms/view (compile {compile_s:.1f}s)",
              flush=True)

    # --- perspective 256px (densify / eval shape) ---
    w2 = h2 = 256
    fx2 = 0.5 * w2 / np.tan(np.deg2rad(45.0))
    intr2 = np.array([[fx2, 0, w2 / 2 - 1], [0, fx2, h2 / 2 - 1], [0, 0, 1]])
    cam2 = make_camera(w2, h2, intr2, np.linalg.inv(c2w), near=0.01, far=100.0)
    for label, ladder in [("fixed-4N", ()), ("ladder", (1.0, 2.0))]:
        t0 = time.perf_counter()
        out = render_jit(buf, cam2, k_per_tile=256, backend="pallas",
                         exact=True, exact_ladder=ladder)
        fetch(out.alpha)
        compile_s = time.perf_counter() - t0
        ms, _ = timed(
            lambda: render_jit(buf, cam2, k_per_tile=256, backend="pallas",
                               exact=True, exact_ladder=ladder).alpha
        )
        print(f"perspective {label}: {ms:.1f} ms/view (compile {compile_s:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
