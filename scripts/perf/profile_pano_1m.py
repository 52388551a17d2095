"""Decompose pano_global cost on a synthetic 1M-Gaussian map (the r03_fast
episode spent 220 s / 8 calls = 27.6 s per pano_global; per-view exact CSR
was ~147 ms at 877k). Times the 12-view chunk end-to-end, a single view, and
the CSR stages inside one pano view. Run on TPU.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from activesplat_tpu.queries.panorama import (
    _render_views_quantized,
    global_invisibility,
    pano_view_poses,
)

N = int(os.environ.get("PROFILE_N", str(1 << 20)))


def fetch(x):
    return float(np.asarray(jax.tree.leaves(x)[0]).reshape(-1).astype(np.float64)[0])


def main():
    buf, *_ = bench.build_map(N, 256, 256)
    print(f"map: {N} gaussians, backend={jax.default_backend()}", flush=True)

    c2w = np.eye(4)
    c2w[:3, 3] = [2.0, 1.0, 2.0]
    poses = np.concatenate(
        [pano_view_poses(bench_pose(c2w, i)) for i in range(4)], 0
    )
    w2cs = jnp.asarray(np.linalg.inv(poses), jnp.float32)  # 12 views

    # end-to-end 12-view chunk (the unit pano_global loops over)
    t0 = time.perf_counter()
    out = _render_views_quantized(buf, w2cs, 256, 1.0, None)
    fetch(out)
    print(f"12-view chunk compile+run: {time.perf_counter()-t0:.2f} s", flush=True)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = _render_views_quantized(buf, w2cs, 256, 1.0, None)
        fetch(out)
    per = (time.perf_counter() - t0) / reps
    print(
        f"12-view chunk: {per*1000:.1f} ms/call = {per/12*1000:.1f} ms/view",
        flush=True,
    )

    # whole pano_global at a typical node count
    for n_nodes in (4, 16):
        node_pos = np.random.default_rng(0).uniform(0.5, 3.5, (n_nodes, 3))
        t0 = time.perf_counter()
        global_invisibility(buf, c2w, node_pos)
        dt = time.perf_counter() - t0
        print(f"global_invisibility n_nodes={n_nodes}: {dt:.2f} s "
              f"({dt/n_nodes*1000:.0f} ms/node)", flush=True)


def bench_pose(c2w, i):
    p = c2w.copy()
    p[0, 3] += 0.3 * i
    return p


if __name__ == "__main__":
    main()
