"""Profile the planner-facing queries (topdown / panorama) on a real
end-of-episode map (episodes/r03_exact, 877k Gaussians) to find where the
episode wall-clock goes. Run on TPU: python scripts/perf/profile_queries_877k.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import jax

from activesplat_tpu.io.params_io import load_params, buffer_from_params
from activesplat_tpu.queries.topdown import render_topdown, topdown_config_from_bbox

PARAMS = os.environ.get(
    "PROFILE_PARAMS", "/root/repo/episodes/r03_exact/gaussians_data/params.npz"
)


def main():
    params = load_params(PARAMS)
    n = params["means3D"].shape[0]
    print(f"map: {n} gaussians, backend={jax.default_backend()}")
    buf = buffer_from_params(params)
    print(f"capacity: {buf.params.means3d.shape[0]}")

    m = params["means3D"]
    bbox = np.stack([m.min(0), m.max(0)], -1)
    agent_foot = float(np.percentile(m[:, 1], 2.0))
    agent_head = agent_foot + 1.35
    cfg = topdown_config_from_bbox(bbox, agent_foot, agent_head, pixel_max=360)
    print(f"topdown grid: {cfg.grid_shape}, mpp={cfg.meter_per_pixel:.4f}")

    ks = [int(x) for x in os.environ.get("PROFILE_KS", "256,1024,4096,16384").split(",")]
    for k in ks:
        t0 = time.perf_counter()
        f, u, _ = render_topdown(buf, cfg, k_per_tile=k)
        print(f"  exact k={k}: compile+run {time.perf_counter()-t0:.2f}s", flush=True)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            f, u, _ = render_topdown(buf, cfg, k_per_tile=k)
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(
            f"  exact k={k}: {dt:.1f} ms/call  free%={f.mean():.3f} "
            f"unobs%={u.mean():.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
