"""Repro for the r04 high-resolution episode crash: the 512x512
jit(densify_phase) program at capacity 1<<20 — the shape bucket the episode
recompiles at when capacity grows to 1M — died inside
rasterize_tiled_exact/branch_3 (the 4N top rung) with what looks like a
TPU VMEM-exhaustion allocation dump (/tmp/highres_r04.log, truncated).

The standalone exact render (forward AND grad_exact) at the same
N/res/k passes (165 s + 123 s compiles, alpha ok), so the failure needs the
full densify program: exact render + candidate backprojection + masked
insertion fused in one jit.

Run on hardware:  timeout 1800 python scripts/perf/repro_highres_512.py 2>&1
Env: REPRO_N (default 1048576), REPRO_RES (default 512), REPRO_K (1024),
     REPRO_STAGE (render|densify|all, default densify).
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    n = int(os.environ.get("REPRO_N", 1 << 20))
    res = int(os.environ.get("REPRO_RES", 512))
    k = int(os.environ.get("REPRO_K", 1024))
    what = os.environ.get("REPRO_STAGE", "densify")

    import bench

    buf, cam, rgb, depth, cfg = bench.build_map(n, res, res)

    import dataclasses

    import jax
    import jax.numpy as jnp

    from activesplat_tpu.ops.render import render

    cfg = dataclasses.replace(
        cfg, k_per_tile=k, k_per_tile_max=max(k, cfg.k_per_tile_max),
        densify_downscale_factor=1, mapping_window_size=12, mapping_iters=10,
    )
    print(f"backend={jax.default_backend()} n={n} res={res} k={k}", flush=True)

    rc = 0
    if what in ("render", "all"):
        for kw in ({"exact": True}, {"grad_exact": True}):
            t0 = time.time()
            try:
                out = render(buf, cam, k_per_tile=k, backend="pallas", **kw)
                a = float(np.asarray(out.alpha).mean())
                print(f"{kw} ok in {time.time()-t0:.1f}s alpha_mean={a:.4f}", flush=True)
            except Exception:
                traceback.print_exc()
                print(f"{kw} FAILED", flush=True)
                rc = 1

    if what in ("densify", "all"):
        from activesplat_tpu.mapper.step import densify_phase
        from activesplat_tpu.ops.render import forward_backend

        t0 = time.time()
        try:
            buf2, dropped, n_new = densify_phase(
                buf, cam, jnp.asarray(rgb), jnp.asarray(depth),
                jnp.float32(3.0), cfg, backend=forward_backend(),
            )
            d = int(np.asarray(dropped))
            print(
                f"densify ok in {time.time()-t0:.1f}s dropped={d} "
                f"n_new={int(np.asarray(n_new))}", flush=True,
            )
        except Exception:
            traceback.print_exc()
            print("DENSIFY FAILED", flush=True)
            rc = 2
    return rc


if __name__ == "__main__":
    sys.exit(main())
