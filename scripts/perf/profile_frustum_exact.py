"""Why does mapper/high_loss cost 5.9 s/call warm (EPISODE_r05: 229.7 s /
39 calls)? Hypothesis: close-range frustum views of a converged ~1M map
overflow the CSR 4N entry budget (near splats span many tiles), silently
falling back to the bounded multipass walk (seconds per render, r3 measured
3.3 s at 877k).

Loads the synth checkpoint, renders from agent poses at several positions,
and reports per view: the exact membership total (m_total vs the 4N budget),
the exact-render time, and the k-capped render time.

Env: EP_DIR, EP_SCENE/EP_SEED/EP_RES, REPS. Run with JAX_PLATFORMS=axon.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main():
    import jax
    import jax.numpy as jnp

    from activesplat_tpu.io.params_io import buffer_from_params, load_params
    from activesplat_tpu.models.gaussians import make_camera
    from activesplat_tpu.ops.render import forward_backend, render_jit
    from activesplat_tpu.runtime.dataloader import SimAction
    from activesplat_tpu.runtime.launch import make_synthetic_dataset

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    results_dir = os.environ.get("EP_DIR", os.path.join(root, "episodes", "synth_1m"))
    scene = os.environ.get("EP_SCENE", "two_room")
    seed = int(os.environ.get("EP_SEED", 0))
    res = int(os.environ.get("EP_RES", 256))
    reps = int(os.environ.get("REPS", 5))
    k = int(os.environ.get("K_PER_TILE", 1024))

    ds = make_synthetic_dataset(
        scene_id=scene, seed=seed, step_num=500, width=res, height=res
    )
    buf = buffer_from_params(
        load_params(os.path.join(results_dir, "gaussians_data", "params.npz"))
    )
    n = buf.capacity
    print(json.dumps({"capacity": n, "budget_4n": 4 * n}), flush=True)
    backend = forward_backend()
    intr = ds.sensor.intrinsics

    @functools.partial(jax.jit, static_argnames=("width", "height"))
    def m_total_of(buf, w2c, fx, fy, cx, cy, *, width, height):
        from activesplat_tpu.ops.projection import (
            adaptive_cull_radius,
            project_gaussians,
        )
        from activesplat_tpu.ops.raster_tiled import TILE, tile_aabbs

        p = buf.params
        proj = project_gaussians(
            p.means3d, p.quats, p.log_scales, buf.active, w2c,
            fx, fy, cx, cy, width, height, near=0.01, far=100.0,
        )
        opac = jax.nn.sigmoid(p.logit_opacities)
        rad, val = adaptive_cull_radius(proj.radius, proj.valid, opac)
        tx = -(-width // TILE)
        ty = -(-height // TILE)
        v, tx0, tx1, ty0, ty1 = tile_aabbs(
            proj.mean2d[:, 0], proj.mean2d[:, 1], rad, val, tx, ty
        )
        span = jnp.where(
            v, (tx1 - tx0 + 1) * (ty1 - ty0 + 1), 0.0
        )
        return jnp.sum(span)

    def timed(fn, reps):
        fn()
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return (time.perf_counter() - t0) / reps * 1e3

    # a handful of in-room agent poses: start pose, plus after walks/turns
    poses = [("start", ds.camera_c2w())]
    for i in range(8):
        for _ in range(25):
            ds.step(SimAction.MOVE_FORWARD)
        ds.step(SimAction.TURN_LEFT)
        ds.step(SimAction.TURN_LEFT)
        poses.append((f"walk{i}", ds.camera_c2w()))

    for name, c2w in poses[: int(os.environ.get("N_POSES", 5))]:
        w2c = np.linalg.inv(c2w)
        cam = make_camera(res, res, intr, w2c, near=0.01, far=100.0)
        mt = float(np.asarray(m_total_of(
            buf, jnp.asarray(w2c, jnp.float32),
            intr[0, 0], intr[1, 1], intr[0, 2], intr[1, 2],
            width=res, height=res,
        )))

        def exact():
            out = render_jit(
                buf, cam, chunk=256, k_per_tile=k, backend=backend, exact=True,
            )
            return float(np.asarray(out.depth.sum()))

        def capped():
            out = render_jit(
                buf, cam, chunk=256, k_per_tile=k, backend=backend, exact=False,
            )
            return float(np.asarray(out.depth.sum()))

        row = {
            "pose": name,
            "m_total": mt,
            "over_budget": mt > 4 * n,
            "exact_ms": timed(exact, reps),
            "capped_ms": timed(capped, reps),
        }
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
