"""Benchmark: online mapping iterations/sec on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured quantity matches the reference's headline runtime number — the
average per-iteration mapping time it prints at shutdown
(splatam/__init__.py:545-552: "Average Mapping/Iteration Time"). One
iteration = fused multi-channel render (the reference's two rasterizer
passes) + loss + backward + per-group Adam step at the benchmark sensor
resolution (256x256, config/env/activesplat_pointnav.yaml:33-50) against a
realistically sized map.

Baseline: the reference publishes no numbers (BASELINE.md); SplaTAM-class
mappers on an RTX 3090 at this resolution run ~30 ms/iteration (~33 it/s).
vs_baseline = measured_iters_per_sec / 33.3; the BASELINE.json north star
asks for >= 2.0 here.
"""

import json
import os
import sys
import time

import numpy as np


def build_map(n_gaussians: int, width: int, height: int, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from activesplat_tpu.mapper.config import MapperConfig
    from activesplat_tpu.models.gaussians import (
        GaussianBuffer,
        GaussianParams,
        make_camera,
    )
    from activesplat_tpu.runtime.synthetic import BoxWorld

    world = BoxWorld.two_room(seed=seed)
    pts = world.sample_surface(n_gaussians, seed=seed).astype(np.float32)
    rng = np.random.default_rng(seed)
    capacity = 1 << int(np.ceil(np.log2(n_gaussians)))
    buf = GaussianBuffer.empty(capacity)
    params = GaussianParams(
        means3d=buf.params.means3d.at[:n_gaussians].set(jnp.asarray(pts)),
        rgb=buf.params.rgb.at[:n_gaussians].set(
            jnp.asarray(rng.uniform(0, 1, (n_gaussians, 3)), jnp.float32)
        ),
        quats=buf.params.quats,
        logit_opacities=buf.params.logit_opacities.at[:n_gaussians].set(2.0),
        log_scales=buf.params.log_scales.at[:n_gaussians].set(
            jnp.asarray(
                rng.uniform(np.log(0.01), np.log(0.05), (n_gaussians, 3)),
                jnp.float32,
            )
        ),
    )
    buf = buf.replace(params=params, active=buf.active.at[:n_gaussians].set(True))

    fx = 0.5 * width / np.tan(np.deg2rad(45.0))
    intr = np.array([[fx, 0, width / 2 - 1], [0, fx, height / 2 - 1], [0, 0, 1]])
    c2w = np.eye(4)
    c2w[:3, :3] = np.diag([1.0, -1.0, -1.0])
    c2w[:3, 3] = [5.0, 1.25, 1.5]
    rgb, depth = world.render(c2w, intr, width, height)
    cam = make_camera(width, height, intr, np.linalg.inv(c2w))
    cfg = MapperConfig(
        chunk=int(os.environ.get("BENCH_CHUNK", 512)),
        k_per_tile=int(os.environ.get("BENCH_K_PER_TILE", 256)),
    )
    return buf, cam, jnp.asarray(rgb), jnp.asarray(depth), cfg


def _emit(metric, value, unit, baseline):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 3),
                "unit": unit,
                "vs_baseline": round(value / baseline, 3),
            }
        )
    )


def bench_render_fps(n_gaussians: int, width: int, height: int, reps: int = 30):
    """Forward render FPS (the BASELINE.json render-FPS@1M headline): reps
    renders chained in ONE device program (the axon relay adds ~2.3 ms per
    dispatch, which would swamp per-frame timings otherwise)."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from activesplat_tpu.ops.render import forward_backend, render

    buf, cam, _, _, cfg = build_map(n_gaussians, width, height)
    backend = forward_backend()

    @jax.jit
    def run(buf, cam):
        def body(i, acc):
            c = dc.replace(
                cam, w2c=cam.w2c.at[0, 3].add(1e-6 * acc)
            )  # serialize iterations
            out = render(
                buf, c, chunk=cfg.chunk, k_per_tile=cfg.k_per_tile,
                backend=backend,
            )
            return acc + out.rgb[0, 0, 0] * 1e-20
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    float(np.asarray(run(buf, cam)))  # compile + warm
    t0 = time.perf_counter()
    float(np.asarray(run(buf, cam)))
    dt = time.perf_counter() - t0
    # RTX-3090-class CUDA 3DGS renderers reach ~100 FPS at 1M/256px
    _emit(
        f"render_fps@{n_gaussians}g_{width}px", reps / dt, "fps", 100.0
    )


def bench_queries(n_gaussians: int, reps: int = 5):
    """Planner-facing map-query latency at scale: topdown occupancy render +
     3-view panorama invisibility, measured host-to-host (the latency the
    planner FSM actually waits on)."""
    import jax.numpy as jnp

    from activesplat_tpu.queries.panorama import global_invisibility
    from activesplat_tpu.queries.topdown import (
        render_topdown,
        topdown_config_from_bbox,
    )

    buf, cam, _, _, cfg = build_map(n_gaussians, 256, 256)
    bbox = np.array([[0.0, 10.0], [0.0, 3.0], [0.0, 6.0]])
    td_cfg = topdown_config_from_bbox(bbox, agent_foot=0.0, agent_head=1.5,
                                      pixel_max=360)
    render_topdown(buf, td_cfg)  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        free, unobs, _ = render_topdown(buf, td_cfg)
    dt = (time.perf_counter() - t0) / reps * 1000
    _emit(f"topdown_query_ms@{n_gaussians}g", dt, "ms", 1.0)

    c2w = np.eye(4)
    c2w[:3, :3] = np.diag([1.0, -1.0, -1.0])
    c2w[:3, 3] = [5.0, 1.25, 1.5]
    nodes = np.array([[4.0, 1.25, 2.0], [6.0, 1.25, 3.0]])
    global_invisibility(buf, c2w, nodes, chunk=cfg.chunk, scale=0.5)
    t0 = time.perf_counter()
    for _ in range(reps):
        scores = global_invisibility(buf, c2w, nodes, chunk=cfg.chunk, scale=0.5)
    dt = (time.perf_counter() - t0) / reps * 1000
    _emit(f"panorama_query_ms@{n_gaussians}g_2nodes", dt, "ms", 1.0)


def bench_mapping(n_gaussians: int, width: int, height: int, iters_timed: int,
                  baseline: float):
    """Training iterations/sec at a given map size; one JSON line."""
    import jax
    import jax.numpy as jnp

    from activesplat_tpu.mapper.adam import AdamState
    from activesplat_tpu.mapper.step import mapping_iteration

    buf, cam, rgb, depth, cfg = build_map(n_gaussians, width, height)
    opt = AdamState.init(buf.params)

    # Iterations are chained inside ONE device program, exactly like the
    # production mapper (mapping_phase runs the whole per-frame optimization
    # as a single lax.scan, mapper/step.py) — a host-side python loop would
    # additionally measure the axon relay's ~1 ms/call dispatch, which the
    # real system never pays per iteration.
    @jax.jit
    def run_iters(buf, opt):
        def body(i, carry):
            b, o, acc = carry
            b, o, m = mapping_iteration(b, o, cam, rgb, depth, cfg)
            # carry the metrics so XLA cannot dead-code-eliminate the
            # psnr/depth_l1 computation the production mapping_phase keeps
            acc = acc + m["loss"] + m["psnr"] * 1e-20 + m["depth_l1"] * 1e-20
            return (b, o, acc)

        return jax.lax.fori_loop(
            0, iters_timed, body, (buf, opt, jnp.float32(0.0))
        )

    # warmup / compile (sync via a value fetch: block_until_ready does not
    # reliably synchronize through the tunneled-TPU relay)
    out = run_iters(buf, opt)
    float(np.asarray(out[2]))

    t0 = time.perf_counter()
    out = run_iters(buf, opt)
    float(np.asarray(out[2]))  # forces the full chain incl. metrics
    dt = time.perf_counter() - t0
    _emit(
        f"mapping_iters_per_sec@{n_gaussians}g_{width}px",
        iters_timed / dt,
        "iters/s",
        baseline,
    )


def main():
    n_gaussians = int(os.environ.get("BENCH_GAUSSIANS", 200_000))
    width = height = int(os.environ.get("BENCH_RES", 256))
    iters_timed = int(os.environ.get("BENCH_ITERS", 30))

    if os.environ.get("BENCH_ALL"):
        # extended suite: render FPS @1M (BASELINE headline) + query latency
        bench_render_fps(int(os.environ.get("BENCH_FPS_GAUSSIANS", 1_000_000)),
                         width, height)
        bench_queries(int(os.environ.get("BENCH_FPS_GAUSSIANS", 1_000_000)))

    if not os.environ.get("BENCH_SKIP_1M"):
        # end-of-episode-scale TRAINING throughput (the hardware episode
        # grows past 1M Gaussians; the 200k number alone undersells the
        # scaling story). Same RTX-3090 SplaTAM-class proxy baseline — CUDA
        # 3DGS training at 1M splats/256px also sits around ~30 ms/iter.
        # Auxiliary benches must not take the headline down with them: the
        # relay intermittently drops a call, and the driver parses the FINAL
        # JSON line of a zero-rc run.
        try:
            bench_mapping(
                int(os.environ.get("BENCH_BIG_GAUSSIANS", 1_000_000)),
                width, height, iters_timed, 33.3,
            )
        except Exception as exc:  # pragma: no cover - relay hiccups
            print(f"bench_mapping@1M failed: {exc!r}", file=sys.stderr)

    # headline metric LAST (the driver parses the final JSON line)
    bench_mapping(n_gaussians, width, height, iters_timed, 33.3)


if __name__ == "__main__":
    sys.exit(main())
