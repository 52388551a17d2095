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


# TPU v5e single-chip peaks (public spec: 16 GB HBM2 @ 819 GB/s,
# 197 TFLOP/s bf16 on the MXU). The roofline block below reports achieved
# fractions of these so "fast" is anchored to hardware, not to the RTX-3090
# proxy baseline (which stays, caveated, as vs_baseline).
V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 197.0


def _timed_chain(run, reps):
    """Compile+warm a jitted reps-chained program, then time one execution.
    Sync is a value fetch: block_until_ready is unreliable over the relay."""
    float(np.asarray(run()))
    t0 = time.perf_counter()
    float(np.asarray(run()))
    return (time.perf_counter() - t0) / reps


def bench_roofline(n_gaussians: int, width: int, height: int, reps: int = 30):
    """Hardware-anchored floors for the mapping step's dominant primitives,
    one JSON line: measured achieved HBM bandwidth (and MXU throughput) as a
    fraction of v5e peak. These are the CLAUDE.md microbench floors (gather
    ~1.3 ms, scatter-add ~1.7 ms @262k) made reproducible: if achieved_pct
    is near 100 the stage is at speed-of-light and further kernel work is
    wasted; the remaining headroom lives wherever achieved_pct is low."""
    import functools

    import jax
    import jax.numpy as jnp

    from activesplat_tpu.mapper.adam import AdamState, adam_update, lr_pytree

    buf, cam, rgb, depth, cfg = build_map(n_gaussians, width, height)
    N = int(buf.params.means3d.shape[0])  # capacity (power of two >= n)
    P = sum(x.nbytes for x in jax.tree_util.tree_leaves(buf.params))
    lrs = lr_pytree(cfg)
    out = {}

    # 1. Adam update: pure parameter streaming — reads params+grads+mu+nu,
    # writes params+mu+nu => 7x the param bytes per iteration. The closest
    # thing the step has to a pure-bandwidth stage.
    grads = jax.tree_util.tree_map(lambda x: jnp.ones_like(x), buf.params)
    opt0 = AdamState.init(buf.params)

    @jax.jit
    def run_adam():
        def body(i, carry):
            p, o = carry
            p, o = adam_update(p, grads, o, lrs, cfg.adam_b1, cfg.adam_b2,
                               cfg.adam_eps)
            return (p, o)

        p, _ = jax.lax.fori_loop(0, reps, body, (buf.params, opt0))
        return p.means3d[0, 0]

    dt = _timed_chain(run_adam, reps)
    gbps = 7 * P / dt / 1e9
    out["adam_stream"] = {
        "ms": round(dt * 1e3, 3), "bytes": 7 * P,
        "achieved_gbps": round(gbps, 1),
        "pct_hbm_peak": round(100 * gbps / V5E_HBM_GBPS, 1),
    }

    # 2. Visible-row gather (the projection->blend compaction). Measured
    # XLA row-gather cost scales with TABLE rows, not output rows
    # (CLAUDE.md dead-ends) — the bytes model charges one table sweep + out.
    M = max(N // 4, 1)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, N, M), jnp.int32)
    table = jnp.zeros((N, 16), jnp.float32)

    @jax.jit
    def run_gather():
        def body(i, acc):
            rows = table[idx + (acc.astype(jnp.int32) & 0)]  # serialize
            return acc + rows[0, 0] * 1e-20 + 1.0

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    dt = _timed_chain(run_gather, reps)
    nbytes = table.nbytes + M * 16 * 4
    gbps = nbytes / dt / 1e9
    out["row_gather"] = {
        "ms": round(dt * 1e3, 3), "bytes": nbytes,
        "achieved_gbps": round(gbps, 1),
        "pct_hbm_peak": round(100 * gbps / V5E_HBM_GBPS, 1),
    }

    # 3. Scatter-add (the blend-gather transpose in the backward pass; the
    # measured ~1.7 ms floor). Bytes: table read+write + value rows read.
    vals = jnp.ones((M, 16), jnp.float32)

    @jax.jit
    def run_scatter():
        def body(i, carry):
            t, acc = carry
            t = t.at[idx + (acc.astype(jnp.int32) & 0)].add(vals)
            return (t, acc + t[0, 0] * 1e-20 + 1.0)

        t, acc = jax.lax.fori_loop(0, reps, body, (table, jnp.float32(0.0)))
        return t[0, 0] + acc

    dt = _timed_chain(run_scatter, reps)
    nbytes = 2 * table.nbytes + vals.nbytes
    gbps = nbytes / dt / 1e9
    out["scatter_add"] = {
        "ms": round(dt * 1e3, 3), "bytes": nbytes,
        "achieved_gbps": round(gbps, 1),
        "pct_hbm_peak": round(100 * gbps / V5E_HBM_GBPS, 1),
    }

    # 4. MXU anchor: chained bf16 matmuls. The chain is serially dependent
    # (y = y @ x) so small shapes can't pipeline — measured on this chip:
    # 19 TFLOPs @2048^3, 86 @4096^3, 122 @8192^3 (62% of nominal peak, the
    # serial-chain ceiling). 8192 is the honest single-chip anchor.
    mm = 8192
    mm_reps = 10
    x = jnp.asarray(np.random.default_rng(0).normal(0, 0.01, (mm, mm)),
                    jnp.bfloat16)

    @jax.jit
    def run_mxu():
        def body(i, y):
            return jnp.dot(y, x)

        y = jax.lax.fori_loop(0, mm_reps, body, x)
        return y[0, 0].astype(jnp.float32)

    dt = _timed_chain(run_mxu, mm_reps)
    tflops = 2 * mm**3 / dt / 1e12
    out["mxu_bf16"] = {
        "ms": round(dt * 1e3, 3),
        "achieved_tflops": round(tflops, 1),
        "pct_mxu_peak": round(100 * tflops / V5E_BF16_TFLOPS, 1),
    }

    # 5-11. mapping-iteration INTERNAL stages (VERDICT r4 item 9): each
    # timed as its own chained jit at the REAL shapes the step uses
    # (capacity table, the visible-prefix bucket the step's lax.switch picks,
    # (T, K) tile lists), with a STATED minimal-traffic bytes model so
    # pct_hbm_peak is auditable: it is "achieved fraction of peak IF the
    # stage moved only its modeled floor bytes" — low pct means either extra
    # passes (sorts are inherently multi-pass vs the 1-pass model) or
    # latency-bound access (gathers), exactly the signal that localizes
    # regressions in the 8.7 ms iteration.
    try:
        out.update(_roofline_mapping_stages(buf, cam, cfg, reps))
    except Exception as exc:  # pragma: no cover - relay hiccups
        print(f"stage roofline failed: {exc!r}", file=sys.stderr)

    # 12. Whole mapping iteration vs its parameter-stream lower bound: the
    # step must at minimum stream what Adam streams (7P: grads exist and
    # params/moments update), so pct is "fraction of time spent at the
    # unavoidable-bandwidth floor". Short run — the headline measures it/s.
    from activesplat_tpu.mapper.step import mapping_iteration

    opt = AdamState.init(buf.params)

    @jax.jit
    def run_iter():
        def body(i, carry):
            b, o, acc = carry
            b, o, m = mapping_iteration(b, o, cam, rgb, depth, cfg)
            return (b, o, acc + m["loss"])

        return jax.lax.fori_loop(0, reps, body, (buf, opt, jnp.float32(0.0)))[2]

    dt = _timed_chain(run_iter, reps)
    gbps = 7 * P / dt / 1e9
    out["mapping_iteration"] = {
        "ms": round(dt * 1e3, 3), "param_stream_bytes": 7 * P,
        "param_stream_gbps": round(gbps, 1),
        "pct_hbm_peak_floor": round(100 * gbps / V5E_HBM_GBPS, 1),
    }
    print(json.dumps({
        "metric": f"roofline@{n_gaussians}g_{width}px",
        "v5e_peaks": {"hbm_gbps": V5E_HBM_GBPS,
                      "bf16_tflops": V5E_BF16_TFLOPS},
        "roofline": out,
    }))


def _roofline_mapping_stages(buf, cam, cfg, reps):
    """Per-stage roofline rows for the mapping iteration's pipeline:
    projection, depth sort, tile binning, blend gather, blend fwd, blend
    bwd kernel, backward scatter-add. Returns {stage: row} dicts shaped
    like the primitive rows (ms / modeled bytes / achieved GB/s / % peak)."""
    import jax
    import jax.numpy as jnp

    from activesplat_tpu.ops.projection import (
        adaptive_cull_radius,
        project_gaussians,
    )
    from activesplat_tpu.ops.raster_pallas import blend_tiles, blend_tiles_pallas
    from activesplat_tpu.ops.raster_tiled import (
        TILE,
        _prefix_buckets,
        _sort_pack,
        bin_gaussians,
    )

    p = buf.params
    width, height = cam.width, cam.height
    k = cfg.k_per_tile
    n = int(p.means3d.shape[0])
    t = (-(-width // TILE)) * (-(-height // TILE))
    rows = {}

    def add(name, dt, nbytes):
        gbps = nbytes / dt / 1e9
        rows[name] = {
            "ms": round(dt * 1e3, 3), "model_bytes": int(nbytes),
            "achieved_gbps": round(gbps, 1),
            "pct_hbm_peak": round(100 * gbps / V5E_HBM_GBPS, 1),
        }

    def chain(body0):
        """reps-chained jit with a serializing carry; returns seconds/rep."""

        @jax.jit
        def run():
            def body(i, acc):
                return acc + body0(acc) * 1e-20 + 1.0

            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        return _timed_chain(run, reps)

    # projection (+ the binning-only adaptive cull): pure elementwise.
    # model: params in (means 12 + quats 16 + scales 12 + opac 4 + active 1)
    # + proj out (mean2d 8, conic 12, depth 4, radius 4, valid 1, cull 4)
    opac = jax.nn.sigmoid(p.logit_opacities)

    def proj_body(acc):
        pr = project_gaussians(
            p.means3d.at[0, 0].add(acc * 1e-30), p.quats, p.log_scales,
            buf.active, cam.w2c, cam.fx, cam.fy, cam.cx, cam.cy,
            cam.width, cam.height, near=cam.near, far=cam.far,
        )
        r, v = adaptive_cull_radius(pr.radius, pr.valid, opac)
        return pr.mean2d[0, 0] + r[0] + v[0]

    add("stage_projection", chain(proj_body), (45 + 33) * n)

    proj = jax.jit(
        lambda: project_gaussians(
            p.means3d, p.quats, p.log_scales, buf.active, cam.w2c, cam.fx,
            cam.fy, cam.cx, cam.cy, cam.width, cam.height, near=cam.near,
            far=cam.far,
        )
    )()
    bin_radius, bin_valid = adaptive_cull_radius(proj.radius, proj.valid, opac)
    channels = jnp.concatenate(
        [p.rgb, proj.depth[:, None], (proj.depth**2)[:, None]], -1
    )
    data = jnp.concatenate(
        [proj.mean2d, proj.conic, opac[:, None], channels], -1
    )
    key = jnp.where(bin_valid, proj.depth, jnp.inf)

    # depth sort: 4 packed operands. model: ONE read+write pass of the
    # operands (16 B/row each way) — real device sorts are multi-pass, so
    # pct directly shows the multi-pass factor.
    def sort_body(acc):
        pk, od = _sort_pack(
            data.at[0, 0].add(acc * 1e-30), key, bin_radius, bin_valid
        )
        return pk[0, 0] + od[0].astype(jnp.float32)

    add("stage_depth_sort", chain(sort_body), 2 * 16 * n)

    packed, order = _sort_pack(data, key, bin_radius, bin_valid)
    buckets = _prefix_buckets(n)
    n_vis = int(np.asarray(jnp.sum(bin_valid.astype(jnp.int32))))
    b = next(bb for bb in buckets if bb >= n_vis)  # the switch's choice
    blk = 128

    # tile binning at the visible bucket. model: interval indicators in
    # (B x (tx+ty) i8), gathered AABB rows + bit walk (T*K*blk i32), counts
    # + lists out
    tiles_x = -(-width // TILE)
    tiles_y = -(-height // TILE)

    def bin_body(acc):
        lists = bin_gaussians(
            packed[:b, :2] + acc * 1e-30, packed[:b, 2], packed[:b, 3] > 0,
            width, height, min(k, b),
        )
        return lists.indices[0, 0].astype(jnp.float32)

    add(
        "stage_bin", chain(bin_body),
        b * (tiles_x + tiles_y) + t * min(k, b) * blk * 4 + t * min(k, b) * 4,
    )

    lists = bin_gaussians(
        packed[:b, :2], packed[:b, 2], packed[:b, 3] > 0, width, height,
        min(k, b),
    )
    pad_row = jnp.concatenate(
        [jnp.full((1, 2), -1e9, jnp.float32), jnp.ones((1, 3), jnp.float32),
         jnp.zeros((1, 6), jnp.float32)], -1,
    )
    gids = jnp.where(
        lists.indices >= b, n, order[jnp.minimum(lists.indices, n - 1)]
    )

    # blend gather (T, K, 16): model = one table sweep (measured: XLA
    # row-gather cost scales with TABLE rows, CLAUDE.md) + the output
    def gather_body(acc):
        pad_data = jnp.concatenate(
            [data.at[0, 0].add(acc * 1e-30), pad_row], 0
        )
        td = jnp.pad(pad_data[gids], ((0, 0), (0, 0), (0, 16 - 11)))
        return td[0, 0, 0]

    add(
        "stage_blend_gather", chain(gather_body),
        n * 11 * 4 + t * min(k, b) * 16 * 4,
    )

    pad_data = jnp.concatenate([data, pad_row], 0)
    tile_data = jnp.pad(pad_data[gids], ((0, 0), (0, 0), (0, 16 - 11)))
    u0 = jnp.asarray((np.arange(t) % tiles_x) * TILE, jnp.int32)
    v0 = jnp.asarray((np.arange(t) // tiles_x) * TILE, jnp.int32)
    interp = jax.default_backend() != "tpu"
    px = TILE * TILE

    # blend forward (fused Pallas kernel): tile_data in + image blocks out
    def blend_fwd_body(acc):
        a, l = blend_tiles_pallas(
            tile_data.at[0, 0, 0].add(acc * 1e-30), u0, v0, 5, interp
        )
        return a[0, 0, 0] + l[0, 0]

    blend_io = tile_data.nbytes + t * px * 9 * 4
    add("stage_blend_fwd", chain(blend_fwd_body), blend_io)

    # blend fwd+bwd (custom VJP: stashed entry log-transmittance residual,
    # reverse walk). model: fwd IO + residual (T*K px-rows) + d_tile_data out
    blend_grad = jax.grad(
        lambda td: jnp.sum(blend_tiles(td, u0, v0, 5, interp)[0])
    )

    def blend_bwd_body(acc):
        g = blend_grad(tile_data.at[0, 0, 0].add(acc * 1e-30))
        return g[0, 0, 0]

    seg = 64
    n_seg_rows = t * (-(-min(k, b) // seg))
    add(
        "stage_blend_fwd_bwd", chain(blend_bwd_body),
        2 * blend_io + n_seg_rows * px * 4 + tile_data.nbytes,
    )

    # backward scatter-add (the gather's transpose): table read+write + the
    # cotangent rows — the measured ~1.7 ms XLA floor in context
    d_td = jnp.ones_like(tile_data)

    def scatter_body(acc):
        out_t = jnp.zeros((n + 1, 16), jnp.float32)
        out_t = out_t.at[gids + (acc.astype(jnp.int32) & 0)].add(d_td)
        return out_t[0, 0]

    add(
        "stage_bwd_scatter_add", chain(scatter_body),
        2 * (n + 1) * 16 * 4 + d_td.nbytes,
    )
    return rows


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

    if not os.environ.get("BENCH_SKIP_ROOFLINE"):
        # hardware-anchored perf accounting (VERDICT r3 weak #5); guarded so
        # a relay hiccup cannot take the headline metric down with it
        try:
            bench_roofline(n_gaussians, width, height)
        except Exception as exc:  # pragma: no cover - relay hiccups
            print(f"bench_roofline failed: {exc!r}", file=sys.stderr)

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
