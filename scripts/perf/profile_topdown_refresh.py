"""Decompose the in-episode queries/topdown cost (EPISODE_r05: 904.6 s /
645 calls = 1.4 s mean, the largest stage at 43% of wall).

Loads a checkpoint's params.npz (episodes/synth_1m is a ~988k-Gaussian
backprojection build, scripts/perf/make_synthetic_checkpoint.py) and times
every piece of IncrementalTopdown.refresh at the real shapes on hardware,
fetch-synced through the relay:

  diff        _changed_bbox jit + (7,) fetch            (paid on EVERY call)
  pair        OLD two-render program (_topdown_binary)  (r5 baseline)
  dual        NEW single dual-transmittance program (_topdown_dual), full rect
  dual_win    the dual program at a small window rect (same executable)
  refresh_*   IncrementalTopdown end-to-end window / full paths

Measured r5-baseline @988k (grid 360x216): diff 36 ms, pair 263 ms,
win112 program 122 ms, refresh_window 284 ms, refresh_full 297 ms — i.e.
steady state explains only ~190 s of the 904.6 s episode stage; the rest is
compile/executable-load of the 3-programs-per-capacity design (44-54 MB
serialized each), which the dual program replaces.

Env: EP_DIR (default episodes/synth_1m), EP_SCENE/EP_SEED/EP_RES,
PIXEL_MAX, REPS (default 20), SKIP_PAIR=1 to skip the old-path baselines.
Run with ambient JAX_PLATFORMS=axon.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def timed(fn, reps):
    t0 = time.perf_counter()
    fn()  # compile + warm
    compile_s = time.perf_counter() - t0
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps * 1e3, compile_s


def main():
    import jax
    import jax.numpy as jnp

    from activesplat_tpu.io.params_io import buffer_from_params, load_params
    from activesplat_tpu.ops.render import forward_backend
    from activesplat_tpu.queries import topdown as T
    from activesplat_tpu.runtime.launch import make_synthetic_dataset

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    results_dir = os.environ.get(
        "EP_DIR", os.path.join(root, "episodes", "synth_1m")
    )
    scene = os.environ.get("EP_SCENE", "two_room")
    seed = int(os.environ.get("EP_SEED", 0))
    res = int(os.environ.get("EP_RES", 256))
    pixel_max = int(os.environ.get("PIXEL_MAX", 360))
    reps = int(os.environ.get("REPS", 20))
    skip_pair = os.environ.get("SKIP_PAIR", "0") == "1"

    ds = make_synthetic_dataset(
        scene_id=scene, seed=seed, step_num=10, width=res, height=res
    )
    frame0 = ds.get_frame()
    sensor_h = float(frame0["c2w"][1, 3])
    agent_foot = sensor_h - float(ds.sensor.position[1])
    agent_head = agent_foot + ds.agent_height
    cfg_ds = ds.dataset_config(results_dir)
    bbox = np.asarray(cfg_ds["scene_bbox"], np.float64).copy()
    bbox[1, 0] = max(bbox[1, 0], agent_foot - 0.25)
    bbox[1, 1] = min(bbox[1, 1], agent_head + 2.0)
    cfg = T.topdown_config_from_bbox(
        bbox, agent_foot=agent_foot, agent_head=agent_head,
        pixel_max=pixel_max, height_axis=1,
    )

    buf = buffer_from_params(
        load_params(os.path.join(results_dir, "gaussians_data", "params.npz"))
    )
    n_active = int(np.asarray(jnp.sum(buf.active)))
    sliced_n = int(np.asarray(jnp.sum(
        T.height_slice_mask(buf, cfg) & buf.active
    )))
    rows = {
        "capacity": buf.capacity, "active": n_active, "sliced": sliced_n,
        "grid": [cfg.height, cfg.width],
    }
    print(json.dumps(rows), flush=True)
    backend = forward_backend()
    cam = T.topdown_camera(cfg)
    foot = jnp.float32(cfg.agent_foot)
    head = jnp.float32(cfg.agent_head)

    out = {}

    def emit(name, val, compile_s):
        out[name] = val
        print(json.dumps({name: val, "compile_s": round(compile_s, 1)}),
              flush=True)

    # 1. diff (clean: params vs themselves — same cost as the dirty case)
    def diff():
        packed = T._changed_bbox(
            buf.params, buf.active, buf.params, buf.active,
            jnp.float32(T.TOPDOWN_SCALE_MODIFIER),
        )
        return np.asarray(packed)

    emit("diff_ms", *timed(diff, reps))

    # 2. OLD two-render pair program (the r5 episode baseline)
    if not skip_pair:
        def pair():
            both, _ = T._topdown_binary(
                buf, cam, foot, head, height_axis=cfg.height_axis,
                chunk=256, k_per_tile=256, backend=backend,
            )
            return np.asarray(both)

        emit("pair_ms", *timed(pair, reps))

    # 3. NEW dual program: full rect and a window rect (same executable —
    # the second timed() must show compile_s ~0)
    def dual(rect):
        both, _ = T._topdown_dual(
            buf, cam, foot, head, np.asarray(rect, np.int32),
            height_axis=cfg.height_axis, k_per_tile=256, backend=backend,
        )
        return np.asarray(both)

    emit("dual_full_ms", *timed(lambda: dual([0, 0, cfg.width, cfg.height]), reps))
    w = min(112, cfg.width)
    u0 = (cfg.width - w) // 2 // 16 * 16
    v0 = (cfg.height - w) // 2 // 16 * 16
    emit("dual_win112_ms", *timed(lambda: dual([u0, v0, w, w]), reps))

    # 4. end-to-end refresh: window path (perturb a tight cluster) and the
    # full path (fresh engine)
    inc = T.IncrementalTopdown(cfg)
    t0 = time.perf_counter()
    inc.refresh(buf)
    print(json.dumps({"first_refresh_s": round(time.perf_counter() - t0, 1)}),
          flush=True)

    means = np.asarray(buf.params.means3d)
    act = np.asarray(buf.active)
    center = means[act].mean(0)
    d = np.linalg.norm(means - center, axis=1)
    near = np.argsort(np.where(act, d, np.inf))[:2048]

    new_means = jnp.asarray(means).at[near].add(0.003)
    buf_local = buf.replace(params=buf.params.replace(means3d=new_means))

    def refresh_window():
        inc._snap = (buf.params, buf.active)
        inc._maps = (np.zeros((cfg.height, cfg.width), np.uint8),) * 2
        return inc.refresh(buf_local, 0.0, 256)

    ms, c = timed(refresh_window, max(5, reps // 2))
    emit("refresh_window_ms", ms, c)
    print(json.dumps({"stats": inc.stats}), flush=True)

    def refresh_full():
        inc._snap = None
        return inc.refresh(buf, 0.0, 256)

    ms, c = timed(refresh_full, max(5, reps // 2))
    emit("refresh_full_ms", ms, c)
    print(json.dumps({"stats": inc.stats}), flush=True)

    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
