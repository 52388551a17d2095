"""Decompose the in-episode queries/topdown cost (EPISODE_r05: 904.6 s /
645 calls = 1.4 s mean, the largest stage at 43% of wall).

Loads a finished episode's params.npz (the r05_fixed headline checkpoint is
988k Gaussians) and times every piece of IncrementalTopdown.refresh at the
real shapes on hardware, fetch-synced through the relay:

  diff        _changed_bbox jit + (7,) fetch            (paid on EVERY call)
  pair        _topdown_binary (both exact renders) + u8 fetch  (full path)
  free_only   the height-sliced exact render alone, ladder (0.5, 1.0, 2.0)
  full_only   the all-Gaussian exact render alone, ladder (1.0, 2.0)
  win<S>      the windowed pair at each ladder rung + fetch  (window path)

Env: EP_DIR (default episodes/r05_fixed), EP_SCENE/EP_SEED/EP_RES,
PIXEL_MAX, REPS (default 20). Run with ambient JAX_PLATFORMS=axon.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def timed(fn, reps):
    fn()  # compile + warm
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from activesplat_tpu.io.params_io import buffer_from_params, load_params
    from activesplat_tpu.models.gaussians import make_camera
    from activesplat_tpu.ops.render import forward_backend, render_jit
    from activesplat_tpu.queries import topdown as T
    from activesplat_tpu.runtime.launch import make_synthetic_dataset

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    results_dir = os.environ.get(
        "EP_DIR", os.path.join(root, "episodes", "r05_fixed")
    )
    scene = os.environ.get("EP_SCENE", "two_room")
    seed = int(os.environ.get("EP_SEED", 0))
    res = int(os.environ.get("EP_RES", 256))
    pixel_max = int(os.environ.get("PIXEL_MAX", 360))
    reps = int(os.environ.get("REPS", 20))

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
        "ladder": list(T.default_window_ladder(cfg)),
    }
    print(json.dumps(rows), flush=True)
    backend = forward_backend()
    cam = T.topdown_camera(cfg)
    foot = jnp.float32(cfg.agent_foot)
    head = jnp.float32(cfg.agent_head)

    out = {}

    # 1. diff (clean: params vs themselves — same cost as the dirty case)
    def diff():
        packed = T._changed_bbox(
            buf.params, buf.active, buf.params, buf.active,
            jnp.float32(T.TOPDOWN_SCALE_MODIFIER),
        )
        return np.asarray(packed)

    out["diff_ms"] = timed(diff, reps)
    print(json.dumps({"diff_ms": out["diff_ms"]}), flush=True)

    # 2. the full pair exactly as the service runs it
    def pair():
        both, _ = T._topdown_binary(
            buf, cam, foot, head, height_axis=cfg.height_axis,
            chunk=256, k_per_tile=256, backend=backend,
        )
        return np.asarray(both)

    out["pair_ms"] = timed(pair, reps)
    print(json.dumps({"pair_ms": out["pair_ms"]}), flush=True)

    # 3. each exact render alone (fetch one scalar to sync)
    import functools

    @functools.partial(jax.jit, static_argnames=("which",))
    def one_render(buf, cam, foot, head, which):
        sliced = T._band_mask(buf.params.means3d, cfg.height_axis, foot, head)
        if which == "free":
            r = render_jit(
                buf, cam, scale_modifier=T.TOPDOWN_SCALE_MODIFIER, chunk=256,
                active_override=sliced, k_per_tile=256, backend=backend,
                exact=True, exact_ladder=(0.5, 1.0, 2.0),
            )
            return r.alpha.sum()
        r = render_jit(
            buf, cam, bg=jnp.ones(3), scale_modifier=T.TOPDOWN_SCALE_MODIFIER,
            chunk=256, k_per_tile=256, backend=backend, exact=True,
            exact_ladder=(1.0, 2.0),
        )
        return r.rgb.sum()

    for which in ("free", "full"):
        out[f"{which}_only_ms"] = timed(
            lambda w=which: float(np.asarray(one_render(buf, cam, foot, head, w))),
            reps,
        )
        print(json.dumps({f"{which}_only_ms": out[f"{which}_only_ms"]}), flush=True)

    # 4. windowed pair at each rung
    for win in T.default_window_ladder(cfg):
        u0 = max(0, (cfg.width - win) // 2)
        v0 = max(0, (cfg.height - win) // 2)
        wcam = T.topdown_window_camera(cfg, u0, v0, win, win)

        def wpair(wc=wcam):
            both, _ = T._topdown_binary(
                buf, wc, foot, head, height_axis=cfg.height_axis,
                chunk=256, k_per_tile=256, backend=backend,
            )
            return np.asarray(both)

        out[f"win{win}_ms"] = timed(wpair, reps)
        print(json.dumps({f"win{win}_ms": out[f"win{win}_ms"]}), flush=True)

    # 5. end-to-end refresh: window path (perturb a tight cluster) and the
    # oversize->full path (perturb two far-apart clusters)
    inc = T.IncrementalTopdown(cfg)
    inc._full(buf, 0.0, 256)

    means = np.asarray(buf.params.means3d)
    act = np.asarray(buf.active)
    center = means[act].mean(0)
    d = np.linalg.norm(means - center, axis=1)
    near = np.argsort(np.where(act, d, np.inf))[:2048]

    def perturb(idx):
        new_means = jnp.asarray(means).at[idx].add(0.003)
        params = buf.params.replace(means3d=new_means)
        return buf.replace(params=params)

    buf_local = perturb(near)

    def refresh_window():
        inc._snap = (buf.params, buf.active)
        inc._maps = (np.zeros((cfg.height, cfg.width), np.uint8),) * 2
        return inc.refresh(buf_local, 0.0, 256)

    out["refresh_window_ms"] = timed(refresh_window, max(5, reps // 2))
    print(json.dumps({
        "refresh_window_ms": out["refresh_window_ms"], "stats": inc.stats,
    }), flush=True)

    far = np.argsort(np.where(act, -d, -np.inf))[:1024]
    buf_spread = perturb(np.concatenate([near[:1024], far]))

    def refresh_full():
        inc._snap = (buf.params, buf.active)
        return inc.refresh(buf_spread, 0.0, 256)

    out["refresh_full_ms"] = timed(refresh_full, max(5, reps // 2))
    print(json.dumps({
        "refresh_full_ms": out["refresh_full_ms"], "stats": inc.stats,
    }), flush=True)

    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
