"""Build a realistic ~1M-Gaussian params.npz WITHOUT a training run.

The round-5 container reset deleted the episode checkpoints the topdown
profiler (profile_topdown_refresh.py) loads. A converged map's topdown cost
is dominated by its spatial distribution (wall-concentrated memberships,
saturated tiles), not by the optimizer's exact values — so this drives the
deterministic synthetic scene with a spin+wander policy, backprojects every
valid depth pixel (the same initialization geometry as the mapper,
mapper/geometry.py:44), subsamples to a target count, and writes the
params.npz schema that buffer_from_params understands. Opacities are set
near-saturated (logit 4) to match a converged map's compositing behavior.

Env: EP_DIR (default episodes/synth_1m), EP_SCENE, EP_SEED, EP_RES,
TARGET (default 988000), STEPS (default 900). CPU-only, ~2 min.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main():
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out_dir = os.environ.get("EP_DIR", os.path.join(root, "episodes", "synth_1m"))
    scene = os.environ.get("EP_SCENE", "two_room")
    seed = int(os.environ.get("EP_SEED", 0))
    res = int(os.environ.get("EP_RES", 256))
    target = int(os.environ.get("TARGET", 988_000))
    steps = int(os.environ.get("STEPS", 900))

    from activesplat_tpu.runtime.dataloader import SimAction
    from activesplat_tpu.runtime.launch import make_synthetic_dataset

    ds = make_synthetic_dataset(
        scene_id=scene, seed=seed, step_num=steps + 10, width=res, height=res
    )
    rng = np.random.default_rng(seed)
    fx, fy = ds.sensor.intrinsics[0, 0], ds.sensor.intrinsics[1, 1]
    cx, cy = ds.sensor.intrinsics[0, 2], ds.sensor.intrinsics[1, 2]

    pts_all, rgb_all, scl_all = [], [], []

    def grab():
        fr = ds.get_frame()
        depth = fr["depth"].astype(np.float64)
        h, w = depth.shape
        us = np.arange(w)[None, :] - cx
        vs = np.arange(h)[:, None] - cy
        x = us / fx * depth
        y = vs / fy * depth
        pc = np.stack([x, y, depth], -1).reshape(-1, 3)
        c2w = fr["c2w"].astype(np.float64)
        pw = pc @ c2w[:3, :3].T + c2w[:3, 3]
        valid = depth.reshape(-1) > 0
        pts_all.append(pw[valid].astype(np.float32))
        rgb_all.append(fr["rgb"].reshape(-1, 3)[valid].astype(np.float32) / 255.0)
        scl_all.append((depth.reshape(-1)[valid] / ((fx + fy) / 2)).astype(np.float32))

    # policy: initial full spin, then wander (forward until blocked, then a
    # random turn burst), re-spinning every ~120 steps — crude but covers
    # both rooms of two_room the way a real episode does
    t = 0
    spin_left = 36
    turn_burst = 0
    while t < steps and not ds.is_finished():
        if spin_left > 0:
            ds.step(SimAction.TURN_LEFT)
            spin_left -= 1
        elif turn_burst > 0:
            ds.step(SimAction.TURN_RIGHT if turn_burst % 2 else SimAction.TURN_LEFT)
            turn_burst -= 1
        else:
            moved = ds.step(SimAction.MOVE_FORWARD)
            if not moved:
                turn_burst = int(rng.integers(6, 18))
        t += 1
        if t % 3 == 0:
            grab()
        if t % 120 == 0:
            spin_left = 36

    pts = np.concatenate(pts_all)
    rgb = np.concatenate(rgb_all)
    scl = np.concatenate(scl_all)
    print(f"collected {len(pts)} backprojected points from {t} steps")
    if len(pts) > target:
        idx = rng.choice(len(pts), target, replace=False)
        pts, rgb, scl = pts[idx], rgb[idx], scl[idx]

    n = len(pts)
    params = {
        "means3D": pts,
        "rgb_colors": rgb,
        "unnorm_rotations": np.tile(
            np.array([1, 0, 0, 0], np.float32), (n, 1)
        ),
        "logit_opacities": np.full((n, 1), 4.0, np.float32),
        "log_scales": np.log(np.maximum(scl, 1e-10))[:, None],
        "timestep": np.zeros(n, np.float32),
    }
    gdir = os.path.join(out_dir, "gaussians_data")
    os.makedirs(gdir, exist_ok=True)
    path = os.path.join(gdir, "params.npz")
    np.savez(path, **params)
    print(f"wrote {path}: {n} gaussians")


if __name__ == "__main__":
    main()
