"""Rescore an already-run hardware episode from its saved artifacts.

Runs the two offline judges over a results dir produced by
scripts/episode_hw.py (or any run_episode output): map quality
(render params.npz at every dumped pose — TPU) and the coverage judge
(replay actions.txt against a fresh dataset — CPU KD-tree), then writes
the same JSON artifact episode_hw.py would have. Lets a killed eval be
recovered without re-running the 1-2 h episode.

Knobs via env (mirror episode_hw.py):
  EP_NAME / EP_DIR / EP_OUT, EP_STEPS, EP_SCENE, EP_SEED, EP_RES,
  EP_STRIDE, EP_K (k_per_tile used for quality renders),
  EP_WALL_MIN / EP_NUM_G / EP_AVG_ITER_MS / EP_DROPPED_MAX (carried
  over from the episode log — not recomputable offline), plus the
  knob record fields EP_ITERS/EP_MAP_EVERY/EP_DENSIFY_DOWNSCALE/EP_PRUNE.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from activesplat_tpu.eval.replay import eval_actions, eval_map_quality
    from activesplat_tpu.runtime.launch import make_synthetic_dataset

    name = os.environ.get("EP_NAME", "episode")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results_dir = os.environ.get("EP_DIR", os.path.join(root, "episodes", name))
    out_path = os.environ.get("EP_OUT", os.path.join(root, "episodes", f"{name}.json"))
    steps = int(os.environ.get("EP_STEPS", 1000))
    scene = os.environ.get("EP_SCENE", "two_room")
    seed = int(os.environ.get("EP_SEED", 0))
    res = int(os.environ.get("EP_RES", 256))
    final_k = int(os.environ.get("EP_K", 1024))

    knobs = {
        "steps": steps, "scene": f"{scene}-{seed}", "res": res,
        "mapping_iters": int(os.environ.get("EP_ITERS", 2)),
        "map_every": int(os.environ.get("EP_MAP_EVERY", 5)),
        "densify_downscale_factor": int(os.environ.get("EP_DENSIFY_DOWNSCALE", 1)),
        "prune": bool(int(os.environ.get("EP_PRUNE", 0))),
        "k_per_tile": int(os.environ.get("EP_K0", 256)),
        "k_per_tile_max": int(os.environ.get("EP_KMAX", 1024)),
    }
    print("rescore knobs:", json.dumps(knobs), flush=True)

    gd = os.path.join(results_dir, "gaussians_data")
    quality = eval_map_quality(
        os.path.join(gd, "params.npz"), gd,
        frame_stride=int(os.environ.get("EP_STRIDE", 10)),
        k_per_tile=final_k,
    )
    print("quality:", json.dumps({k: float(v) for k, v in quality.items()}), flush=True)

    report = eval_actions(
        make_synthetic_dataset(
            scene_id=scene, seed=seed, step_num=steps, width=res, height=res
        ),
        os.path.join(results_dir, "actions.txt"),
        workers=0,
    )

    online_psnr = np.loadtxt(os.path.join(gd, "online_psnr.txt"))
    artifact = {
        "knobs": knobs,
        "wall_clock_min": float(os.environ.get("EP_WALL_MIN", 0.0)),
        "num_gaussians": int(os.environ.get("EP_NUM_G", 0)),
        "final_k_per_tile": final_k,
        "avg_iter_ms": float(os.environ.get("EP_AVG_ITER_MS", 0.0)),
        "completeness_m": round(report.completeness, 4),
        "completeness_ratio": round(report.completeness_ratio, 4),
        "accuracy_m": round(report.accuracy, 4),
        "path_length_m": round(report.path_length, 2),
        "online_psnr_last100_mean": round(float(np.mean(online_psnr[-100:])), 2),
        "dropped_max": int(os.environ.get("EP_DROPPED_MAX", 0)),
        **{k: round(float(v), 4) for k, v in quality.items()},
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=2)
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
