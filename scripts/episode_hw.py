"""Hardware episode harness: run a full active-exploration episode on the
ambient accelerator, then score coverage + map quality and write one JSON
artifact (the EPISODE_r{N}.json quality ledger — VERDICT round-2 item 4:
throughput has a ledger, quality needs one too).

Knobs via env:
  EP_OUT      output JSON path            (default episodes/episode.json)
  EP_DIR      results dir                 (default episodes/<name>)
  EP_STEPS    step budget                 (default 1000 — the reference's
                                           small-scene protocol,
                                           run_batch_scenes.sh:13)
  EP_SCENE    two_room | single_room      (default two_room)
  EP_SEED     world seed                  (default 0)
  EP_RES      sensor resolution           (default 256)
  EP_ITERS    mapping_iters               (default 2 — benchmark schedule)
  EP_MAP_EVERY / EP_KF_EVERY              (default 5 / 5)
  EP_DENSIFY_DOWNSCALE                    (default 1)
  EP_PRUNE    1 = prune_gaussians on      (default 0)
  EP_K        starting k_per_tile         (default 256)
  EP_KMAX     k_per_tile ceiling          (default 1024)
  EP_EXACT_ONLINE 1 = online PSNR/depth from exact renders (default 1)
  EP_STRIDE   eval frame stride           (default 10)
  EP_WINDOW   mapping_window_size         (default: MapperConfig default;
                                           the high-resolution protocol uses
                                           12, gibson_high_resolution.json)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import dataclasses

    from activesplat_tpu.eval.replay import eval_actions, eval_map_quality
    from activesplat_tpu.mapper.config import MapperConfig
    from activesplat_tpu.runtime.launch import make_synthetic_dataset, run_episode

    name = os.environ.get("EP_NAME", "episode")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results_dir = os.environ.get(
        "EP_DIR", os.path.join(root, "episodes", name)
    )
    out_path = os.environ.get(
        "EP_OUT", os.path.join(root, "episodes", f"{name}.json")
    )
    steps = int(os.environ.get("EP_STEPS", 1000))
    scene = os.environ.get("EP_SCENE", "two_room")
    seed = int(os.environ.get("EP_SEED", 0))
    res = int(os.environ.get("EP_RES", 256))

    cfg = MapperConfig(
        mapping_iters=int(os.environ.get("EP_ITERS", 2)),
        map_every=int(os.environ.get("EP_MAP_EVERY", 5)),
        kf_every=int(os.environ.get("EP_KF_EVERY", 5)),
        densify_downscale_factor=int(os.environ.get("EP_DENSIFY_DOWNSCALE", 1)),
        prune_gaussians=bool(int(os.environ.get("EP_PRUNE", 0))),
        k_per_tile=int(os.environ.get("EP_K", 256)),
        k_per_tile_max=int(os.environ.get("EP_KMAX", 1024)),
        exact_online_metrics=bool(int(os.environ.get("EP_EXACT_ONLINE", 1))),
        **(
            {"mapping_window_size": int(os.environ["EP_WINDOW"])}
            if "EP_WINDOW" in os.environ
            else {}
        ),
        # EP_CAP bounds max_capacity (gaussians). The 512px high-res protocol
        # exhausts v5e-1's 16 GB HBM above ~1M gaussians with hybrid exact
        # training at k=1024 (r05_highres OOM at action 105); 1<<20 is the
        # repro-validated shape (scripts/perf/repro_highres_512.py)
        **(
            {"max_capacity": int(os.environ["EP_CAP"])}
            if "EP_CAP" in os.environ
            else {}
        ),
    )
    knobs = {
        "steps": steps, "scene": f"{scene}-{seed}", "res": res,
        "mapping_iters": cfg.mapping_iters, "map_every": cfg.map_every,
        "densify_downscale_factor": cfg.densify_downscale_factor,
        "prune": cfg.prune_gaussians, "k_per_tile": cfg.k_per_tile,
        "k_per_tile_max": cfg.k_per_tile_max,
        "max_capacity": cfg.max_capacity,
    }
    print("episode knobs:", json.dumps(knobs))

    dataset = make_synthetic_dataset(
        scene_id=scene, seed=seed, step_num=steps, width=res, height=res,
        results_dir=results_dir,
    )

    # force first device contact OUTSIDE the episode loop under its own
    # stage: the axon relay's backend init intermittently hangs 10-15 min
    # (EPISODE_r04 warm run: 949.5 s attributed to mapper/first_frame was
    # this), which otherwise poisons whatever stage touches the device first
    from activesplat_tpu.utils.relay import with_retry
    from activesplat_tpu.utils.tracing import install_io_counters, stage

    install_io_counters()
    with stage("device_warmup"):
        import jax
        import jax.numpy as jnp

        with_retry(
            lambda: float(np.asarray(jnp.zeros((1,), jnp.float32) + 1.0)[0]),
            desc="device warmup", stall_warn_s=60.0,
        )

    t0 = time.time()
    mapper_node, planner = run_episode(dataset, results_dir, mapper_cfg=cfg)
    wall = time.time() - t0
    from activesplat_tpu.utils.tracing import stage_report_full, stage_report_io

    # [sum_s, calls, max_call_s]: the max flags one-off relay hangs (a stage
    # whose max is >>mean was stalled by the tunnel, not steady-state cost)
    stage_sums = {
        k: [round(s, 1), c, round(mx, 1)] for k, (s, c, mx) in sorted(
            stage_report_full().items(), key=lambda kv: -kv[1][0]
        )
    }
    # per-stage device-IO decomposition: jit dispatches / eager ops / host
    # fetches / fetched MB — each dispatch or fetch is a ~1 ms relay
    # roundtrip, so stage wall-clock above decomposes mechanically
    stage_io = {
        k: {
            "jit": v["jit"], "eager": v["eager"], "fetch": v["fetch"],
            "fetch_mb": round(v["fetch_bytes"] / 1e6, 3),
        }
        for k, v in sorted(stage_report_io().items())
    }
    mapper = mapper_node.mapper
    final_k = mapper.cfg.k_per_tile
    num_g = mapper.num_gaussians()
    online_psnr = [m["psnr"] for m in mapper.online_metrics]
    dropped_trace = [m.get("dropped", 0) for m in mapper.online_metrics]
    print(
        f"episode done in {wall/60:.1f} min: {num_g} gaussians, final "
        f"k_per_tile {final_k}, last online psnr {online_psnr[-1]:.2f}"
    )

    # coverage judge (fresh replay dataset, same constructor params)
    report = eval_actions(
        make_synthetic_dataset(
            scene_id=scene, seed=seed, step_num=steps, width=res, height=res
        ),
        os.path.join(results_dir, "actions.txt"),
        workers=0,
    )
    # map quality over the dumped trajectory
    quality = eval_map_quality(
        os.path.join(results_dir, "gaussians_data", "params.npz"),
        os.path.join(results_dir, "gaussians_data"),
        frame_stride=int(os.environ.get("EP_STRIDE", 10)),
        k_per_tile=final_k,
    )
    artifact = {
        "knobs": knobs,
        "wall_clock_min": round(wall / 60, 2),
        "num_gaussians": int(num_g),
        "final_k_per_tile": int(final_k),
        "avg_iter_ms": round(
            mapper.mapping_iter_time_sum
            / max(mapper.mapping_iter_time_count, 1) * 1000, 3,
        ),
        "completeness_m": round(report.completeness, 4),
        "completeness_ratio": round(report.completeness_ratio, 4),
        "accuracy_m": round(report.accuracy, 4),
        "path_length_m": round(report.path_length, 2),
        "online_psnr_last100_mean": round(float(np.mean(online_psnr[-100:])), 2),
        "dropped_max": int(max(dropped_trace) if dropped_trace else 0),
        **{k: round(float(v), 4) for k, v in quality.items()},
        "stage_sums_s": stage_sums,  # {stage: [seconds, calls]}, loop stages
        "stage_io": stage_io,  # {stage: {jit, eager, fetch, fetch_mb}}
        # k-ceiling gradient-bias ledger: exact-vs-truncated online deltas
        "truncation_bias": mapper.truncation_bias(),
        # every transition past the first is a recompile of the program set
        "shape_history": mapper.shape_history,
        "pano_cache": {
            "hits": mapper_node.pano_cache_hits,
            "misses": mapper_node.pano_cache_misses,
            "stale": mapper_node.pano_cache_stale,
        },
        # planner decision summary (full ledger: <results>/planner_log.jsonl)
        "planner": {
            "targets": sum(
                1 for e in planner.decision_log if e["event"] == "target"
            ),
            "refines": sum(
                1 for e in planner.decision_log if e["event"] == "refine_begin"
            ),
            "bounces": sum(
                1 for e in planner.decision_log if e["event"] == "bounce"
            ),
            "scan_churn_breaks": planner.scan_churn_breaks,
            "fail_nodes": len(planner.fail_nodes_index),
        },
        # full vs windowed vs no-op topdown re-renders (IncrementalTopdown)
        "topdown_renders": (
            dict(mapper_node._topdown_inc.stats)
            if mapper_node._topdown_inc is not None
            else None
        ),
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=2)
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
