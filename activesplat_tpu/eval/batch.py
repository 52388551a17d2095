"""Batch scene evaluation: run episodes over scene lists and aggregate
judges (reference: scripts/batch/run_batch_scenes.sh + eval_results_actions.py
— loops scenes x repetitions, then scores every actions.txt)."""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from activesplat_tpu.eval.replay import eval_actions
from activesplat_tpu.mapper.config import MapperConfig
from activesplat_tpu.runtime.launch import make_synthetic_dataset, run_episode

# synthetic benchmark suite (role of gibson_small.txt etc.)
SCENE_SETS: Dict[str, List[Dict]] = {
    "synthetic_small": [
        {"scene_id": "single_room", "seed": s, "step_num": 300} for s in range(3)
    ],
    "synthetic_big": [
        {"scene_id": "two_room", "seed": s, "step_num": 600} for s in range(3)
    ],
}

# the reference's 13-scene benchmark protocol: scene-list name ->
# (dataset config, step budget) (run_batch_scenes.sh:13-21)
HABITAT_SCENE_SETS: Dict[str, tuple] = {
    "gibson_small": ("gibson", 1000),
    "gibson_big": ("gibson_large", 2000),
    "mp3d_small": ("mp3d", 1000),
    "mp3d_big": ("mp3d_large", 2000),
}


def habitat_scene_specs(set_name: str) -> List[Dict]:
    """Episode specs for a reference scene list (needs the habitat wheels to
    actually run; the spec surface is importable everywhere)."""
    from activesplat_tpu.configs import load_scene_config, load_scene_list

    config_name, step_num = HABITAT_SCENE_SETS[set_name]
    cfg = load_scene_config(config_name)
    return [
        {
            "scene_id": scene,
            "seed": 0,
            "step_num": step_num,
            "scene_config": cfg,
        }
        for scene in load_scene_list(set_name)
    ]


def run_batch(
    scene_set: str,
    output_dir: str,
    repetitions: int = 1,
    mapper_cfg: Optional[MapperConfig] = None,
    width: int = 128,
    height: int = 128,
    pixel_max: int = 180,
    dataset_factory=None,
) -> List[Dict]:
    """Run episodes + coverage judge over a scene set; writes
    actions_error.txt per run and a summary.json (eval_results_actions.py
    output shape). scene_set may be a synthetic set or one of the reference
    habitat lists (HABITAT_SCENE_SETS — pass a dataset_factory(spec,
    results_dir) building HabitatDataset when the wheels exist)."""
    if scene_set in HABITAT_SCENE_SETS:
        specs = habitat_scene_specs(scene_set)
        if dataset_factory is None:
            raise RuntimeError(
                f"scene set {scene_set!r} needs a habitat dataset_factory "
                "(the wheels are not bundled); see runtime/habitat_backend.py"
            )
    else:
        specs = SCENE_SETS[scene_set]
    results = []
    for spec in specs:

        def build(results_dir):
            # one constructor for the episode and replay datasets, so their
            # parameters can never silently diverge
            if dataset_factory is not None:
                return dataset_factory(spec, results_dir)
            return make_synthetic_dataset(
                scene_id=spec["scene_id"],
                seed=spec["seed"],
                step_num=spec["step_num"],
                width=width,
                height=height,
                results_dir=results_dir,
            )

        for rep in range(repetitions):
            run_name = f"{spec['scene_id']}-{spec['seed']}-rep{rep}"
            results_dir = os.path.join(output_dir, run_name)
            run_episode(
                build(results_dir), results_dir,
                mapper_cfg=mapper_cfg, pixel_max=pixel_max,
            )
            report = eval_actions(
                build(None), os.path.join(results_dir, "actions.txt")
            )
            with open(os.path.join(results_dir, "actions_error.txt"), "w") as fh:
                fh.write(report.as_row() + "\n")
            results.append(
                {
                    "run": run_name,
                    "completeness": report.completeness,
                    "completeness_ratio": report.completeness_ratio,
                    "accuracy": report.accuracy,
                    "path_length": report.path_length,
                }
            )
    summary = {
        "scene_set": scene_set,
        "runs": results,
        "mean_completeness": float(np.mean([r["completeness"] for r in results])),
        "mean_completeness_ratio": float(
            np.mean([r["completeness_ratio"] for r in results])
        ),
        "mean_accuracy": float(np.mean([r["accuracy"] for r in results])),
    }
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    return results
