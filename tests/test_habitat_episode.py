"""Full hermetic episode through the HABITAT adapter path: scene config JSON
-> env yaml -> HabitatDataset(sim_factory=BoxWorld mock) -> MapperNode +
PlannerFSM -> reference result layout -> coverage judge. This is the same
assembly the real wheels would take (reference: launch/habitat.launch ->
mapper_node.py:34-137), with only the simulator mocked."""

import json
import os

import numpy as np
import pytest
import yaml

from activesplat_tpu.configs import load_scene_config
from activesplat_tpu.io.actions import read_actions
from activesplat_tpu.mapper.config import MapperConfig
from activesplat_tpu.runtime.launch import build_episode_from_config, run_episode
from activesplat_tpu.runtime.mock_habitat import BoxWorldSim, make_mock_sim


def write_test_env_yaml(path, width=48, height=48, turn=30.0):
    """A small-resolution variant of activesplat_pointnav.yaml (coarse turns
    keep the bootstrap spin short on the 1-core test CPU)."""
    env = {
        "habitat": {
            "simulator": {
                "turn_angle": turn,
                "tilt_angle": 15,
                "forward_step_size": 0.065,
                "agents": {
                    "main_agent": {
                        "height": 1.5,
                        "radius": 0.1,
                        "sim_sensors": {
                            "rgb_sensor": {
                                "width": width,
                                "height": height,
                                "hfov": 90,
                                "position": [0, 1.25, 0],
                            },
                            "depth_sensor": {
                                "width": width,
                                "height": height,
                                "hfov": 90,
                                "min_depth": 0.0,
                                "max_depth": 10.0,
                                "position": [0, 1.25, 0],
                            },
                        },
                    }
                },
                "habitat_sim_v0": {"allow_sliding": False},
            }
        }
    }
    with open(path, "w") as fh:
        yaml.safe_dump(env, fh)
    return path


def scene_config(env_yaml, step_num=60):
    """gibson.json-shaped scene config pointing at the test env yaml."""
    cfg = load_scene_config("gibson")
    cfg = json.loads(json.dumps(cfg))  # deep copy
    cfg["env"]["config"] = env_yaml
    cfg["dataset"]["step_num"] = step_num
    cfg["dataset"]["scene_id"] = "MockDenmark"
    cfg["dataset"]["far"] = 10
    cfg["painter"]["grid_map"]["pixel_max"] = 56
    return cfg


@pytest.fixture(scope="module")
def mock_episode(tmp_path_factory):
    results_dir = str(tmp_path_factory.mktemp("habitat_episode"))
    env_yaml = write_test_env_yaml(os.path.join(results_dir, "env.yaml"))
    cfg = scene_config(env_yaml)
    episode = build_episode_from_config(
        cfg, results_dir, sim_factory=make_mock_sim
    )
    # shrink compute to test scale (the config's MapperConfig is the
    # benchmark one); scheduling stays config-driven
    mapper_cfg = episode["mapper_cfg"]
    import dataclasses

    mapper_cfg = dataclasses.replace(
        mapper_cfg,
        initial_capacity=1 << 12,
        max_capacity=1 << 13,
        keyframe_capacity=64,
        chunk=128,
        kf_select_pixels=128,
    )
    mapper_node, planner = run_episode(
        episode["dataset"],
        results_dir,
        mapper_cfg=mapper_cfg,
        pixel_max=episode["pixel_max"],
        max_ticks=300,
        pano_scale=0.4,
        single_floor_expansion=episode["single_floor_expansion"],
        agent_foot_adjust=episode["agent_foot_adjust"],
    )
    return results_dir, mapper_node, planner, episode["dataset"], cfg


def test_config_drives_the_episode(mock_episode):
    results_dir, mapper_node, planner, dataset, cfg = mock_episode
    # dataset really is the habitat adapter, built from the JSON + yaml
    from activesplat_tpu.runtime.habitat_backend import HabitatDataset

    assert isinstance(dataset, HabitatDataset)
    assert isinstance(dataset._sim, BoxWorldSim)
    assert dataset.get_scene_id() == "MockDenmark"
    assert dataset.step_num == 60
    assert dataset.sensor.width == 48
    # mapper schedule came from the config's mapper block
    assert mapper_node.mapper.cfg.map_every == cfg["mapper"]["map_every"]
    # topdown grid came from the painter block
    assert max(mapper_node.topdown_cfg.grid_shape) <= 56 + 1


def test_mock_episode_budget_and_outputs(mock_episode):
    results_dir, mapper_node, planner, dataset, cfg = mock_episode
    steps, budget = dataset.get_step_info()
    assert steps == budget == 60, f"budget not consumed: {steps}/{budget}"
    assert mapper_node.mapper.num_gaussians() > 500
    # the reference result layout (README.md:139-158) incl. the adapter's
    # actions.txt (written by HabitatDataset.step, not SyntheticDataset)
    for rel in (
        "actions.txt",
        os.path.join("gaussians_data", "params.npz"),
        os.path.join("gaussians_data", "transforms.json"),
        "visited_map.png",
        "topdown_free_map.png",
    ):
        assert os.path.exists(os.path.join(results_dir, rel)), rel
    actions = read_actions(os.path.join(results_dir, "actions.txt"))
    assert len(actions) == 60 and all(0 <= a <= 5 for a in actions)


def test_mock_episode_explored(mock_episode):
    results_dir, mapper_node, planner, dataset, cfg = mock_episode
    visited = planner.visited_px
    assert len(visited) > 10
    assert np.ptp(visited, axis=0).max() > 2.0, "agent never translated"


def test_coverage_judge_replays_through_adapter(mock_episode):
    """eval_actions over a fresh 'Eval'-mode HabitatDataset (mock sim) —
    the reference judge flow (eval_actions.py:42-153)."""
    results_dir, mapper_node, planner, dataset, cfg = mock_episode
    from activesplat_tpu.eval.replay import eval_actions
    from activesplat_tpu.runtime.habitat_backend import get_dataset

    eval_ds = get_dataset(
        cfg,
        {"datasets": {"gibson": {"root": "/nonexistent"}}},
        scene_id="Eval",
        sim_factory=make_mock_sim,
    )
    report = eval_actions(
        eval_ds,
        os.path.join(results_dir, "actions.txt"),
        num_gt_samples=20_000,
        frame_stride=2,
    )
    assert report.completeness_ratio > 0.05
    assert np.isfinite(report.accuracy)
    assert report.path_length >= 0


def test_batch_default_habitat_factory(tmp_path):
    """run_batch's default factory builds episode and Eval datasets from the
    scene lists without a caller-supplied dataset_factory."""
    from activesplat_tpu.eval.batch import habitat_dataset_factory, habitat_scene_specs
    from activesplat_tpu.runtime.habitat_backend import HabitatDataset

    factory = habitat_dataset_factory(sim_factory=make_mock_sim)
    spec = habitat_scene_specs("gibson_small")[0]
    ds = factory(spec, str(tmp_path / "run0"))
    assert isinstance(ds, HabitatDataset)
    assert ds.get_scene_id() == spec["scene_id"] == "Denmark"
    assert ds.step_num == 1000
    assert ds.results_dir == str(tmp_path / "run0")
    # config.json dumped like the reference's results dir
    assert os.path.exists(tmp_path / "run0" / "config.json")
    eval_ds = factory(spec, None)
    assert eval_ds.results_dir is None  # Eval mode: no actions.txt
    assert eval_ds.get_scene_id() == "Denmark"


def test_cli_consumes_config(monkeypatch, tmp_path):
    """launch.py main(): --config synthetic_small must shape the dataset and
    the MapperConfig (the round-2 CLI read only step_num)."""
    import activesplat_tpu.runtime.launch as launch

    captured = {}

    def fake_run_episode(dataset, results_dir, mapper_cfg=None, pixel_max=360,
                         **kw):
        captured.update(
            dataset=dataset, mapper_cfg=mapper_cfg, pixel_max=pixel_max, **kw
        )

        class _M:
            class mapper:
                @staticmethod
                def num_gaussians():
                    return 0

        return _M(), None

    monkeypatch.setattr(launch, "run_episode", fake_run_episode)
    monkeypatch.setattr(
        "sys.argv",
        [
            "launch",
            "--config", "synthetic_small",
            "--results_dir", str(tmp_path),
            "--step_num", "7",
        ],
    )
    launch.main()
    ds = captured["dataset"]
    assert ds.get_scene_id().startswith("single_room")  # from the JSON
    assert ds.step_num == 7  # explicit CLI flag overrides the JSON
    assert ds.sensor.width == 256  # from the JSON env block
    assert captured["pixel_max"] == 360  # from the JSON painter block
    assert isinstance(captured["mapper_cfg"], MapperConfig)
    assert captured["mapper_cfg"].sil_thres == 0.98
    # config-driven MapperConfig really differs when the JSON says so
    cfg_hr = load_scene_config("gibson_high_resolution")
    from activesplat_tpu.configs import mapper_config_from_scene

    assert mapper_config_from_scene(cfg_hr).mapping_iters == 10
