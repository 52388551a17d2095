"""Hermetic full active-exploration loop: synthetic sim + planner + mapper
(the reference's roslaunch end-to-end, SURVEY.md section 3.1-3.5, with the
in-process bus)."""

import os

import numpy as np
import pytest

from activesplat_tpu.io.actions import read_actions
from activesplat_tpu.mapper.config import MapperConfig
from activesplat_tpu.runtime.dataloader import RGBDSensor, SyntheticDataset
from activesplat_tpu.runtime.launch import run_episode
from activesplat_tpu.runtime.synthetic import BoxWorld


@pytest.fixture(scope="module")
def episode(tmp_path_factory):
    results_dir = str(tmp_path_factory.mktemp("episode"))
    world = BoxWorld.single_room(seed=2)
    sensor = RGBDSensor.from_fov(48, 48, 90.0, depth_min=0.0, depth_max=10.0)
    dataset = SyntheticDataset(
        world,
        sensor,
        step_num=60,
        start_position=np.array([3.0, 0.0, 3.0]),
        turn_angle_deg=30.0,  # coarse turns keep the test's step budget small
        tilt_angle_deg=15.0,
        results_dir=results_dir,
        scene_id="test-room",
    )
    cfg = MapperConfig(
        initial_capacity=1 << 12,
        max_capacity=1 << 13,  # fixed small capacity: no growth recompiles,
        # 1-core-CPU-feasible render cost (extra candidates are dropped)
        keyframe_capacity=64,
        mapping_iters=2,
        map_every=5,
        kf_every=5,
        mapping_window_size=5,
        chunk=128,
        kf_select_pixels=128,
    )
    mapper_node, planner = run_episode(
        dataset,
        results_dir,
        mapper_cfg=cfg,
        pixel_max=56,
        max_ticks=300,
        pano_scale=0.4,
    )
    return results_dir, mapper_node, planner, dataset


def test_episode_consumes_budget(episode):
    results_dir, mapper_node, planner, dataset = episode
    steps, budget = dataset.get_step_info()
    assert steps == budget, f"budget not consumed: {steps}/{budget}"
    assert mapper_node.mapper.num_gaussians() > 500


def test_episode_outputs(episode):
    results_dir, mapper_node, planner, dataset = episode
    # the reference's result-folder layout (README.md:139-158)
    assert os.path.exists(os.path.join(results_dir, "actions.txt"))
    assert os.path.exists(os.path.join(results_dir, "gaussians_data", "params.npz"))
    assert os.path.exists(
        os.path.join(results_dir, "gaussians_data", "transforms.json")
    )
    assert os.path.exists(os.path.join(results_dir, "visited_map.png"))
    assert os.path.exists(os.path.join(results_dir, "topdown_free_map.png"))
    actions = read_actions(os.path.join(results_dir, "actions.txt"))
    assert len(actions) == dataset.step_num
    assert all(0 <= a <= 5 for a in actions)


def test_episode_explored(episode):
    results_dir, mapper_node, planner, dataset = episode
    # agent must have moved (bootstrap spin alone is rotation-only)
    visited = planner.visited_px
    assert len(visited) > 10
    spread = np.ptp(visited, axis=0)
    assert spread.max() > 2.0, f"agent never translated: spread {spread}"


def test_planner_services(episode):
    results_dir, mapper_node, planner, dataset = episode
    vg = planner._get_voronoi_graph()
    if vg is not None:
        assert len(vg["vertices_px"]) > 0
