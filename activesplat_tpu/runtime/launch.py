"""Episode launcher: the roslaunch-equivalent entry point.

Wires the mapper node + planner FSM over the in-process bus and runs a full
active-exploration episode (reference: launch/habitat.launch starting
mapper_node.py + planner_node.py). Outputs land in the reference's result
layout: results_dir/{gaussians_data/{params.npz, transforms.json, rgb, depth},
actions.txt, visited_map.png, topdown_free_map.png}.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np

from activesplat_tpu.mapper.config import MapperConfig
from activesplat_tpu.runtime.bus import Bus
from activesplat_tpu.runtime.dataloader import RGBDSensor, SyntheticDataset
from activesplat_tpu.runtime.mapper_node import MapperNode
from activesplat_tpu.runtime.planner_fsm import PlannerFSM
from activesplat_tpu.runtime.synthetic import BoxWorld


def _ensure_setup(dataset) -> None:
    """HabitatDataset builds its simulator lazily in setup() (import-gated on
    the wheels); SyntheticDataset has no setup. Idempotent."""
    if hasattr(dataset, "setup") and getattr(dataset, "_sim", None) is None:
        dataset.setup()


def make_synthetic_dataset(
    scene_id: str = "two_room",
    seed: int = 0,
    step_num: int = 500,
    width: int = 256,
    height: int = 256,
    hfov_deg: float = 90.0,
    depth_max: float = 10.0,
    turn_angle_deg: float = 10.0,
    tilt_angle_deg: float = 15.0,
    results_dir: Optional[str] = None,
) -> SyntheticDataset:
    maker = {"two_room": BoxWorld.two_room, "single_room": BoxWorld.single_room}[
        scene_id
    ]
    world = maker(seed=seed)
    sensor = RGBDSensor.from_fov(
        width, height, hfov_deg, depth_min=0.0, depth_max=depth_max
    )
    sx, _, sz = world.size
    # start near a free spot around the room center
    start = None
    for dx in np.linspace(0, min(sx, sz) / 2 - 0.5, 8):
        candidate = np.array([sx / 2 + dx, 0.0, sz / 4])
        if world.is_free(candidate[[0, 2]], 0.2):
            start = candidate
            break
    return SyntheticDataset(
        world,
        sensor,
        step_num=step_num,
        start_position=start,
        turn_angle_deg=turn_angle_deg,
        tilt_angle_deg=tilt_angle_deg,
        results_dir=results_dir,
        scene_id=f"{scene_id}-{seed}",
    )


def run_episode(
    dataset: SyntheticDataset,
    results_dir: str,
    mapper_cfg: Optional[MapperConfig] = None,
    pixel_max: int = 360,
    save_runtime_data: bool = False,
    save_dataset: bool = True,
    max_ticks: int = 100000,
    pano_scale: float = 1.0,
    live_view_port=None,
    single_floor_expansion=(0.25, 2.0),
    agent_foot_adjust: float = 0.0,
):
    """Run one exploration episode to budget exhaustion. Returns
    (mapper_node, planner)."""
    from activesplat_tpu.utils.tracing import install_io_counters, trace_capture

    install_io_counters()  # per-stage dispatch/fetch/bytes in stage reports
    mapper_cfg = mapper_cfg or MapperConfig()
    _ensure_setup(dataset)
    bus = Bus()
    mapper_node = MapperNode(
        bus,
        dataset,
        mapper_cfg,
        results_dir,
        pixel_max=pixel_max,
        single_floor_expansion=single_floor_expansion,
        agent_foot_adjust=agent_foot_adjust,
        save_runtime_data=save_runtime_data,
        save_dataset=save_dataset,
        pano_scale=pano_scale,
        live_view_port=live_view_port,
    )
    planner = PlannerFSM(
        bus,
        save_runtime_data=save_runtime_data,
        live_view=mapper_node.live_view,
    )
    # set ACTIVESPLAT_TRACE_DIR to capture a device profile of the episode
    with trace_capture():
        planner.run(max_ticks=max_ticks)
    mapper_node.finish()
    dataset.close()
    return mapper_node, planner


def run_replay(
    dataset: SyntheticDataset,
    actions_path: str,
    results_dir: str,
    mapper_cfg: Optional[MapperConfig] = None,
    pixel_max: int = 360,
    save_dataset: bool = True,
    pano_scale: float = 1.0,
):
    """REPLAY mode: drive a recorded actions.txt through the full mapper via
    the live cmd_vel path — no planner (reference: habitat.launch mode/actions
    args + GlobalState.REPLAY, visualizer.py frame loop). Returns the
    mapper node."""
    from activesplat_tpu.io.actions import read_actions
    from activesplat_tpu.runtime.dataloader import SimAction, action_to_twist
    from activesplat_tpu.utils import GlobalState

    mapper_cfg = mapper_cfg or MapperConfig()
    _ensure_setup(dataset)
    bus = Bus()
    mapper_node = MapperNode(
        bus,
        dataset,
        mapper_cfg,
        results_dir,
        pixel_max=pixel_max,
        save_dataset=save_dataset,
        pano_scale=pano_scale,
    )
    mapper_node.global_state = GlobalState.REPLAY
    for action in read_actions(actions_path):
        if mapper_node.global_state == GlobalState.QUIT:
            break
        bus.publish("cmd_vel", action_to_twist(SimAction(action)))
    mapper_node.finish()
    dataset.close()
    return mapper_node


def run_manual(
    dataset: SyntheticDataset,
    results_dir: str,
    mapper_cfg: Optional[MapperConfig] = None,
    pixel_max: int = 360,
    save_dataset: bool = True,
    action_source=None,
    pano_scale: float = 1.0,
):
    """MANUAL_CONTROL mode: teleoperation drives cmd_vel while the mapper
    maps every frame — the headless equivalent of the reference's arrow-key
    teleop (visualizer.py:1934-1965; same key->twist table). `action_source`
    yields single-character commands; None reads them interactively from
    stdin (w=forward a=left d=right r=look-up f=look-down q=quit). Returns
    the mapper node."""
    from activesplat_tpu.utils import GlobalState

    mapper_cfg = mapper_cfg or MapperConfig()
    _ensure_setup(dataset)
    bus = Bus()
    mapper_node = MapperNode(
        bus,
        dataset,
        mapper_cfg,
        results_dir,
        pixel_max=pixel_max,
        save_dataset=save_dataset,
        pano_scale=pano_scale,
    )
    mapper_node.global_state = GlobalState.MANUAL_CONTROL

    def stdin_keys():
        import sys

        print("manual control: w=forward a=left d=right r=up f=down q=quit")
        for line in sys.stdin:
            for ch in line.strip():
                yield ch

    speed, turn = 0.2, 0.2  # reference SPEED/TURN (scripts/nodes/__init__.py)
    key_to_twist = {
        "w": {"linear": np.array([speed, 0.0, 0.0]), "angular": np.zeros(3)},
        "a": {"linear": np.zeros(3), "angular": np.array([0.0, 0.0, turn])},
        "d": {"linear": np.zeros(3), "angular": np.array([0.0, 0.0, -turn])},
        "r": {"linear": np.zeros(3), "angular": np.array([0.0, -turn, 0.0])},
        "f": {"linear": np.zeros(3), "angular": np.array([0.0, turn, 0.0])},
    }
    for key in action_source if action_source is not None else stdin_keys():
        if mapper_node.global_state == GlobalState.QUIT or key == "q":
            break
        twist = key_to_twist.get(key)
        if twist is not None:
            bus.publish("cmd_vel", twist)
    mapper_node.finish()
    dataset.close()
    return mapper_node


HABITAT_FORMATS = ("gibson", "mp3d", "replica")


def build_episode_from_config(
    scene_cfg: Optional[dict],
    results_dir: Optional[str],
    scene_id: Optional[str] = None,
    user_config_path: Optional[str] = None,
    sim_factory=None,
    overrides: Optional[dict] = None,
) -> dict:
    """Compose everything an episode needs from a scene-config dict: the
    dataset (HabitatDataset for gibson/mp3d/replica formats, SyntheticDataset
    otherwise), the MapperConfig, and the painter/planner knobs the launcher
    consumes (reference arg plumbing: launch/habitat.launch:1-23 ->
    scripts/nodes/mapper_node.py:34-137, config JSON -> env yaml -> dataset
    root -> HabitatDataset).

    `overrides` (CLI flags the user passed explicitly) win over config
    values; config values win over defaults. Returns dict(dataset,
    mapper_cfg, pixel_max, single_floor_expansion, agent_foot_adjust)."""
    from activesplat_tpu.configs import (
        dataset_kwargs_from_scene,
        load_user_config,
        mapper_config_from_scene,
    )

    scene_cfg = scene_cfg or {}
    overrides = {k: v for k, v in (overrides or {}).items() if v is not None}
    fmt = scene_cfg.get("dataset", {}).get("format", "synthetic")

    if fmt in HABITAT_FORMATS:
        from activesplat_tpu.runtime.habitat_backend import get_dataset

        user = load_user_config(user_config_path)
        if "step_num" in overrides:
            scene_cfg = dict(scene_cfg)
            scene_cfg["dataset"] = dict(
                scene_cfg["dataset"], step_num=overrides["step_num"]
            )
        dataset = get_dataset(
            scene_cfg,
            user,
            scene_id=scene_id or "None",
            results_dir=results_dir,
            sim_factory=sim_factory,
        )
    else:
        kw = dataset_kwargs_from_scene(scene_cfg)
        for key in ("scene_id", "seed", "step_num", "width", "height"):
            if key in overrides:
                kw[key] = overrides[key]
        if scene_id:
            kw["scene_id"] = scene_id
        dataset = make_synthetic_dataset(results_dir=results_dir, **kw)

    mapper = scene_cfg.get("mapper", {})
    single_floor = mapper.get("single_floor", {}).get("expansion", {})
    return {
        "dataset": dataset,
        "mapper_cfg": mapper_config_from_scene(scene_cfg),
        "pixel_max": overrides.get(
            "pixel_max",
            scene_cfg.get("painter", {}).get("grid_map", {}).get("pixel_max", 360),
        ),
        "single_floor_expansion": (
            float(single_floor.get("foot", 0.25)),
            float(single_floor.get("head", 2.0)),
        ),
        "agent_foot_adjust": float(
            scene_cfg.get("planner", {}).get("agent_foot_adjust", 0.0)
        ),
    }


def main():
    parser = argparse.ArgumentParser(description="ActiveSplat-TPU episode launcher")
    parser.add_argument(
        "--config", type=str, default=None,
        help="scene config: a bundled name (gibson, mp3d, synthetic_small, "
        "...) or a JSON path; gibson/mp3d/replica formats build a "
        "HabitatDataset from the env yaml + user-config dataset roots "
        "(reference: roslaunch activesplat habitat.launch config:=...)",
    )
    parser.add_argument(
        "--scene_id", default=None,
        help="scene override (habitat scene id, or two_room/single_room for "
        "synthetic configs)",
    )
    parser.add_argument(
        "--user_config", type=str, default=None,
        help="dataset-roots JSON (config/.templates/user_config.json layout)",
    )
    parser.add_argument(
        "--habitat_sim", default="real", choices=["real", "mock"],
        help="mock: drive the habitat adapter with the BoxWorld-backed mock "
        "simulator (runtime/mock_habitat.py) — hermetic, no wheels needed",
    )
    parser.add_argument(
        "--mesh", type=int, default=None, choices=[0, 1],
        help="1: shard training renders over all visible devices "
        "(MapperConfig.use_mesh; needs >1 device and height % (devices*16) "
        "== 0)",
    )
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--step_num", type=int, default=None)
    parser.add_argument("--width", type=int, default=None)
    parser.add_argument("--height", type=int, default=None)
    parser.add_argument("--results_dir", required=True)
    parser.add_argument("--pixel_max", type=int, default=None)
    parser.add_argument("--save_runtime_data", type=int, default=0)
    parser.add_argument(
        "--live_view_port", type=int, default=None,
        help="serve the headless live-view dashboard on this port (0 = auto)",
    )
    parser.add_argument(
        "--mode",
        default="auto",
        choices=["auto", "replay", "manual"],
        help="auto: planner-driven exploration; replay: re-run --actions "
        "through the mapper; manual: stdin keyboard teleop "
        "(reference habitat.launch mode arg + MANUAL_CONTROL)",
    )
    parser.add_argument("--actions", type=str, default=None, help="actions.txt for replay mode")
    args = parser.parse_args()

    scene_cfg = None
    if args.config:
        from activesplat_tpu.configs import load_scene_config

        scene_cfg = load_scene_config(args.config)
    sim_factory = None
    if args.habitat_sim == "mock":
        from activesplat_tpu.runtime.mock_habitat import make_mock_sim

        sim_factory = make_mock_sim

    os.makedirs(args.results_dir, exist_ok=True)
    # default synthetic scene when no config is given (round-1 CLI parity)
    if scene_cfg is None:
        scene_cfg = {"dataset": {"format": "synthetic", "scene_id": "two_room"}}
    episode = build_episode_from_config(
        scene_cfg,
        args.results_dir if args.mode in ("auto", "manual") else None,
        scene_id=args.scene_id,
        user_config_path=args.user_config,
        sim_factory=sim_factory,
        overrides={
            "seed": args.seed,
            "step_num": args.step_num,
            "width": args.width,
            "height": args.height,
            "pixel_max": args.pixel_max,
        },
    )
    dataset = episode["dataset"]
    mapper_cfg = episode["mapper_cfg"]
    if args.mesh is not None:
        import dataclasses

        mapper_cfg = dataclasses.replace(mapper_cfg, use_mesh=bool(args.mesh))
    common = dict(mapper_cfg=mapper_cfg, pixel_max=episode["pixel_max"])
    if args.mode == "replay":
        if not args.actions:
            parser.error("--mode replay requires --actions")
        mapper_node = run_replay(
            dataset, args.actions, args.results_dir, **common
        )
    elif args.mode == "manual":
        mapper_node = run_manual(dataset, args.results_dir, **common)
    else:
        mapper_node, planner = run_episode(
            dataset,
            args.results_dir,
            save_runtime_data=bool(args.save_runtime_data),
            live_view_port=args.live_view_port,
            single_floor_expansion=episode["single_floor_expansion"],
            agent_foot_adjust=episode["agent_foot_adjust"],
            **common,
        )
    print("episode finished:", mapper_node.mapper.num_gaussians(), "gaussians")


if __name__ == "__main__":
    main()
