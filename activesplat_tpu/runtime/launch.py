"""Episode launcher: the roslaunch-equivalent entry point.

Wires the mapper node + planner FSM over the in-process bus and runs a full
active-exploration episode (reference: launch/habitat.launch starting
mapper_node.py + planner_node.py). Outputs land in the reference's result
layout: results_dir/{gaussians_data/{params.npz, transforms.json, rgb, depth},
actions.txt, visited_map.png, topdown_free_map.png}.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import numpy as np

from activesplat_tpu.mapper.config import MapperConfig
from activesplat_tpu.runtime.bus import Bus
from activesplat_tpu.runtime.dataloader import RGBDSensor, SyntheticDataset
from activesplat_tpu.runtime.mapper_node import MapperNode
from activesplat_tpu.runtime.planner_fsm import PlannerFSM
from activesplat_tpu.runtime.synthetic import BoxWorld


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
):
    """Run one exploration episode to budget exhaustion. Returns
    (mapper_node, planner)."""
    from activesplat_tpu.utils.tracing import trace_capture

    mapper_cfg = mapper_cfg or MapperConfig()
    bus = Bus()
    mapper_node = MapperNode(
        bus,
        dataset,
        mapper_cfg,
        results_dir,
        pixel_max=pixel_max,
        save_runtime_data=save_runtime_data,
        save_dataset=save_dataset,
        pano_scale=pano_scale,
        live_view_port=live_view_port,
    )
    planner = PlannerFSM(bus, save_runtime_data=save_runtime_data)
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


def main():
    parser = argparse.ArgumentParser(description="ActiveSplat-TPU episode launcher")
    parser.add_argument("--scene_id", default="two_room")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--step_num", type=int, default=500)
    parser.add_argument("--width", type=int, default=256)
    parser.add_argument("--height", type=int, default=256)
    parser.add_argument("--results_dir", required=True)
    parser.add_argument("--pixel_max", type=int, default=360)
    parser.add_argument("--save_runtime_data", type=int, default=0)
    parser.add_argument(
        "--live_view_port", type=int, default=None,
        help="serve the headless live-view dashboard on this port (0 = auto)",
    )
    parser.add_argument("--config", type=str, default=None, help="dataset JSON config")
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

    kw = {}
    if args.config:
        with open(args.config) as fh:
            cfg = json.load(fh)
        kw["step_num"] = cfg.get("dataset", {}).get("step_num", args.step_num)

    os.makedirs(args.results_dir, exist_ok=True)
    dataset = make_synthetic_dataset(
        scene_id=args.scene_id,
        seed=args.seed,
        step_num=kw.get("step_num", args.step_num),
        width=args.width,
        height=args.height,
        results_dir=args.results_dir if args.mode in ("auto", "manual") else None,
    )
    if args.mode == "replay":
        if not args.actions:
            parser.error("--mode replay requires --actions")
        mapper_node = run_replay(
            dataset, args.actions, args.results_dir, pixel_max=args.pixel_max
        )
    elif args.mode == "manual":
        mapper_node = run_manual(
            dataset, args.results_dir, pixel_max=args.pixel_max
        )
    else:
        mapper_node, planner = run_episode(
            dataset,
            args.results_dir,
            pixel_max=args.pixel_max,
            save_runtime_data=bool(args.save_runtime_data),
            live_view_port=args.live_view_port,
        )
    print("episode finished:", mapper_node.mapper.num_gaussians(), "gaussians")


if __name__ == "__main__":
    main()
