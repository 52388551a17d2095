"""REPLAY mode, external-frames mode, and the offline-fit entry point
(reference: habitat.launch mode/actions args; visualizer.py:2044-2115 frames
topic; the SplaTAM offline path)."""

import os

import numpy as np
import pytest

from activesplat_tpu.mapper.config import MapperConfig
from activesplat_tpu.runtime.dataloader import (
    RGBDSensor,
    SimAction,
    SyntheticDataset,
)
from activesplat_tpu.runtime.launch import run_replay
from activesplat_tpu.runtime.offline_fit import fit_offline
from activesplat_tpu.runtime.synthetic import BoxWorld

SMALL_CFG = MapperConfig(
    initial_capacity=1 << 11,
    max_capacity=1 << 11,
    keyframe_capacity=16,
    mapping_iters=2,
    map_every=2,
    kf_every=2,
    mapping_window_size=4,
    chunk=128,
    k_per_tile=0,
    kf_select_pixels=64,
)


def make_dataset(results_dir, step_num=8):
    world = BoxWorld.single_room(seed=7)
    sensor = RGBDSensor.from_fov(32, 32, 90.0, depth_min=0.0, depth_max=10.0)
    return SyntheticDataset(
        world,
        sensor,
        step_num=step_num,
        start_position=np.array([3.0, 0.0, 3.0]),
        turn_angle_deg=45.0,
        results_dir=results_dir,
    )


@pytest.fixture(scope="module")
def recorded(tmp_path_factory):
    """A tiny recorded episode: actions.txt + gaussians_data dump."""
    results_dir = str(tmp_path_factory.mktemp("rec"))
    from activesplat_tpu.runtime.bus import Bus
    from activesplat_tpu.runtime.mapper_node import MapperNode
    from activesplat_tpu.runtime.dataloader import action_to_twist

    dataset = make_dataset(results_dir)
    bus = Bus()
    node = MapperNode(bus, dataset, SMALL_CFG, results_dir, pixel_max=40)
    script = [SimAction.TURN_LEFT] * 6 + [SimAction.MOVE_FORWARD] * 2
    for action in script:
        bus.publish("cmd_vel", action_to_twist(action))
    node.finish()
    dataset.close()
    return results_dir, node, script


def test_replay_mode(recorded, tmp_path):
    results_dir, node, script = recorded
    replay_dir = str(tmp_path / "replay")
    replay_node = run_replay(
        make_dataset(None),
        os.path.join(results_dir, "actions.txt"),
        replay_dir,
        mapper_cfg=SMALL_CFG,
        pixel_max=40,
        save_dataset=False,
    )
    # same actions -> same trajectory -> same frame count and a live map
    assert replay_node.mapper.mapping_frame_time_count == len(script) + 1
    assert replay_node.mapper.num_gaussians() > 100
    # params.npz written through post_processing
    assert os.path.exists(
        os.path.join(replay_dir, "gaussians_data", "params.npz")
    )
    # deterministic sim + same actions: identical final pose
    np.testing.assert_allclose(
        replay_node.mapper.est_c2w[-1], node.mapper.est_c2w[-1], atol=1e-12
    )


def test_external_frames_topic(tmp_path):
    """Frames published on the 'frames' topic drive the mapper without the
    owned simulator stepping."""
    from activesplat_tpu.runtime.bus import Bus
    from activesplat_tpu.runtime.mapper_node import MapperNode
    from activesplat_tpu.utils import OPENCV_TO_OPENGL

    dataset = make_dataset(None, step_num=4)
    bus = Bus()
    node = MapperNode(bus, dataset, SMALL_CFG, str(tmp_path), pixel_max=40,
                      save_dataset=False)
    frames_before = node.mapper.mapping_frame_time_count
    ext = make_dataset(None, step_num=4)
    ext.step(SimAction.TURN_LEFT)
    frame = ext.get_frame()
    bus.publish(
        "frames",
        {"rgb": frame["rgb"], "depth": frame["depth"], "c2w": frame["c2w"]},
    )
    assert node.mapper.mapping_frame_time_count == frames_before + 1
    # pose-convention conversion applied for tagged OpenGL poses
    gl_pose = np.asarray(frame["c2w"], np.float64)
    gl_pose = OPENCV_TO_OPENGL @ gl_pose @ OPENCV_TO_OPENGL
    bus.publish(
        "frames",
        {
            "rgb": frame["rgb"],
            "depth": frame["depth"],
            "c2w": gl_pose,
            "pose_data_type": "C2W_OPENGL",
        },
    )
    np.testing.assert_allclose(
        node.mapper.est_c2w[-1], node.mapper.est_c2w[-2], atol=1e-9
    )


def test_offline_fit_entry(recorded, tmp_path):
    results_dir, _, _ = recorded
    out = str(tmp_path / "fit")
    import dataclasses

    fit_cfg = dataclasses.replace(
        SMALL_CFG,
        initial_capacity=1 << 13,
        max_capacity=1 << 13,
        map_every=1,
        mapping_iters=6,
    )
    metrics = fit_offline(
        os.path.join(results_dir, "gaussians_data"),
        fit_cfg,
        out_dir=out,
    )
    assert metrics["num_frames"] == 9
    assert metrics["psnr"] > 15, metrics
    assert metrics["depth_l1"] < 0.5, metrics
    assert os.path.exists(os.path.join(out, "offline_fit_metrics.json"))
    assert os.path.exists(os.path.join(out, "gaussians_data", "params.npz"))


def test_full_resume(tmp_path):
    """Kill-and-resume: a checkpoint at frame k restores buffer, keyframe
    store, trajectory, scene radius and RNG, so continuing the same frame
    stream reproduces the uninterrupted run."""
    from activesplat_tpu.mapper.splatam import SplaTAMMapper
    from activesplat_tpu.models.gaussians import make_camera
    from activesplat_tpu.ops.render import render_jit
    from activesplat_tpu.ops.ssim import psnr

    dataset = make_dataset(None, step_num=10)
    frames = [dataset.get_frame()]
    for action in [SimAction.TURN_LEFT] * 5 + [SimAction.MOVE_FORWARD] * 2:
        dataset.step(action)
        frames.append(dataset.get_frame())

    def new_mapper(results_dir=None, **kw):
        return SplaTAMMapper(
            SMALL_CFG, 32, 32, dataset.sensor.intrinsics,
            step_num=len(frames) + 1, results_dir=results_dir,
            save_dataset=False, **kw,
        )

    # uninterrupted run
    full = new_mapper()
    for f in frames:
        full.run(dict(f))

    # interrupted: checkpoint at frame 4, fresh mapper resumes 5..end
    first = new_mapper(results_dir=str(tmp_path / "a"))
    for f in frames[:5]:
        first.run(dict(f))
    ckpt_dir = str(tmp_path / "ckpt")
    first.save_checkpoint(ckpt_dir, frame_id=4)

    resumed = new_mapper()
    resumed.load_map(os.path.join(ckpt_dir, "params4.npz"))
    assert resumed.tracking_idx == 5
    assert int(resumed.store.count) == int(first.store.count)
    assert resumed.keyframe_time_indices == first.keyframe_time_indices
    assert resumed.scene_radius == first.scene_radius
    for f in frames[5:]:
        resumed.run(dict(f))

    assert resumed.num_gaussians() == full.num_gaussians()
    assert len(resumed.est_c2w) == len(full.est_c2w)
    # identical final render quality at a held pose
    cam = make_camera(
        32, 32, dataset.sensor.intrinsics,
        np.linalg.inv(np.asarray(frames[0]["c2w"], np.float64)),
    )
    img_full = np.asarray(render_jit(full.buf, cam, chunk=128).rgb)
    img_res = np.asarray(render_jit(resumed.buf, cam, chunk=128).rgb)
    assert float(psnr(img_res, img_full)) > 40.0


def test_eval_nvs_from_dump(recorded):
    """NVS split eval (eval_nvs parity, eval_helpers.py:627-806): held-out
    frames score the saved map with hole-validity gating."""
    from activesplat_tpu.eval.nvs import eval_nvs_from_dump

    results_dir, node, _ = recorded
    gdir = os.path.join(results_dir, "gaussians_data")
    metrics = eval_nvs_from_dump(
        os.path.join(gdir, "params.npz"), gdir, holdout_every=5, chunk=128
    )
    assert metrics["num_eval_frames"] == 2
    assert 0.0 <= metrics["valid_frame_ratio"] <= 1.0
    if metrics["valid_frame_ratio"] > 0:
        assert metrics["psnr"] > 10
        assert metrics["depth_l1"] < 1.0


def test_manual_control_mode(tmp_path):
    """MANUAL_CONTROL teleop: scripted keys drive cmd_vel while the mapper
    maps every frame (reference keyboard teleop, visualizer.py:1934-1965)."""
    from activesplat_tpu.runtime.launch import run_manual

    keys = list("wwaadx")  # x is unknown -> ignored
    node = run_manual(
        make_dataset(str(tmp_path), step_num=8),
        str(tmp_path),
        mapper_cfg=SMALL_CFG,
        pixel_max=40,
        save_dataset=False,
        action_source=iter(keys),
    )
    # 5 valid keys + the initial frame
    assert node.mapper.mapping_frame_time_count == 6
    assert node.mapper.num_gaussians() > 100
    # actions logged like any other mode
    actions = open(os.path.join(str(tmp_path), "actions.txt")).read().split()
    assert len(actions) == 5


def test_rgbd_silhouette_panel(tmp_path):
    """save_runtime_data writes the 2x3 rgbd/silhouette diagnostic panel
    (plot_rgbd_silhouette parity, eval_helpers.py:110-151)."""
    import glob

    import cv2

    from activesplat_tpu.runtime.bus import Bus
    from activesplat_tpu.runtime.mapper_node import MapperNode
    from activesplat_tpu.runtime.dataloader import action_to_twist

    dataset = make_dataset(None, step_num=5)
    bus = Bus()
    node = MapperNode(
        bus, dataset, SMALL_CFG, str(tmp_path), pixel_max=40,
        save_dataset=False, save_runtime_data=True, record_view_every=1,
    )
    bus.publish("cmd_vel", action_to_twist(SimAction.TURN_LEFT))
    node.finish()
    panels = sorted(glob.glob(str(tmp_path / "current_vis_data" / "rgbd_sil_*.png")))
    assert panels
    img = cv2.imread(panels[0])
    assert img.shape == (64, 96, 3)  # 2x3 grid of 32x32 cells


def test_live_view_server(tmp_path):
    """Headless live-view dashboard (the GUI stand-in): HTTP endpoints serve
    the latest render, topdown maps and metrics during an episode."""
    import json
    import urllib.request

    from activesplat_tpu.runtime.bus import Bus
    from activesplat_tpu.runtime.mapper_node import MapperNode
    from activesplat_tpu.runtime.dataloader import action_to_twist

    dataset = make_dataset(None, step_num=5)
    bus = Bus()
    node = MapperNode(
        bus, dataset, SMALL_CFG, str(tmp_path), pixel_max=40,
        save_dataset=False, record_view_every=1, live_view_port=0,
    )
    bus.publish("cmd_vel", action_to_twist(SimAction.TURN_LEFT))
    node._get_topdown(False)  # populates the topdown panel
    base = f"http://127.0.0.1:{node.live_view.port}"
    page = urllib.request.urlopen(base + "/", timeout=5).read()
    assert b"live view" in page
    for endpoint in ("/view.png", "/topdown.png"):
        img = urllib.request.urlopen(base + endpoint, timeout=5).read()
        assert img[:8] == b"\x89PNG\r\n\x1a\n", endpoint
    metrics = json.loads(
        urllib.request.urlopen(base + "/metrics.json", timeout=5).read()
    )
    assert metrics["num_gaussians"] > 0
    assert metrics["step"] == 1
    node.finish()


def test_metrics_tracker_fallback(tmp_path):
    """use_wandb without wandb installed falls back to metrics.jsonl
    (use_wandb knob, online_habitat_sim.py:14)."""
    import dataclasses
    import json

    from activesplat_tpu.runtime.bus import Bus
    from activesplat_tpu.runtime.mapper_node import MapperNode
    from activesplat_tpu.runtime.dataloader import action_to_twist

    cfg = dataclasses.replace(SMALL_CFG, use_wandb=True)
    dataset = make_dataset(None, step_num=5)
    bus = Bus()
    node = MapperNode(bus, dataset, cfg, str(tmp_path), pixel_max=40,
                      save_dataset=False)
    for _ in range(3):
        bus.publish("cmd_vel", action_to_twist(SimAction.TURN_LEFT))
    node.finish()
    rows = [json.loads(l) for l in open(str(tmp_path / "metrics.jsonl"))]
    assert rows and all("psnr" in r and "step" in r for r in rows)
