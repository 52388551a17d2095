"""End-to-end mapper slice: fit an online map to a synthetic RGB-D sequence
(the minimum end-to-end slice of SURVEY.md section 7 — offline replay fit)."""

import os

import numpy as np
import pytest

from activesplat_tpu.io.manifest import load_frame, load_manifest
from activesplat_tpu.io.params_io import buffer_from_params, load_params
from activesplat_tpu.mapper import MapperState
from activesplat_tpu.mapper.config import MapperConfig
from activesplat_tpu.mapper.splatam import SplaTAMMapper
from activesplat_tpu.models.gaussians import make_camera
from activesplat_tpu.ops.render import render_jit
from activesplat_tpu.runtime.synthetic import BoxWorld
from activesplat_tpu.utils.transforms import rot_axis

W = H = 64
HFOV = np.deg2rad(90)


def make_intrinsics():
    fx = 0.5 * W / np.tan(HFOV / 2)
    return np.array([[fx, 0, W / 2 - 1], [0, fx, H / 2 - 1], [0, 0, 1]])


def camera_pose(world, x, z, yaw_deg, height=1.25):
    """OpenCV c2w at (x, z) looking along yaw (0 = +z world)."""
    c2w = np.eye(4)
    c2w[:3, 3] = [x, height, z]
    # OpenCV camera (x right, y down, z forward) in a y-up world: rotating
    # 180 deg about the camera x-axis puts y_cam down and z_cam along -z
    # world (the yaw-0 heading); yaw then spins about the world up-axis.
    c2w[:3, :3] = np.diag([1.0, -1.0, -1.0])
    return rot_axis(c2w, "y", np.deg2rad(yaw_deg))


@pytest.fixture(scope="module")
def fitted(tmp_path_factory):
    results_dir = str(tmp_path_factory.mktemp("results"))
    world = BoxWorld.single_room(seed=3)
    intr = make_intrinsics()
    cfg = MapperConfig(
        initial_capacity=1 << 14,
        max_capacity=1 << 18,
        keyframe_capacity=32,
        map_every=2,
        kf_every=2,
        mapping_iters=16,
        mapping_window_size=6,
        chunk=128,
        kf_select_pixels=256,
    )
    n_frames = 12
    mapper = SplaTAMMapper(
        cfg, W, H, intr, step_num=n_frames, results_dir=results_dir
    )
    frames = []
    for i in range(n_frames):
        # rotate in place at room center: a bootstrap-like spin
        c2w = camera_pose(world, 3.0, 3.0, yaw_deg=30 * i)
        rgb, depth = world.render(c2w, intr, W, H)
        frames.append((rgb, depth, c2w))
        state = mapper.run(
            {"rgb": rgb, "depth": depth, "c2w": c2w, "frame_id": i}
        )
        assert state in (MapperState.BOOTSTRAP, MapperState.MAPPING)
    path = mapper.post_processing()
    return mapper, frames, intr, results_dir, path


def test_fit_quality(fitted):
    mapper, frames, intr, _, _ = fitted
    # render a training view back and compare
    rgb, depth, c2w = frames[0]
    cam = make_camera(W, H, intr, np.linalg.inv(c2w))
    out = render_jit(mapper.buf, cam, chunk=128)
    mse = float(np.mean((np.asarray(out.rgb) - rgb) ** 2))
    psnr = -10 * np.log10(mse + 1e-12)
    valid = depth > 0
    depth_l1 = float(
        np.abs(np.asarray(out.depth) - depth)[valid].mean()
    )
    assert psnr > 19.0, f"train-view PSNR too low: {psnr:.2f} dB"
    assert depth_l1 < 0.12, f"depth L1 too high: {depth_l1:.3f} m"
    assert mapper.num_gaussians() > 1000


def test_params_npz_roundtrip(fitted):
    mapper, frames, intr, results_dir, path = fitted
    assert path is not None and os.path.exists(path)
    params = load_params(path)
    for key in (
        "means3D",
        "rgb_colors",
        "unnorm_rotations",
        "logit_opacities",
        "log_scales",
        "timestep",
        "cam_unnorm_rots",
        "cam_trans",
        "intrinsics",
        "w2c",
        "org_width",
        "org_height",
        "gt_w2c_all_frames",
        "keyframe_time_indices",
    ):
        assert key in params, key
    n = params["means3D"].shape[0]
    assert n == mapper.num_gaussians()
    assert params["logit_opacities"].shape == (n, 1)
    assert params["cam_unnorm_rots"].shape == (1, 4, len(frames))
    assert params["gt_w2c_all_frames"].shape == (len(frames), 4, 4)
    # first-frame relative pose must be identity
    np.testing.assert_allclose(
        params["gt_w2c_all_frames"][0], np.eye(4), atol=1e-5
    )

    # rebuild a buffer and render
    buf = buffer_from_params(params)
    rgb, depth, c2w = frames[0]
    cam = make_camera(W, H, intr, np.linalg.inv(c2w))
    out = render_jit(buf, cam, chunk=128)
    out_orig = render_jit(mapper.buf, cam, chunk=128)
    np.testing.assert_allclose(
        np.asarray(out.rgb), np.asarray(out_orig.rgb), atol=1e-5
    )


def test_dataset_dump(fitted):
    mapper, frames, intr, results_dir, _ = fitted
    gdir = os.path.join(results_dir, "gaussians_data")
    manifest = load_manifest(gdir)
    assert manifest["w"] == W and manifest["h"] == H
    assert len(manifest["frames"]) == len(frames)
    assert abs(manifest["integer_depth_scale"] - 1.0 / 65535) < 1e-9
    rgb, depth, w2c = load_frame(gdir, manifest["frames"][3])
    exp_rgb, exp_depth, exp_c2w = frames[3]
    assert np.abs(rgb - exp_rgb).max() < 0.01  # 8-bit quantization
    assert np.abs(depth - exp_depth).max() < 0.002  # mm quantization
    np.testing.assert_allclose(w2c, np.linalg.inv(exp_c2w), atol=1e-6)


def test_keyframe_commits(fitted):
    mapper, frames, _, _, _ = fitted
    # kf_every=2 over 12 frames: frames 0,1,3,5,7,9,11 (+step_num-2 rule)
    assert 0 in mapper.keyframe_time_indices
    assert len(mapper.keyframe_time_indices) >= 6
    assert int(mapper.store.count) == len(mapper.keyframe_time_indices)
