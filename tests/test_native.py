"""Native C++ raycaster parity with the numpy reference."""

import os

import numpy as np
import pytest

from activesplat_tpu.runtime import native_raycast
from activesplat_tpu.runtime.synthetic import BoxWorld
from activesplat_tpu.utils.transforms import rot_axis


@pytest.mark.skipif(
    not native_raycast.native_available(), reason="g++ toolchain unavailable"
)
def test_native_matches_numpy():
    world = BoxWorld.two_room(seed=0)
    fx = 40.0
    intr = np.array([[fx, 0, 31.0], [0, fx, 23.0], [0, 0, 1]])
    c2w = np.eye(4)
    c2w[:3, :3] = np.diag([1.0, -1.0, -1.0])
    c2w[:3, 3] = [5.0, 1.25, 1.5]
    c2w = rot_axis(c2w, "y", np.deg2rad(40))

    os.environ["ACTIVESPLAT_NATIVE"] = "0"
    try:
        rgb_np, depth_np = world.render(c2w, intr, 64, 48)
    finally:
        os.environ["ACTIVESPLAT_NATIVE"] = "1"
    rgb_c, depth_c = native_raycast.raycast(
        c2w, intr, 64, 48, world.size, world.obstacles.reshape(-1, 6), 0.0, 10.0
    )
    np.testing.assert_allclose(depth_c, depth_np, atol=1e-4)
    np.testing.assert_allclose(rgb_c, rgb_np, atol=1e-4)


@pytest.mark.skipif(
    not native_raycast.native_available(), reason="g++ toolchain unavailable"
)
def test_boxworld_uses_native_by_default():
    world = BoxWorld.single_room(seed=1)
    intr = np.array([[30.0, 0, 15.0], [0, 30.0, 15.0], [0, 0, 1]])
    c2w = np.eye(4)
    c2w[:3, :3] = np.diag([1.0, -1.0, -1.0])
    c2w[:3, 3] = [3.0, 1.25, 3.0]
    rgb, depth = world.render(c2w, intr, 32, 32)
    assert rgb.shape == (32, 32, 3) and depth.shape == (32, 32)
    assert depth[depth > 0].min() > 0.1
