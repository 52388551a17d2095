"""Multi-chip sharded render/step vs single-device reference, on the virtual
8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from activesplat_tpu.mapper.adam import AdamState
from activesplat_tpu.mapper.config import MapperConfig
from activesplat_tpu.models.gaussians import make_camera
from activesplat_tpu.ops.render import render_jit
from activesplat_tpu.parallel.sharded import (
    make_render_mesh,
    render_sharded,
    sharded_mapping_step,
)
from tests.test_render import buffer_from_scene
from tests.reference_impl import random_scene

W, H = 64, 32  # H divisible by 8
FX = FY = 30.0
K = np.array([[FX, 0, W / 2 - 1], [0, FY, H / 2 - 1], [0, 0, 1]])


def test_sharded_render_matches_single_device(rng):
    assert jax.device_count() == 8
    scene = random_scene(rng, 100)
    buf = buffer_from_scene(scene)
    cam = make_camera(W, H, K, np.eye(4))
    mesh = make_render_mesh()
    rgb, depth, alpha, radii = jax.jit(
        render_sharded, static_argnames=("mesh", "chunk")
    )(buf, cam, mesh)
    ref = render_jit(buf, cam)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(ref.rgb), atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref.depth), atol=1e-4)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref.alpha), atol=1e-5)
    # radii: pmax over shards >= per-shard values; the full-frame radii differ
    # only through the on-screen cull, which the row-window changes
    assert np.all(np.asarray(radii) >= 0)


def test_sharded_step_improves_loss(rng):
    scene = random_scene(rng, 100)
    buf = buffer_from_scene(scene)
    cam = make_camera(W, H, K, np.eye(4))
    mesh = make_render_mesh()
    cfg = MapperConfig(chunk=64)
    im_gt = jnp.ones((H, W, 3)) * 0.25
    depth_gt = jnp.zeros((H, W))  # no valid depth -> pure photometric fit
    opt = AdamState.init(buf.params)
    losses = []
    for _ in range(30):
        buf, opt, metrics = sharded_mapping_step(
            buf, opt, cam, im_gt, depth_gt, cfg, mesh
        )
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.9, (losses[0], losses[-1])


def test_sharded_tiled_matches_single_device(rng):
    from activesplat_tpu.parallel.sharded import render_sharded_tiled

    w, h = 64, 128  # 8 devices x 16-row (one tile row) blocks
    k = np.array([[40.0, 0, w / 2 - 1], [0, 40.0, h / 2 - 1], [0, 0, 1]])
    scene = random_scene(rng, 150)
    buf = buffer_from_scene(scene)
    cam = make_camera(w, h, k, np.eye(4))
    mesh = make_render_mesh()
    rgb, depth, alpha, radii = jax.jit(
        render_sharded_tiled, static_argnames=("mesh", "k_per_tile")
    )(buf, cam, mesh, k_per_tile=128)
    ref = render_jit(buf, cam, k_per_tile=128)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(ref.rgb), atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref.depth), atol=1e-4)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref.alpha), atol=1e-5)
