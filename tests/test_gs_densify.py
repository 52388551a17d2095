"""Gradient-based clone/split densification + the mean2d gradient tap."""

import jax
import jax.numpy as jnp
import numpy as np

from activesplat_tpu.mapper.config import MapperConfig
from activesplat_tpu.mapper.step import (
    densify_gradient_phase,
    mapping_loss_with_tap,
)
from activesplat_tpu.models.gaussians import make_camera
from tests.test_render import buffer_from_scene
from tests.reference_impl import random_scene

W = H = 48
K = np.array([[40.0, 0, 23], [0, 40.0, 23], [0, 0, 1]], np.float32)


def test_tap_gradients_nonzero(rng):
    scene = random_scene(rng, 64)
    buf = buffer_from_scene(scene)
    cam = make_camera(W, H, K, np.eye(4))
    cfg = MapperConfig(chunk=64, k_per_tile=64, use_gs_densification=True)
    tap = jnp.zeros((64, 2))
    im = jnp.zeros((H, W, 3))
    dep = jnp.full((H, W), 2.0)
    (_, aux), g_tap = jax.value_and_grad(
        lambda t: mapping_loss_with_tap(buf.params, t, buf, cam, im, dep, cfg),
        has_aux=True,
    )(tap)
    g = np.asarray(g_tap)
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0
    # only visible gaussians get a mean2d gradient
    assert np.all(np.abs(g[~np.asarray(aux.radii > 0)]) == 0)


def test_densify_gradient_phase_clones_and_splits(rng):
    scene = random_scene(rng, 32)
    buf = buffer_from_scene(scene).grown(64)  # headroom for the children
    n0 = int(buf.num_active())
    # mark half the gaussians as high-gradient
    grad = np.zeros(64, np.float32)
    grad[:16] = 1.0
    buf = buf.replace(
        grad_accum=jnp.asarray(grad), denom=jnp.ones(64, jnp.float32)
    )
    cfg = MapperConfig(use_gs_densification=True, densify_grad_thresh=0.5)
    buf2, dropped, n_new = densify_gradient_phase(
        buf, jnp.float32(1.0), jnp.float32(3.0), jax.random.PRNGKey(0), cfg
    )
    assert int(dropped) == 0
    assert int(n_new) == 16
    assert int(buf2.num_active()) == n0 + 16
    # splits (big gaussians) shrank: no log_scale above the original max
    assert float(buf2.params.log_scales.max()) <= float(
        buf.params.log_scales.max()
    ) + 1e-6


def test_prune_phase_branches(rng):
    """prune_gaussians parity (slam_external.py:171-192): opacity threshold,
    final threshold at stop_after, too-big removal, schedule gating, reset."""
    from activesplat_tpu.mapper.config import PruneConfig
    from activesplat_tpu.mapper.step import prune_phase

    scene = random_scene(rng, 64)
    # deterministic opacities: half low, half high; two huge gaussians
    scene["logit_opacities"][:32] = -8.0   # sigmoid ~ 3e-4 < 0.005
    scene["logit_opacities"][32:] = 2.0
    scene["log_scales"][:] = np.log(0.05)
    scene["log_scales"][62:64] = np.log(5.0)  # > 0.1 * scene_radius(=10)
    buf = buffer_from_scene(scene)

    pd = PruneConfig(start_after=0, prune_every=2, stop_after=4,
                     removal_opacity_threshold=0.005,
                     final_removal_opacity_threshold=0.9,
                     remove_big_after=100)
    cfg = MapperConfig(prune_gaussians=True, prune=pd)

    # iteration 1: schedule does not fire
    buf1, n1 = prune_phase(buf, cfg, iteration=1, scene_radius=10.0)
    assert int(n1) == 0 and int(buf1.num_active()) == int(buf.num_active())

    # iteration 2: low-opacity removal only (remove_big_after not reached)
    buf2, n2 = prune_phase(buf, cfg, iteration=2, scene_radius=10.0)
    assert int(n2) == 32
    assert int(buf2.num_active()) == int(buf.num_active()) - 32

    # iteration 4 == stop_after: final (0.9) threshold removes sigmoid(2)~.88 too
    buf4, n4 = prune_phase(buf, cfg, iteration=4, scene_radius=10.0)
    assert int(n4) == 64

    # too-big branch: active after remove_big_after
    pd_big = PruneConfig(start_after=0, prune_every=2, stop_after=100,
                         remove_big_after=0)
    cfg_big = MapperConfig(prune_gaussians=True, prune=pd_big)
    bufb, nb = prune_phase(buf, cfg_big, iteration=2, scene_radius=10.0)
    assert int(nb) == 34  # 32 low-opacity + 2 huge

    # opacity reset
    pd_r = PruneConfig(prune_every=10**9, start_after=10**9, stop_after=10**9,
                       reset_opacities=True, reset_opacities_every=3)
    cfg_r = MapperConfig(prune_gaussians=True, prune=pd_r)
    bufr, nr = prune_phase(buf, cfg_r, iteration=3, scene_radius=10.0)
    assert int(nr) == 0
    act = np.asarray(bufr.active)
    op = jax.nn.sigmoid(np.asarray(bufr.params.logit_opacities))
    np.testing.assert_allclose(np.asarray(op)[act], 0.01, atol=1e-6)
