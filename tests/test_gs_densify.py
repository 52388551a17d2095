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
