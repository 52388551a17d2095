"""Differentiable exact CSR rasterization (blend_csr's analytic backward).

The CUDA reference trains through uncapped per-tile dynamic lists
(reference splatam.py:208-212); the k-capped TPU tile blend truncates dense
tiles, which biases training gradients at the k ceiling (EPISODE_r04
truncation_bias: ~7.8 dB mean online PSNR delta). rasterize_tiled_exact
(differentiable=True) restores the uncapped gradient semantics: the CSR
forward stashes per-segment entry log-transmittances and a reverse-order
Pallas kernel walks the segment stream back-to-front with a VMEM suffix
carry (ops/raster_pallas.py _blend_csr_bwd_kernel)."""

import jax
import jax.numpy as jnp
import numpy as np

from activesplat_tpu.mapper.config import MapperConfig
from activesplat_tpu.mapper.splatam import SplaTAMMapper
from activesplat_tpu.ops.raster_tiled import rasterize_tiled, rasterize_tiled_exact
from activesplat_tpu.ops.render import render_projected
from tests.reference_impl import random_scene
from tests.test_raster_tiled import H, W, project_scene


def _weights(rng):
    wa = jnp.asarray(rng.normal(size=(H * W, 5)), jnp.float32)
    wl = jnp.asarray(rng.normal(size=(H * W,)), jnp.float32)
    return wa, wl


def test_csr_grad_matches_uncapped_xla(rng):
    """With k >= N the k-capped XLA blend is exact, so its gradients are the
    oracle for the CSR backward kernel — all four attribute groups."""
    scene = random_scene(rng, 120)
    proj, opac, channels = project_scene(scene)
    wa, wl = _weights(rng)

    def loss_csr(m2d, con, op, ch):
        a, l, _ = rasterize_tiled_exact(
            m2d, con, op, ch, proj.valid, proj.radius, proj.depth,
            width=W, height=H, interpret=True, differentiable=True,
        )
        return jnp.sum(a * wa) + jnp.sum(l * wl)

    def loss_xla(m2d, con, op, ch):
        a, l, _ = rasterize_tiled(
            m2d, con, op, ch, proj.valid, proj.radius, proj.depth,
            width=W, height=H, k_per_tile=128, backend="xla",
        )
        return jnp.sum(a * wa) + jnp.sum(l * wl)

    args = (proj.mean2d, proj.conic, opac, channels)
    g_csr = jax.grad(loss_csr, argnums=(0, 1, 2, 3))(*args)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(*args)
    for gc, gx in zip(g_csr, g_xla):
        gc, gx = np.asarray(gc), np.asarray(gx)
        assert np.all(np.isfinite(gc))
        scale = max(np.abs(gx).max(), 1e-6)
        np.testing.assert_allclose(gc / scale, gx / scale, atol=5e-5)


def test_csr_grad_saturating_scene_and_ladder(rng):
    """Big opaque splats: the backward's saturated-segment skip must stay
    consistent with the forward's early termination, and the entry-budget
    ladder must not change gradients (rungs are bitwise-identical)."""
    scene = random_scene(rng, 200)
    scene["logit_opacities"][:] = 3.0
    scene["log_scales"][:] = np.log(0.3)
    proj, opac, channels = project_scene(scene)
    wa, wl = _weights(rng)

    def loss_csr(op, ladder):
        a, l, _ = rasterize_tiled_exact(
            proj.mean2d, proj.conic, op, channels, proj.valid, proj.radius,
            proj.depth, width=W, height=H, interpret=True,
            differentiable=True, ladder=ladder,
        )
        return jnp.sum(a * wa) + jnp.sum(l * wl)

    def loss_xla(op):
        a, l, _ = rasterize_tiled(
            proj.mean2d, proj.conic, op, channels, proj.valid, proj.radius,
            proj.depth, width=W, height=H, k_per_tile=256, backend="xla",
        )
        return jnp.sum(a * wa) + jnp.sum(l * wl)

    g_plain = np.asarray(jax.grad(lambda o: loss_csr(o, ()))(opac))
    g_ladder = np.asarray(jax.grad(lambda o: loss_csr(o, (0.5, 1.0)))(opac))
    g_xla = np.asarray(jax.grad(loss_xla)(opac))
    scale = max(np.abs(g_xla).max(), 1e-6)
    np.testing.assert_allclose(g_plain / scale, g_xla / scale, atol=5e-5)
    np.testing.assert_array_equal(g_plain, g_ladder)


def test_render_grad_exact_eliminates_truncation_bias(rng):
    """The headline property: at a small k where the capped path truncates
    heavily (dropped >> 0, gradient off by ~100% relative), grad_exact=True
    reproduces the uncapped render's value AND gradient."""
    from tests.test_overflow import dense_cluster_buffer, make_intrinsics
    from activesplat_tpu.models.gaussians import make_camera
    from activesplat_tpu.ops.projection import project_gaussians

    buf = dense_cluster_buffer(rng)
    cam = make_camera(32, 32, make_intrinsics(), np.eye(4))
    p = buf.params
    proj = project_gaussians(
        p.means3d, p.quats, p.log_scales, buf.active, cam.w2c,
        cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
    )

    def loss(lo, k, grad_exact):
        out = render_projected(
            proj, p.rgb, jax.nn.sigmoid(lo), cam, k_per_tile=k,
            grad_exact=grad_exact,
        )
        return jnp.mean(out.rgb) + jnp.mean(out.depth), out.dropped

    (v_e, d_e), g_e = jax.value_and_grad(
        lambda lo: loss(lo, 16, True), has_aux=True
    )(p.logit_opacities)
    (v_u, _), g_u = jax.value_and_grad(
        lambda lo: loss(lo, 1024, False), has_aux=True
    )(p.logit_opacities)
    (_, d_t), g_t = jax.value_and_grad(
        lambda lo: loss(lo, 16, False), has_aux=True
    )(p.logit_opacities)
    g_e, g_u, g_t = map(np.asarray, (g_e, g_u, g_t))
    scale = max(np.abs(g_u).max(), 1e-9)
    assert int(d_e) == 0  # exact path: no harmful truncation
    assert int(d_t) > 0  # the k-capped path truncates this scene hard
    np.testing.assert_allclose(float(v_e), float(v_u), atol=1e-5)
    np.testing.assert_allclose(g_e / scale, g_u / scale, atol=1e-4)
    # and the capped gradient is SUBSTANTIALLY biased — what exact removes
    assert np.abs(g_t - g_u).max() / scale > 0.1


def test_mapping_loss_exact_training_matches_uncapped(rng):
    """mapping_loss with exact_training='on' at a truncating k equals the
    k-uncapped loss value and gradient."""
    import dataclasses

    from tests.test_overflow import dense_cluster_buffer, make_intrinsics
    from activesplat_tpu.mapper.step import mapping_loss
    from activesplat_tpu.models.gaussians import make_camera

    buf = dense_cluster_buffer(rng)
    cam = make_camera(32, 32, make_intrinsics(), np.eye(4))
    im_gt = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)), jnp.float32)
    depth_gt = jnp.asarray(rng.uniform(1.5, 3.0, (32, 32)), jnp.float32)
    base = MapperConfig(chunk=64)

    def run(cfg):
        def f(params):
            loss, aux = mapping_loss(params, buf, cam, im_gt, depth_gt, cfg)
            return loss
        return jax.value_and_grad(f)(buf.params)

    v_exact, g_exact = run(
        dataclasses.replace(base, k_per_tile=16, exact_training="on")
    )
    v_big, g_big = run(
        dataclasses.replace(base, k_per_tile=1024, exact_training="off")
    )
    np.testing.assert_allclose(float(v_exact), float(v_big), rtol=1e-5)
    for ge, gb in zip(jax.tree.leaves(g_exact), jax.tree.leaves(g_big)):
        ge, gb = np.asarray(ge), np.asarray(gb)
        scale = max(np.abs(gb).max(), 1e-6)
        np.testing.assert_allclose(ge / scale, gb / scale, atol=1e-4)


def test_mapper_auto_switches_to_exact_training(capsys):
    """exact_training='auto' (the default): when harmful drops persist AT the
    k ceiling, the mapper swaps the training render to HYBRID exact
    compositing (capped blend + CSR recompositing of harmfully overflowing
    tiles) instead of warning-and-training-on-biased-gradients; the
    transition lands in shape_history. Post-switch, `dropped` stays a
    telemetry signal (k-cap pressure) — training is unbiased regardless."""
    from tests.test_overflow import make_intrinsics as mk32, run_frames

    cfg = MapperConfig(
        initial_capacity=1 << 11,
        max_capacity=1 << 12,
        keyframe_capacity=8,
        map_every=1,
        kf_every=1,
        mapping_iters=1,
        mapping_window_size=4,
        chunk=64,
        kf_select_pixels=64,
        k_per_tile=16,
        k_per_tile_max=16,  # already at the ceiling: cannot escalate k
        k_overflow_patience=1,
        k_overflow_min_active=0,
    )
    assert cfg.exact_training == "auto"
    mapper = SplaTAMMapper(cfg, 32, 32, mk32(), step_num=8)
    run_frames(mapper, n_frames=3)
    out = capsys.readouterr().out
    assert "switching the training render to hybrid exact" in out
    assert mapper.cfg.exact_training == "hybrid"
    assert mapper.cfg.k_per_tile == 16  # k itself never moved
    assert any(
        s.get("exact_training") == "hybrid" for s in mapper.shape_history
    )
