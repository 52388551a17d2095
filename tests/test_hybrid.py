"""Hybrid exact compositing (rasterize_tiled_hybrid): k-capped blend
everywhere + differentiable CSR recompositing of only the harmfully
overflowing tiles.

The full differentiable CSR walk costs O(total memberships) per training
render (~2.5x the capped path, CLAUDE.md r4); only tiles whose k-cap
truncation survives the blend kernels' LOG_EPS saturation exit actually
need it. The hybrid must match the full CSR walk's values AND gradients
(the unbiased-training oracle, reference splatam.py:208-212 uncapped
dynamic lists), fall back to the capped render on harmful-expansion budget
overflow, and stay a no-op when nothing overflows harmfully.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from activesplat_tpu.mapper.config import MapperConfig
from activesplat_tpu.ops.raster_tiled import (
    rasterize_tiled,
    rasterize_tiled_exact,
    rasterize_tiled_hybrid,
)
from activesplat_tpu.ops.render import render_projected
from tests.reference_impl import random_scene
from tests.test_raster_tiled import H, W, project_scene


def _weights(rng):
    wa = jnp.asarray(rng.normal(size=(H * W, 5)), jnp.float32)
    wl = jnp.asarray(rng.normal(size=(H * W,)), jnp.float32)
    return wa, wl


def _hybrid(m2d, con, op, ch, proj, k, ladder=(0.0625, 0.25)):
    return rasterize_tiled_hybrid(
        m2d, con, op, ch, proj.valid, proj.radius, proj.depth,
        width=W, height=H, k_per_tile=k, backend="xla", ladder=ladder,
    )


def test_hybrid_forward_matches_full_csr(rng):
    """At a small k (many unsaturated overflowing tiles) the hybrid image
    and transmittance must match the full CSR walk."""
    scene = random_scene(rng, 200)
    proj, opac, channels = project_scene(scene)

    a_h, l_h, dropped, csr_over = _hybrid(
        proj.mean2d, proj.conic, opac, channels, proj, k=8
    )
    a_e, l_e, _ = rasterize_tiled_exact(
        proj.mean2d, proj.conic, opac, channels, proj.valid, proj.radius,
        proj.depth, width=W, height=H, interpret=True,
    )
    assert int(csr_over) == 0
    assert int(dropped) > 0  # the capped path truncates harmfully at k=8
    np.testing.assert_allclose(np.asarray(a_h), np.asarray(a_e), atol=2e-5)
    np.testing.assert_allclose(np.asarray(l_h), np.asarray(l_e), atol=2e-5)


def test_hybrid_grad_matches_full_csr(rng):
    """Gradients through the hybrid fold equal the full differentiable CSR
    walk's for all four attribute groups."""
    scene = random_scene(rng, 150)
    proj, opac, channels = project_scene(scene)
    wa, wl = _weights(rng)

    def loss_h(m2d, con, op, ch):
        a, l, _, _ = _hybrid(m2d, con, op, ch, proj, k=8)
        return jnp.sum(a * wa) + jnp.sum(l * wl)

    def loss_e(m2d, con, op, ch):
        a, l, _ = rasterize_tiled_exact(
            m2d, con, op, ch, proj.valid, proj.radius, proj.depth,
            width=W, height=H, interpret=True, differentiable=True,
        )
        return jnp.sum(a * wa) + jnp.sum(l * wl)

    args = (proj.mean2d, proj.conic, opac, channels)
    g_h = jax.grad(loss_h, argnums=(0, 1, 2, 3))(*args)
    g_e = jax.grad(loss_e, argnums=(0, 1, 2, 3))(*args)
    for gh, ge in zip(g_h, g_e):
        gh, ge = np.asarray(gh), np.asarray(ge)
        assert np.all(np.isfinite(gh))
        scale = max(np.abs(ge).max(), 1e-6)
        np.testing.assert_allclose(gh / scale, ge / scale, atol=5e-5)


def test_hybrid_no_overflow_equals_capped(rng):
    """With k large enough that nothing overflows, the harmful set is empty
    and the hybrid is exactly the capped render (fold selects nothing)."""
    scene = random_scene(rng, 60)
    proj, opac, channels = project_scene(scene)

    a_h, l_h, dropped, csr_over = _hybrid(
        proj.mean2d, proj.conic, opac, channels, proj, k=128
    )
    a_c, l_c, d_c = rasterize_tiled(
        proj.mean2d, proj.conic, opac, channels, proj.valid, proj.radius,
        proj.depth, width=W, height=H, k_per_tile=128, backend="xla",
    )
    assert int(dropped) == int(d_c) == 0
    assert int(csr_over) == 0
    np.testing.assert_array_equal(np.asarray(a_h), np.asarray(a_c))
    np.testing.assert_array_equal(np.asarray(l_h), np.asarray(l_c))


def test_hybrid_ladder_rungs_identical(rng):
    """Budget rungs must not change values or gradients (the rung switch
    picks allocation size only)."""
    scene = random_scene(rng, 150)
    proj, opac, channels = project_scene(scene)
    wa, wl = _weights(rng)

    def loss(op, ladder):
        a, l, _, _ = _hybrid(
            proj.mean2d, proj.conic, op, channels, proj, k=8, ladder=ladder
        )
        return jnp.sum(a * wa) + jnp.sum(l * wl)

    g_small = np.asarray(jax.grad(lambda o: loss(o, (0.0625, 0.25)))(opac))
    g_top = np.asarray(jax.grad(lambda o: loss(o, ()))(opac))
    np.testing.assert_array_equal(g_small, g_top)


def test_render_grad_exact_hybrid_matches_uncapped(rng):
    """render_projected(grad_exact='hybrid') on a heavily truncating dense
    cluster reproduces the uncapped render's value and gradient — the same
    headline property as grad_exact=True, at capped + O(harmful) cost."""
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

    (v_h, d_h), g_h = jax.value_and_grad(
        lambda lo: loss(lo, 16, "hybrid"), has_aux=True
    )(p.logit_opacities)
    (v_u, _), g_u = jax.value_and_grad(
        lambda lo: loss(lo, 1024, False), has_aux=True
    )(p.logit_opacities)
    g_h, g_u = map(np.asarray, (g_h, g_u))
    scale = max(np.abs(g_u).max(), 1e-9)
    assert int(d_h) > 0  # telemetry: the k-cap is under pressure
    np.testing.assert_allclose(float(v_h), float(v_u), atol=1e-5)
    np.testing.assert_allclose(g_h / scale, g_u / scale, atol=1e-4)


def test_hybrid_budget_overflow_falls_back_to_capped(rng):
    """Engineered harmful expansion past the top budget rung (huge splats
    covering the whole grid at a tiny entry cap): csr_overflow fires and
    render_projected degrades to the k-capped differentiable render."""
    import activesplat_tpu.ops.raster_tiled as rt

    scene = random_scene(rng, 300)
    scene["log_scales"][:] = np.log(3.0)  # whole-grid AABBs -> spans ~T each
    scene["logit_opacities"][:] = -4.0  # translucent: tiles never saturate
    proj, opac, channels = project_scene(scene)

    old_cap = rt._ENTRY_CAP
    rt._ENTRY_CAP = 512  # far below the harmful expansion this scene needs
    try:
        a_h, l_h, dropped, csr_over = _hybrid(
            proj.mean2d, proj.conic, opac, channels, proj, k=8, ladder=()
        )
        assert int(csr_over) > 0

        out_h = render_projected(
            proj, channels[:, :3], opac, _cam(), k_per_tile=8,
            grad_exact="hybrid",
        )
        out_c = render_projected(
            proj, channels[:, :3], opac, _cam(), k_per_tile=8,
            grad_exact=False,
        )
        np.testing.assert_allclose(
            np.asarray(out_h.rgb), np.asarray(out_c.rgb), atol=1e-6
        )
        assert int(out_h.dropped) == int(out_c.dropped) > 0
    finally:
        rt._ENTRY_CAP = old_cap


def _cam():
    from activesplat_tpu.models.gaussians import make_camera

    intr = np.array(
        [[40.0, 0.0, W / 2], [0.0, 40.0, H / 2], [0.0, 0.0, 1.0]]
    )
    return make_camera(W, H, intr, np.eye(4))


def test_mapping_loss_hybrid_matches_uncapped(rng):
    """mapping_loss with exact_training='hybrid' at a truncating k equals
    the k-uncapped loss value and gradient (mirrors the 'on' test)."""
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

    v_h, g_h = run(
        dataclasses.replace(base, k_per_tile=16, exact_training="hybrid")
    )
    v_big, g_big = run(
        dataclasses.replace(base, k_per_tile=1024, exact_training="off")
    )
    np.testing.assert_allclose(float(v_h), float(v_big), rtol=1e-5)
    for gh, gb in zip(jax.tree.leaves(g_h), jax.tree.leaves(g_big)):
        gh, gb = np.asarray(gh), np.asarray(gb)
        scale = max(np.abs(gb).max(), 1e-6)
        np.testing.assert_allclose(gh / scale, gb / scale, atol=1e-4)


def test_exact_online_skipped_when_training_is_exact(monkeypatch):
    """With exact_training='hybrid' (or 'on') the training render is already
    exact, so the separate exact-online re-render program must NOT run; the
    ledger records train == exact (bias identically collapsed)."""
    import activesplat_tpu.mapper.splatam as sp
    from tests.test_overflow import make_intrinsics as mk32, run_frames

    calls = {"n": 0}
    orig = sp._exact_online_scores

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(sp, "_exact_online_scores", counting)
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
        exact_training="hybrid",
        exact_online_metrics=True,
    )
    mapper = sp.SplaTAMMapper(cfg, 32, 32, mk32(), step_num=4)
    run_frames(mapper, n_frames=2)
    assert calls["n"] == 0  # no separate exact-online program dispatched
    m = mapper.last_metrics
    assert m["psnr"] == m["psnr_train"]
    assert m["depth_l1"] == m["depth_l1_train"]
    bias = mapper.truncation_bias()
    assert bias is not None and bias["psnr_delta_mean"] == 0.0
