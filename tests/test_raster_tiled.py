"""Tile-binned rasterizer vs the dense chunked rasterizer."""

import jax
import jax.numpy as jnp
import numpy as np

from activesplat_tpu.ops.projection import project_gaussians
from activesplat_tpu.ops.raster_tiled import bin_gaussians, rasterize_tiled
from activesplat_tpu.ops.raster_xla import depth_sort, rasterize_sorted
from tests.reference_impl import random_scene

W, H = 64, 48
FX = FY = 40.0
CX, CY = W / 2 - 1, H / 2 - 1


def project_scene(scene):
    proj = jax.jit(project_gaussians, static_argnames=("width", "height"))(
        jnp.asarray(scene["means3d"]),
        jnp.asarray(scene["quats"]),
        jnp.asarray(scene["log_scales"]),
        jnp.asarray(scene["active"]),
        jnp.eye(4),
        FX,
        FY,
        CX,
        CY,
        W,
        H,
    )
    opac = jax.nn.sigmoid(jnp.asarray(scene["logit_opacities"]))
    z = proj.depth
    channels = jnp.concatenate(
        [jnp.asarray(scene["rgb"]), z[:, None], (z * z)[:, None]], -1
    )
    return proj, opac, channels


def dense_reference(proj, opac, channels, chunk=64):
    _, s_valid, s_mean2d, s_conic, s_opac, s_channels = depth_sort(
        proj.depth, proj.valid, proj.mean2d, proj.conic, opac, channels
    )
    return rasterize_sorted(
        s_mean2d, s_conic, s_opac, s_channels, s_valid, width=W, height=H, chunk=chunk
    )


def run_tiled(proj, opac, channels, radius=None, k=128):
    radius = proj.radius if radius is None else radius
    return rasterize_tiled(
        proj.mean2d,
        proj.conic,
        opac,
        channels,
        proj.valid,
        radius,
        proj.depth,
        width=W,
        height=H,
        k_per_tile=k,
    )


def test_tiled_exact_when_uncapped(rng):
    """With radius covering the whole frame and k >= N, the tiled blend must
    reproduce the dense blend exactly (same math, same order)."""
    scene = random_scene(rng, 120)
    proj, opac, channels = project_scene(scene)
    accum_d, logt_d = dense_reference(proj, opac, channels, chunk=32)
    big_radius = jnp.full_like(proj.radius, float(max(W, H) * 2))
    accum_t, logt_t, dropped = run_tiled(proj, opac, channels, big_radius, k=128)
    assert int(dropped) == 0
    np.testing.assert_allclose(np.asarray(accum_t), np.asarray(accum_d), atol=2e-5)
    np.testing.assert_allclose(np.asarray(logt_t), np.asarray(logt_d), atol=2e-5)


def test_tiled_close_with_real_radius(rng):
    """With true 3-sigma radii, tile culling only drops sub-1/255-ish tails."""
    scene = random_scene(rng, 200)
    proj, opac, channels = project_scene(scene)
    accum_d, logt_d = dense_reference(proj, opac, channels)
    accum_t, logt_t, dropped = run_tiled(proj, opac, channels, k=256)
    assert int(dropped) == 0
    diff = np.abs(np.asarray(accum_t) - np.asarray(accum_d))
    assert np.quantile(diff, 0.99) < 2e-2, np.quantile(diff, 0.99)


def test_k_cap_drops_far_gaussians(rng):
    scene = random_scene(rng, 300)
    proj, opac, channels = project_scene(scene)
    _, _, dropped = run_tiled(proj, opac, channels, k=8)
    assert int(dropped) > 0


def test_exact_multipass_matches_dense(rng):
    """max_passes > 1 must reproduce the UNCAPPED (dense) blend exactly even
    with a tiny per-pass window — the CUDA reference's dynamic-list
    semantics — and report zero harmful drops."""
    scene = random_scene(rng, 160)
    proj, opac, channels = project_scene(scene)
    accum_d, logt_d = dense_reference(proj, opac, channels, chunk=32)
    big_radius = jnp.full_like(proj.radius, float(max(W, H) * 2))
    accum_e, logt_e, dropped = rasterize_tiled(
        proj.mean2d, proj.conic, opac, channels, proj.valid,
        big_radius, proj.depth,
        width=W, height=H, k_per_tile=16, max_passes=64,
    )
    assert int(dropped) == 0
    np.testing.assert_allclose(np.asarray(accum_e), np.asarray(accum_d), atol=2e-5)
    np.testing.assert_allclose(np.asarray(logt_e), np.asarray(logt_d), atol=2e-5)
    # the pallas blend composes identically across passes (interpret on CPU)
    accum_p, logt_p, dropped_p = rasterize_tiled(
        proj.mean2d, proj.conic, opac, channels, proj.valid,
        big_radius, proj.depth,
        width=W, height=H, k_per_tile=64, max_passes=64, backend="pallas",
    )
    assert int(dropped_p) == 0
    np.testing.assert_allclose(np.asarray(accum_p), np.asarray(accum_d), atol=5e-3)


def test_exact_multipass_saturation_early_exit(rng):
    """Saturated tiles stop the pass loop: an opaque near wall in front of a
    far cluster needs exactly the near content — the result must equal the
    single-pass capped render wherever the wall saturates, and the exact
    flag must not change a scene with no overflow at all."""
    scene = random_scene(rng, 60)
    proj, opac, channels = project_scene(scene)
    a1, l1, d1 = run_tiled(proj, opac, channels, k=128)
    a2, l2, d2 = rasterize_tiled(
        proj.mean2d, proj.conic, opac, channels, proj.valid,
        proj.radius, proj.depth,
        width=W, height=H, k_per_tile=128, max_passes=64,
    )
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), atol=1e-6)


def test_bin_gaussians_membership(rng):
    # one gaussian squarely inside one tile
    mean2d = jnp.array([[24.0, 24.0], [100.0, 100.0]])
    radius = jnp.array([2.0, 2.0])
    valid = jnp.array([True, False])
    lists = bin_gaussians(mean2d, radius, valid, 64, 48, k_per_tile=4)
    counts = np.asarray(lists.count).reshape(3, 4)  # tiles_y=3, tiles_x=4
    assert counts[1, 1] == 1  # tile covering (24, 24)
    assert counts.sum() == 1  # invalid gaussian binned nowhere
    assert int(lists.indices[1 * 4 + 1, 0]) == 0


def test_tiled_gradients(rng):
    scene = random_scene(rng, 60)
    proj, opac, channels = project_scene(scene)

    def loss_fn(m2d, con, op, ch):
        accum, logt, _ = rasterize_tiled(
            m2d, con, op, ch, proj.valid, proj.radius, proj.depth,
            width=W, height=H, k_per_tile=64,
        )
        return jnp.sum(accum**2) + jnp.sum(logt)

    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3))(
        proj.mean2d, proj.conic, opac, channels
    )
    for g in grads:
        g = np.asarray(g)
        assert np.all(np.isfinite(g))
    assert np.abs(np.asarray(grads[2])).max() > 0


def test_pallas_backend_non_multiple_k(rng):
    """k_per_tile not a multiple of SEG (e.g. 100): the wrapper pads the
    per-tile lists and the Pallas blend (interpret on CPU) matches XLA."""
    scene = random_scene(rng, 150)
    proj, opac, channels = project_scene(scene)
    a_x, l_x, d_x = run_tiled(proj, opac, channels, k=100)
    kw = dict(
        width=W, height=H, k_per_tile=100, backend="pallas"
    )
    a_p, l_p, d_p = rasterize_tiled(
        proj.mean2d, proj.conic, opac, channels, proj.valid,
        proj.radius, proj.depth, **kw,
    )
    assert int(d_p) == int(d_x)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_x), atol=5e-3)
    np.testing.assert_allclose(np.asarray(l_p), np.asarray(l_x), atol=0.05)


def test_pallas_backend_channel_cap(rng):
    """> 8 channels must fail loudly on the pallas backend."""
    import pytest

    scene = random_scene(rng, 32)
    proj, opac, channels = project_scene(scene)
    wide = jnp.concatenate([channels, channels], -1)  # 10 channels
    with pytest.raises(ValueError, match="at most 8 channels"):
        rasterize_tiled(
            proj.mean2d, proj.conic, opac, wide, proj.valid,
            proj.radius, proj.depth,
            width=W, height=H, k_per_tile=64, backend="pallas",
        )


def test_bin_three_level_matches_oracle(rng):
    """The three-level compaction (N > 64k, used by whole-map topdown
    queries) produces exactly the per-tile lists a numpy counting-sort
    gives."""
    n = 70_000  # n_pad = 70016 -> nb = 547 > 512 -> three-level branch
    mean2d = jnp.asarray(rng.uniform(-10, 70, (n, 2)), jnp.float32)
    radius = jnp.asarray(rng.uniform(0.5, 3.0, (n,)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=n) < 0.01)  # ~700 live
    k = 64
    lists = bin_gaussians(mean2d, radius, valid, 64, 48, k_per_tile=k)

    m = np.asarray(mean2d); r = np.asarray(radius); v = np.asarray(valid)
    tiles_x, tiles_y = 4, 3
    # AABBs that miss the grid entirely are excluded (no phantom clamping)
    v = v & (m[:, 0] + r >= 0) & (m[:, 0] - r < tiles_x * 16)
    v = v & (m[:, 1] + r >= 0) & (m[:, 1] - r < tiles_y * 16)
    tx0 = np.clip(np.floor((m[:, 0] - r) / 16), 0, tiles_x - 1)
    tx1 = np.clip(np.floor((m[:, 0] + r) / 16), 0, tiles_x - 1)
    ty0 = np.clip(np.floor((m[:, 1] - r) / 16), 0, tiles_y - 1)
    ty1 = np.clip(np.floor((m[:, 1] + r) / 16), 0, tiles_y - 1)
    for t in range(tiles_x * tiles_y):
        tx, ty = t % tiles_x, t // tiles_x
        members = np.where(
            v & (tx0 <= tx) & (tx <= tx1) & (ty0 <= ty) & (ty <= ty1)
        )[0]
        assert int(lists.count[t]) == min(len(members), k), t
        got = np.asarray(lists.indices[t][: min(len(members), k)])
        np.testing.assert_array_equal(got, members[:k], err_msg=f"tile {t}")


# --------------------------------------------------------------------------- #
# CSR exact raster (rasterize_tiled_exact): the single-walk forward path for
# uncapped renders (queries/densify/eval). Interpret-mode pallas on CPU.
# --------------------------------------------------------------------------- #

from activesplat_tpu.ops.raster_tiled import rasterize_tiled_exact


def run_csr(proj, opac, channels, radius=None, entry_budget=0):
    radius = proj.radius if radius is None else radius
    return rasterize_tiled_exact(
        proj.mean2d,
        proj.conic,
        opac,
        channels,
        proj.valid,
        radius,
        proj.depth,
        width=W,
        height=H,
        entry_budget=entry_budget,
        interpret=True,
    )


def test_csr_exact_matches_dense(rng):
    """Whole-frame radii force every Gaussian into every tile (heavy
    overflow for the capped path): the CSR walk must reproduce the dense
    blend exactly."""
    scene = random_scene(rng, 160)
    proj, opac, channels = project_scene(scene)
    accum_d, logt_d = dense_reference(proj, opac, channels, chunk=32)
    big_radius = jnp.full_like(proj.radius, float(max(W, H) * 2))
    # 12 tiles x 160 gaussians memberships: needs more than the default 3N
    accum_c, logt_c, dropped = run_csr(
        proj, opac, channels, big_radius, entry_budget=2048
    )
    assert int(dropped) == 0
    np.testing.assert_allclose(np.asarray(accum_c), np.asarray(accum_d), atol=5e-3)
    np.testing.assert_allclose(np.asarray(logt_c), np.asarray(logt_d), atol=5e-3)


def test_csr_exact_matches_multipass_real_radii(rng):
    """With true 3-sigma radii (skewed per-tile memberships) the CSR walk
    equals the multi-pass exact XLA path bit-for-near-bit."""
    scene = random_scene(rng, 300)
    proj, opac, channels = project_scene(scene)
    accum_e, logt_e, de = rasterize_tiled(
        proj.mean2d, proj.conic, opac, channels, proj.valid,
        proj.radius, proj.depth,
        width=W, height=H, k_per_tile=16, max_passes=64,
    )
    accum_c, logt_c, dc = run_csr(proj, opac, channels)
    assert int(de) == 0 and int(dc) == 0
    np.testing.assert_allclose(np.asarray(accum_c), np.asarray(accum_e), atol=5e-3)
    np.testing.assert_allclose(np.asarray(logt_c), np.asarray(logt_e), atol=5e-3)


def test_csr_empty_scene():
    """No valid Gaussians: zero accumulation, unit transmittance, no drops,
    and no NaNs from the all-sentinel sort."""
    n = 32
    proj_mean = jnp.zeros((n, 2))
    accum, logt, dropped = rasterize_tiled_exact(
        proj_mean, jnp.ones((n, 3)), jnp.zeros((n,)), jnp.zeros((n, 5)),
        jnp.zeros((n,), bool), jnp.zeros((n,)), jnp.ones((n,)),
        width=W, height=H, interpret=True,
    )
    assert int(dropped) == 0
    assert np.all(np.asarray(accum) == 0.0)
    assert np.all(np.asarray(logt) == 0.0)


def test_csr_budget_truncation_reports_drops(rng):
    """An entry budget below the real membership total must (a) report the
    shortfall and (b) still blend the kept front-to-back prefix correctly
    (the cut happens at whole-Gaussian granularity, deepest first)."""
    scene = random_scene(rng, 200)
    proj, opac, channels = project_scene(scene)
    accum_f, logt_f, d0 = run_csr(proj, opac, channels)
    assert int(d0) == 0
    accum_t, logt_t, d1 = run_csr(proj, opac, channels, entry_budget=256)
    assert int(d1) > 0
    # truncation keeps the nearest gaussians: transmittance can only rise
    assert np.all(np.asarray(logt_t) >= np.asarray(logt_f) - 1e-5)


def test_bin_slots_kernel_matches_xla(rng):
    """The Pallas bin-slots kernel (VMEM-resident slot walk, one-hot MXU
    AABB fetches) must reproduce the XLA hierarchy bit-for-bit: indices,
    counts and overflow, across slot offsets and odd grids."""
    for n, w, h in [(1000, 256, 256), (500, 144, 96)]:
        mean2d = jnp.asarray(
            np.random.default_rng(n).uniform(-20, max(w, h) + 20, (n, 2)),
            jnp.float32,
        )
        radius = jnp.asarray(
            np.random.default_rng(n + 1).uniform(1, 25, n), jnp.float32
        )
        valid = jnp.asarray(np.random.default_rng(n + 2).uniform(0, 1, n) > 0.15)
        for off in [0, 128]:
            ref = bin_gaussians(
                mean2d, radius, valid, w, h, 256, jnp.int32(off), backend="xla"
            )
            ker = bin_gaussians(
                mean2d, radius, valid, w, h, 256, jnp.int32(off),
                backend="pallas", use_kernel=True,
            )
            np.testing.assert_array_equal(
                np.asarray(ker.indices), np.asarray(ref.indices)
            )
            np.testing.assert_array_equal(
                np.asarray(ker.count), np.asarray(ref.count)
            )
            np.testing.assert_array_equal(
                np.asarray(ker.overflow), np.asarray(ref.overflow)
            )
