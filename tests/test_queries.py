"""Top-down and panorama query semantics on hand-built maps."""

import jax.numpy as jnp
import numpy as np

from activesplat_tpu.models.gaussians import GaussianBuffer, GaussianParams
from activesplat_tpu.queries.topdown import (
    TopdownConfig,
    heading_to_topdown,
    render_topdown,
    topdown_config_from_bbox,
    topdown_to_world,
    world_to_topdown,
)
from activesplat_tpu.runtime.synthetic import BoxWorld


def buffer_from_points(points, color=0.5, opacity_logit=4.0, scale=0.06):
    n = len(points)
    cap = 1 << int(np.ceil(np.log2(max(n, 2))))
    buf = GaussianBuffer.empty(cap)
    params = GaussianParams(
        means3d=buf.params.means3d.at[:n].set(jnp.asarray(points, jnp.float32)),
        rgb=buf.params.rgb.at[:n].set(color),
        quats=buf.params.quats,
        logit_opacities=buf.params.logit_opacities.at[:n].set(opacity_logit),
        log_scales=buf.params.log_scales.at[:n].set(np.log(scale)),
    )
    return buf.replace(params=params, active=buf.active.at[:n].set(True))


def world_topdown_cfg(world, pixel_max=96):
    sx, sy, sz = world.size
    bbox = np.array([[0, sx], [0, sy], [0, sz]], np.float64)
    return topdown_config_from_bbox(
        bbox, agent_foot=0.1, agent_head=1.6, pixel_max=pixel_max, padding_ratio=0.02
    )


def test_world_topdown_roundtrip():
    world = BoxWorld.single_room(seed=1)
    cfg = world_topdown_cfg(world)
    pts = np.array([[1.0, 0.5, 2.0], [4.5, 1.0, 5.0], [3.3, 0.0, 0.7]])
    uv = world_to_topdown(pts, cfg)
    assert (uv >= 0).all() and (uv[:, 0] <= cfg.width).all() and (
        uv[:, 1] <= cfg.height
    ).all()
    for p, q in zip(pts, uv):
        back = topdown_to_world(q, cfg, height_value=p[1])
        np.testing.assert_allclose(back, p, atol=1e-9)


def test_heading_to_topdown():
    cfg = world_topdown_cfg(BoxWorld.single_room(seed=1))
    # camera looking along +z world (dim_u for height axis 1 is z)
    c2w = np.eye(4)
    c2w[:3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, 1]])  # z_cam -> +z
    vec = heading_to_topdown(c2w, cfg)
    np.testing.assert_allclose(vec, [1.0, 0.0], atol=1e-9)


def test_topdown_free_and_unobserved_maps():
    world = BoxWorld(size=(6.0, 3.0, 6.0), obstacles=np.array(
        [[[2.5, 0.0, 2.5], [3.5, 1.0, 3.5]]]  # a 1x1 m block in the middle
    ))
    cfg = world_topdown_cfg(world, pixel_max=64)

    # observe only half the scene (z < 3): surface samples from that half
    pts = world.sample_surface(20000, seed=2)
    pts = pts[pts[:, 2] < 3.0]
    buf = buffer_from_points(pts, scale=0.1)
    free, unobserved, _ = render_topdown(buf, cfg, chunk=256)
    assert free.shape == (cfg.height, cfg.width)

    # the unobserved half (world z > 3) must be mostly unobserved
    uv_far = world_to_topdown(np.array([[3.0, 0.5, 5.0]]), cfg)[0]
    uv_near = world_to_topdown(np.array([[3.0, 0.5, 1.5]]), cfg)[0]
    v_far, u_far = int(uv_far[1]), int(uv_far[0])
    v_near, u_near = int(uv_near[1]), int(uv_near[0])
    assert unobserved[v_far, u_far] == 1
    assert unobserved[v_near, u_near] == 0

    # the observed obstacle must NOT be free; open observed floor is ambiguous
    # (free map uses the agent-height slice: obstacle top at 1.0 < head 1.6)
    uv_obst = world_to_topdown(np.array([[3.0, 0.5, 2.7]]), cfg)[0]
    assert free[int(uv_obst[1]), int(uv_obst[0])] == 0
    # open area in the observed half: nothing in the agent band -> free
    uv_open = world_to_topdown(np.array([[1.2, 0.5, 1.2]]), cfg)[0]
    assert free[int(uv_open[1]), int(uv_open[0])] == 1


def test_local_invisibility_empty_map_suggests_nothing_missing_everything():
    from activesplat_tpu.queries.panorama import local_invisibility

    buf = GaussianBuffer.empty(256)
    c2w = np.eye(4)
    c2w[:3, :3] = np.diag([1.0, -1.0, -1.0])
    c2w[:3, 3] = [3.0, 1.25, 3.0]
    total, best_pose, invis = local_invisibility(buf, c2w, chunk=64)
    # everything is invisible
    assert invis.shape == (150, 360)
    assert total > 0.99 * invis.size


def test_local_invisibility_detects_hole():
    from activesplat_tpu.queries.panorama import local_invisibility

    # half-cylinder of splats around the camera: the camera-forward (-z)
    # hemisphere is densely covered, the back (+z) hemisphere is a hole
    rng = np.random.default_rng(5)
    n = 20000
    az = rng.uniform(-np.pi / 2, np.pi / 2, n)  # around -z direction
    y = rng.uniform(-2.0, 2.0, n)
    r = 2.0
    center = np.array([3.0, 1.25, 3.0])
    pts = center + np.stack(
        [r * np.sin(az), y, -r * np.cos(az)], axis=-1
    )
    buf = buffer_from_points(pts, scale=0.08)
    c2w = np.eye(4)
    c2w[:3, :3] = np.diag([1.0, -1.0, -1.0])  # looking along -z
    c2w[:3, 3] = center
    total, best_pose, invis = local_invisibility(buf, c2w, chunk=256)
    assert best_pose is not None, f"expected reorientation, invis total {total}"
    # proposed pose should turn the camera: heading changes
    assert not np.allclose(best_pose[:3, 2], c2w[:3, 2], atol=1e-3)


def test_grid_dbscan_matches_sklearn():
    """The morphological grid DBSCAN partitions blob scenes exactly like
    sklearn (noise set identical, co-clustering identical); only pixel-scale
    boundary ties may differ, which the blob construction avoids."""
    import itertools

    from sklearn.cluster import DBSCAN

    from activesplat_tpu.queries.clusters import _grid_dbscan_labels

    rng = np.random.default_rng(1)
    shape = (150, 360)
    inv = np.zeros(shape)
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    for cy, cx, r in [(40, 60, 18), (100, 200, 25), (70, 300, 12), (20, 330, 9)]:
        inv[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 0.95
    inv[rng.uniform(size=shape) < 0.002] = 0.95  # isolated noise speckles
    pts = np.column_stack(np.where(inv > 0.8))
    ref = DBSCAN(eps=5, min_samples=25).fit_predict(pts)
    got = _grid_dbscan_labels(shape, pts, eps=5, min_samples=25)
    np.testing.assert_array_equal(got == -1, ref == -1)
    both = np.flatnonzero(ref >= 0)
    sample = rng.choice(both, size=min(len(both), 300), replace=False)
    for i, j in itertools.combinations(sample[:60], 2):
        assert (ref[i] == ref[j]) == (got[i] == got[j])


def test_panorama_csr_ladder_matches_xla_blend(monkeypatch):
    """Force the panorama views through the exact CSR path (ladder rungs,
    lax.map composition, interpret-mode Pallas) and compare against the
    default XLA multipass blend — the two exact backends must agree."""
    import activesplat_tpu.queries.panorama as pano
    from activesplat_tpu.queries.panorama import render_panorama

    rng = np.random.default_rng(7)
    pts = np.stack(
        [rng.uniform(2, 4, 3000), rng.uniform(0.5, 2, 3000),
         rng.uniform(2, 4, 3000)], -1,
    )
    buf = buffer_from_points(pts, scale=0.05)
    c2w = np.eye(4)
    c2w[:3, :3] = np.diag([1.0, -1.0, -1.0])
    c2w[:3, 3] = [3.0, 1.25, 3.0]

    rgb_x, depth_x, invis_x = render_panorama(buf, c2w, chunk=256)

    import sys

    render_mod = sys.modules["activesplat_tpu.ops.render"]
    monkeypatch.setattr(render_mod, "forward_backend", lambda: "pallas")
    # panorama imports forward_backend inside _views_impl via ops.render
    pano._render_views.clear_cache()
    rgb_p, depth_p, invis_p = render_panorama(buf, c2w, chunk=256)
    pano._render_views.clear_cache()

    np.testing.assert_allclose(invis_p, invis_x, atol=5e-3)
    np.testing.assert_allclose(rgb_p, rgb_x, atol=5e-3)
    mask = invis_x < 0.5
    np.testing.assert_allclose(depth_p[mask], depth_x[mask], atol=1e-2)
