"""Incremental topdown engine: windowed re-renders must be indistinguishable
from full re-renders (reference semantics: full-grid re-render per map change,
visualizer.py:926-976)."""

import jax.numpy as jnp
import numpy as np

from activesplat_tpu.models.gaussians import GaussianBuffer
from activesplat_tpu.queries.topdown import (
    IncrementalTopdown,
    _changed_bbox,
    _topdown_binary,
    _topdown_dual,
    render_topdown,
    topdown_camera,
    world_to_topdown,
)
from activesplat_tpu.runtime.synthetic import BoxWorld
from tests.test_queries import buffer_from_points, world_topdown_cfg


def make_map(seed=3, n=4000):
    world = BoxWorld.single_room(seed=seed)
    cfg = world_topdown_cfg(world, pixel_max=96)
    pts = world.sample_surface(n, seed=seed)
    return world, cfg, buffer_from_points(pts, scale=0.08)


def test_dual_render_matches_pair_oracle():
    """The single dual-transmittance walk must reproduce the two-render pair
    (_topdown_binary), whose CPU/xla path composites via the independent
    bounded multipass walk — an oracle that shares no CSR code with the dual
    path."""
    _, cfg, buf = make_map()
    cam = topdown_camera(cfg)
    foot, head = jnp.float32(cfg.agent_foot), jnp.float32(cfg.agent_head)
    pair, _ = _topdown_binary(
        buf, cam, foot, head,
        height_axis=cfg.height_axis, chunk=256, k_per_tile=256, backend="xla",
    )
    rect = np.array([0, 0, cfg.width, cfg.height], np.int32)
    dual, _ = _topdown_dual(
        buf, cam, foot, head, rect,
        height_axis=cfg.height_axis, k_per_tile=256, backend="xla",
    )
    np.testing.assert_array_equal(np.asarray(pair), np.asarray(dual))


def test_dual_window_rect_matches_full_render_slice():
    """Window rects (the traced-cull replacement for the old per-window-size
    cameras) must reproduce the full render inside the rect exactly."""
    _, cfg, buf = make_map()
    cam = topdown_camera(cfg)
    foot, head = jnp.float32(cfg.agent_foot), jnp.float32(cfg.agent_head)

    def run(rect):
        both, _ = _topdown_dual(
            buf, cam, foot, head, np.asarray(rect, np.int32),
            height_axis=cfg.height_axis, k_per_tile=256, backend="xla",
        )
        return np.asarray(both)

    full = run([0, 0, cfg.width, cfg.height])
    win = 48
    for u0, v0 in [(0, 0), (16, 16), (cfg.width - win, cfg.height - win)]:
        w = min(win, cfg.width - u0)
        h = min(win, cfg.height - v0)
        both = run([u0, v0, w, h])
        np.testing.assert_array_equal(
            both[0][v0 : v0 + h, u0 : u0 + w],
            full[0][v0 : v0 + h, u0 : u0 + w],
        )
        np.testing.assert_array_equal(
            both[1][v0 : v0 + h, u0 : u0 + w],
            full[1][v0 : v0 + h, u0 : u0 + w],
        )


def test_changed_bbox_finds_exactly_the_touched_set():
    _, cfg, buf = make_map(n=512)
    snap = (buf.params, buf.active)

    # untouched buffer: zero changes, inverted (empty) box
    packed = np.asarray(
        _changed_bbox(buf.params, buf.active, *snap, jnp.float32(0.01))
    )
    assert packed[0] == 0 and np.all(packed[1:4] > packed[4:7])

    # move two gaussians, deactivate one, activate a fresh slot
    p = buf.params
    moved = p.means3d.at[3].add(jnp.array([0.5, 0.0, 0.0])).at[7].add(
        jnp.array([0.0, 0.0, -0.3])
    )
    new_active = buf.active.at[11].set(False)
    cap = buf.capacity
    new_active = new_active.at[cap - 1].set(True)
    means_new = moved.at[cap - 1].set(jnp.array([1.0, 0.5, 1.0]))
    buf2 = buf.replace(params=p.replace(means3d=means_new), active=new_active)
    packed = np.asarray(
        _changed_bbox(buf2.params, buf2.active, *snap, jnp.float32(0.01))
    )
    assert packed[0] == 4
    lo, hi = packed[1:4], packed[4:7]
    old = np.asarray(snap[0].means3d)
    new = np.asarray(means_new)
    for pt in [old[3], new[3], old[7], new[7], old[11], new[cap - 1]]:
        assert np.all(pt >= lo - 0.05) and np.all(pt <= hi + 0.05)


def test_incremental_refresh_equals_fresh_full_render():
    _, cfg, buf = make_map()
    eng = IncrementalTopdown(cfg)
    free0, unobs0 = eng.refresh(buf)
    assert eng.stats == {
        "full": 1, "window": 0, "clean": 0,
        "full_first": 1, "full_growth": 0, "full_oversize": 0,
    }
    f_ref, u_ref, _ = render_topdown(buf, cfg, chunk=256)
    np.testing.assert_array_equal(free0, f_ref)
    np.testing.assert_array_equal(unobs0, u_ref)

    # unchanged buffer -> cached maps, no render
    f1, u1 = eng.refresh(buf)
    assert eng.stats["clean"] == 1
    np.testing.assert_array_equal(f1, free0)

    # local perturbation: nudge gaussians inside a 0.4 m ball
    p = buf.params
    center = np.asarray(p.means3d[0])
    d = np.linalg.norm(np.asarray(p.means3d) - center, axis=1)
    local = jnp.asarray((d < 0.4) & np.asarray(buf.active))
    moved = jnp.where(local[:, None], p.means3d + 0.05, p.means3d)
    buf2 = buf.replace(params=p.replace(means3d=moved))
    f2, u2 = eng.refresh(buf2)
    assert eng.stats["window"] == 1, eng.stats
    f_ref2, u_ref2, _ = render_topdown(buf2, cfg, chunk=256)
    np.testing.assert_array_equal(f2, f_ref2)
    np.testing.assert_array_equal(u2, u_ref2)

    # global perturbation -> full-render fallback
    buf3 = buf2.replace(
        params=buf2.params.replace(means3d=buf2.params.means3d + 0.01)
    )
    f3, _ = eng.refresh(buf3)
    assert eng.stats["full"] == 2, eng.stats
    f_ref3, _, _ = render_topdown(buf3, cfg, chunk=256)
    np.testing.assert_array_equal(f3, f_ref3)


def test_capacity_growth_forces_full_render():
    _, cfg, buf = make_map(n=256)
    eng = IncrementalTopdown(cfg)
    eng.refresh(buf)
    grown = buf.grown(buf.capacity * 2)
    eng.refresh(grown)
    assert eng.stats["full"] == 2
