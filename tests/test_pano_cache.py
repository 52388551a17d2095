"""Panorama score cache (MapperNode._get_opacity GLOBAL): equivalence with
fresh scoring when the map is unchanged, reach-based reuse across map
changes, and invalidation when changes land within a node's visible reach
(VERDICT r3 next-round item 2; reference re-renders every node per tick,
splatam/__init__.py:697-759)."""

import numpy as np

from activesplat_tpu.mapper.config import MapperConfig
from activesplat_tpu.runtime.bus import Bus
from activesplat_tpu.runtime.dataloader import RGBDSensor, SyntheticDataset
from activesplat_tpu.runtime.mapper_node import MapperNode
from activesplat_tpu.runtime.synthetic import BoxWorld


def make_node(tmp_path, pano_cache="reach", **kw):
    world = BoxWorld.single_room(seed=3)
    sensor = RGBDSensor.from_fov(48, 48, 90.0, depth_min=0.0, depth_max=10.0)
    dataset = SyntheticDataset(
        world,
        sensor,
        step_num=40,
        start_position=np.array([3.0, 0.0, 3.0]),
        results_dir=str(tmp_path),
        scene_id="pano-cache",
    )
    cfg = MapperConfig(
        initial_capacity=1 << 12,
        max_capacity=1 << 13,
        keyframe_capacity=16,
        mapping_iters=2,
        map_every=2,
        kf_every=2,
        mapping_window_size=4,
        chunk=128,
        kf_select_pixels=128,
    )
    node = MapperNode(
        Bus(),
        dataset,
        cfg,
        str(tmp_path),
        pixel_max=56,
        pano_scale=0.4,
        save_dataset=False,
        pano_cache=pano_cache,
        **kw,
    )
    return node


NODES = np.array([[2.5, 0.0, 2.5], [3.5, 0.0, 3.0], [0.0, 0.0, 0.0]])


def count_rendered(node, monkeypatch):
    """Wrap the mapper's panorama renderer with a per-call node counter."""
    calls = []
    orig = node.mapper.get_global_invisibility

    def wrapped(view_c2w, positions):
        calls.append(len(positions))
        return orig(view_c2w, positions)

    monkeypatch.setattr(node.mapper, "get_global_invisibility", wrapped)
    return calls


def test_cached_equals_fresh_when_unchanged(tmp_path, monkeypatch):
    node = make_node(tmp_path)
    calls = count_rendered(node, monkeypatch)
    r1 = node._get_opacity(True, NODES, nodes_id=[0, 1, 2])
    assert calls == [2]  # zero node skipped, 2 rendered
    r2 = node._get_opacity(True, NODES, nodes_id=[0, 1, 2])
    assert calls == [2]  # all hits: nothing re-rendered
    np.testing.assert_array_equal(
        r1["targets_frustums_invisibility"], r2["targets_frustums_invisibility"]
    )
    np.testing.assert_array_equal(
        r1["targets_frustums_volume"], r2["targets_frustums_volume"]
    )
    assert node.pano_cache_hits == 2 and node.pano_cache_misses == 2


def test_cache_off_rerenders(tmp_path, monkeypatch):
    node = make_node(tmp_path, pano_cache="off")
    calls = count_rendered(node, monkeypatch)
    node._get_opacity(True, NODES)
    node._get_opacity(True, NODES)
    assert calls == [2, 2]


def test_version_mode_invalidates_on_map_change(tmp_path, monkeypatch):
    node = make_node(tmp_path, pano_cache="version")
    calls = count_rendered(node, monkeypatch)
    node._get_opacity(True, NODES)
    # mutate the map: step once (map_every=2 -> frame 1 densifies)
    from activesplat_tpu.runtime.dataloader import action_to_twist, SimAction

    ver0 = node.mapper.map_version
    node._on_cmd_vel(action_to_twist(SimAction.MOVE_FORWARD))
    assert node.mapper.map_version > ver0
    node._get_opacity(True, NODES)
    assert calls == [2, 2]  # version mode: map changed -> full re-render


def test_reach_mode_invalidates_nodes_with_holes(tmp_path, monkeypatch):
    """Fresh maps have hole pixels everywhere (reach=inf), so a map change
    must re-render — the reach cache only engages once panos are solid."""
    node = make_node(tmp_path)
    calls = count_rendered(node, monkeypatch)
    node._get_opacity(True, NODES)
    from activesplat_tpu.runtime.dataloader import action_to_twist, SimAction

    node._on_cmd_vel(action_to_twist(SimAction.MOVE_FORWARD))
    node._get_opacity(True, NODES)
    # after a handful of frames the synthetic map is nowhere near solid:
    # every cached reach is inf -> both nodes re-rendered
    assert calls == [2, 2]


def test_reach_mode_reuses_when_changes_are_out_of_reach(tmp_path):
    """Engineer a solid cache entry with small reach and a far-away change:
    the entry must be reused; a nearby change must invalidate it."""
    node = make_node(tmp_path)
    ver = node.mapper.map_version
    # the pano height comes from the current frame's camera height
    pos_key = tuple(
        np.round(
            np.array([2.5, node.last_frame["c2w"][1, 3], 2.5]) / 0.05
        ).astype(int)
    )
    node._pano_cache[pos_key] = {
        "version": ver, "inv": 7.0, "vol": 3.0, "reach": 1.0,
    }
    # simulate a map change far from the node (> reach + margin away)
    node.mapper.map_version += 1
    node.mapper._change_log.append(
        (node.mapper.map_version, np.array([[20.0, 0.0, 20.0], [21.0, 1.0, 21.0]]))
    )
    out = node._get_opacity(True, np.array([[2.5, 0.0, 2.5]]))
    assert out["targets_frustums_invisibility"] == [7.0]  # cached value reused
    assert out["targets_frustums_volume"] == [3.0]
    # now a change right at the node -> must re-score (value changes)
    node.mapper.map_version += 1
    node.mapper._change_log.append(
        (node.mapper.map_version, np.array([[2.0, 0.0, 2.0], [3.0, 2.0, 3.0]]))
    )
    out2 = node._get_opacity(True, np.array([[2.5, 0.0, 2.5]]))
    assert out2["targets_frustums_invisibility"] != [7.0]


def test_reach_checks_each_box_not_their_union(tmp_path):
    """Two far-apart changes whose UNION AABB covers the node, each
    individually out of reach: the entry must stay fresh (the r04 cold
    episode's 0/192 hit rate came from testing the union)."""
    node = make_node(tmp_path)
    ver = node.mapper.map_version
    pos_key = tuple(
        np.round(
            np.array([2.5, node.last_frame["c2w"][1, 3], 2.5]) / 0.05
        ).astype(int)
    )
    node._pano_cache[pos_key] = {
        "version": ver, "inv": 7.0, "vol": 3.0, "reach": 1.0,
    }
    # changes on opposite sides of the node, both ~17 m away; their union
    # box spans [-20, 21] and contains the node at (2.5, 2.5)
    node.mapper.map_version += 1
    node.mapper._change_log.append(
        (node.mapper.map_version, np.array([[20.0, 0.0, 20.0], [21.0, 3.0, 21.0]]))
    )
    node.mapper.map_version += 1
    node.mapper._change_log.append(
        (node.mapper.map_version, np.array([[-20.0, 0.0, -20.0], [-19.0, 3.0, -19.0]]))
    )
    p3d = np.array([2.5, node.last_frame["c2w"][1, 3], 2.5])
    union = node.mapper.aabb_since(ver)
    assert (union[0] <= p3d).all() and (union[1] >= p3d).all()  # union covers it
    out = node._get_opacity(True, np.array([[2.5, 0.0, 2.5]]))
    assert out["targets_frustums_invisibility"] == [7.0]  # still cached


def _put_entry(node, world_xz, reach):
    p3d = np.array([world_xz[0], node.last_frame["c2w"][1, 3], world_xz[1]])
    key = tuple(np.round(p3d / 0.05).astype(int))
    node._pano_cache[key] = {
        "version": node.mapper.map_version, "inv": 7.0, "vol": 3.0,
        "reach": reach,
    }
    return p3d


def _occluder_maps(node, wall_v=None, gap_u=None):
    """(free, unobserved) grids: free everywhere, plus an optional solid wall
    row at pixel v=wall_v (optionally with a gap at pixel u=gap_u±2)."""
    w, h = node.topdown_cfg.grid_shape
    free = np.ones((h, w), np.uint8)
    unobs = np.zeros((h, w), np.uint8)
    if wall_v is not None:
        free[wall_v, :] = 0  # observed occupied: free=0, unobserved=0
        if gap_u is not None:
            free[wall_v, gap_u - 2 : gap_u + 3] = 1
    return free, unobs


def _los_geometry(node):
    """Node/box world positions separated along the grid's v axis, plus the
    wall pixel row between them (world u/v axes are cfg.world_dim_index —
    NOT world x/z)."""
    from activesplat_tpu.queries.topdown import world_to_topdown

    cfg = node.topdown_cfg
    (u0, u1), (v0, v1) = cfg.world_2d_bbox
    du, dv = cfg.world_dim_index
    node_w = np.zeros(3)
    node_w[du] = u0 + 0.35 * (u1 - u0)
    node_w[dv] = v0 + 0.30 * (v1 - v0)
    box_w = np.zeros(3)
    box_w[du] = u0 + 0.40 * (u1 - u0)
    box_w[dv] = v0 + 0.75 * (v1 - v0)
    box = np.stack([box_w - 0.3, box_w + 0.3])
    box[0, (set((0, 1, 2)) - {du, dv}).pop()] = 0.0  # height extent
    mid_uv = world_to_topdown(((node_w + box_w) / 2)[None], cfg)[0]
    return node_w, box, int(round(mid_uv[1])), int(round(mid_uv[0]))


def test_reach_mode_los_blocked_change_keeps_entry(tmp_path):
    """A change box fully behind an observed wall must NOT invalidate a
    node's cached score, even when the node's reach is infinite (holes):
    2D line-of-sight is the only invalidation test with indoor teeth."""
    node = make_node(tmp_path)
    node_w, box, wall_v, gap_u = _los_geometry(node)
    _put_entry(node, (node_w[0], node_w[2]), reach=float("inf"))
    node.mapper.map_version += 1
    node.mapper._change_log.append((node.mapper.map_version, box))

    free, unobs = _occluder_maps(node, wall_v=wall_v)
    node._topdown_cache = (node.mapper.map_version, free, unobs)
    out = node._get_opacity(True, np.array([[node_w[0], 0.0, node_w[2]]]))
    assert out["targets_frustums_invisibility"] == [7.0]  # cached: walled off
    assert node.pano_cache_hits == 1

    # same geometry with a gap in the wall on the node<->box line: visible
    free, unobs = _occluder_maps(node, wall_v=wall_v, gap_u=gap_u)
    node._topdown_cache = (node.mapper.map_version, free, unobs)
    _put_entry(node, (node_w[0], node_w[2]), reach=float("inf"))
    node.mapper.map_version += 1
    node.mapper._change_log.append((node.mapper.map_version, box))
    out2 = node._get_opacity(True, np.array([[node_w[0], 0.0, node_w[2]]]))
    assert out2["targets_frustums_invisibility"] != [7.0]  # re-scored


def test_reach_mode_stale_occluder_map_is_not_used(tmp_path):
    """An occluder map older than the cached score can't prove anything —
    the wall test must be skipped and the entry re-scored."""
    node = make_node(tmp_path)
    node_w, box, wall_v, _ = _los_geometry(node)
    _put_entry(node, (node_w[0], node_w[2]), reach=float("inf"))
    stale_ver = node.mapper.map_version - 1  # predates the cached score
    node.mapper.map_version += 1
    node.mapper._change_log.append((node.mapper.map_version, box))
    free, unobs = _occluder_maps(node, wall_v=wall_v)
    node._topdown_cache = (stale_ver, free, unobs)
    out = node._get_opacity(True, np.array([[node_w[0], 0.0, node_w[2]]]))
    assert out["targets_frustums_invisibility"] != [7.0]  # re-scored


def test_los_blocked_unit():
    from activesplat_tpu.queries.topdown import los_blocked

    solid = np.zeros((32, 32), np.uint8)
    solid[16, :] = 1  # horizontal wall
    a, b = np.array([5.0, 5.0]), np.array([5.0, 27.0])
    assert los_blocked(solid, a, b)  # crosses the wall
    assert not los_blocked(solid, a, np.array([27.0, 5.0]))  # same side
    # endpoint ON the wall: the trim disk excludes it -> not blocked
    assert not los_blocked(solid, a, np.array([5.0, 16.0]))
    # out-of-grid endpoint -> conservative "visible"
    assert not los_blocked(solid, a, np.array([5.0, 40.0]))


def test_trimmed_change_log_forces_rescore(tmp_path):
    node = make_node(tmp_path)
    ver = node.mapper.map_version
    pos_key = tuple(
        np.round(
            np.array([2.5, node.last_frame["c2w"][1, 3], 2.5]) / 0.05
        ).astype(int)
    )
    node._pano_cache[pos_key] = {
        "version": ver, "inv": 7.0, "vol": 3.0, "reach": 1.0,
    }
    node.mapper.map_version += 5
    node.mapper._change_log_floor = ver + 3  # entries that old were trimmed
    assert node.mapper.aabb_since(ver) is None
    out = node._get_opacity(True, np.array([[2.5, 0.0, 2.5]]))
    assert out["targets_frustums_invisibility"] != [7.0]  # re-scored
