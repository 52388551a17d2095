"""Panorama score cache (MapperNode._get_opacity GLOBAL): equivalence with
fresh scoring when the map is unchanged, invalidation on any map change, and
bounded capacity (reference re-renders every node per SELECT_TARGET tick,
splatam/__init__.py:697-759).

Round-5 note: the round-4 "reach" mode (cross-version reuse via visible-reach
+ 2D line-of-sight invalidation) was deleted on measurement — 0 hits in 192
lookups (r04 cold) and 0 hits / 17 stale of 115 with LOS invalidation live
(r05 cold, EPISODE_r05). Only "off" and the exact "version" mode remain."""

import numpy as np

from activesplat_tpu.mapper.config import MapperConfig
from activesplat_tpu.runtime.bus import Bus
from activesplat_tpu.runtime.dataloader import RGBDSensor, SyntheticDataset
from activesplat_tpu.runtime.mapper_node import MapperNode
from activesplat_tpu.runtime.synthetic import BoxWorld


def make_node(tmp_path, pano_cache="version", **kw):
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
    node = make_node(tmp_path)
    calls = count_rendered(node, monkeypatch)
    node._get_opacity(True, NODES)
    # mutate the map: step once (map_every=2 -> frame 1 densifies)
    from activesplat_tpu.runtime.dataloader import action_to_twist, SimAction

    ver0 = node.mapper.map_version
    node._on_cmd_vel(action_to_twist(SimAction.MOVE_FORWARD))
    assert node.mapper.map_version > ver0
    node._get_opacity(True, NODES)
    assert calls == [2, 2]  # map changed -> full re-render
    assert node.pano_cache_stale == 2  # keys existed, version rejected them


def test_cache_capacity_evicts_oldest_version(tmp_path):
    node = make_node(tmp_path, pano_cache_capacity=3)
    h = node.last_frame["c2w"][1, 3]
    for i in range(5):
        key = tuple(np.round(np.array([float(i), h, 0.0]) / 0.05).astype(int))
        node._pano_cache[key] = {"version": i, "inv": 1.0, "vol": 0.0}
    # one real scoring round triggers the eviction sweep
    node._get_opacity(True, np.array([[2.5, 0.0, 2.5]]))
    assert len(node._pano_cache) <= 3
    # the oldest versions are the ones dropped
    assert min(e["version"] for e in node._pano_cache.values()) >= 2
