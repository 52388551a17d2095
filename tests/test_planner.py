"""Planner library on synthetic occupancy grids (pure host CPU — fast)."""

import cv2
import numpy as np
import pytest

from activesplat_tpu.planner.navigation import (
    fast_forward_path,
    get_escape_plan,
    interpolate_path,
    line_is_safe,
    polyline_is_safe,
    safe_dijkstra_path,
    splat_inaccessible,
)
from activesplat_tpu.planner.occupancy import build_obstacle_map, default_kernel
from activesplat_tpu.planner.voronoi import (
    build_voronoi_graph,
    closest_node,
    closest_reachable_vertex,
    compute_subregions,
)
from activesplat_tpu.runtime.synthetic import BoxWorld


def world_occupancy(world: BoxWorld, pixels_per_meter=10.0):
    """Rasterize ground-truth occupancy: free=255 where the agent fits."""
    sx, _, sz = world.size
    w = int(sx * pixels_per_meter)
    h = int(sz * pixels_per_meter)
    free = np.zeros((h, w), np.uint8)
    for v in range(h):
        for u in range(w):
            x = (u + 0.5) / pixels_per_meter
            z = (v + 0.5) / pixels_per_meter
            if world.is_free(np.array([x, z])):
                free[v, u] = 255
    return free


@pytest.fixture(scope="module")
def occupancy():
    world = BoxWorld.two_room(seed=0)
    free = world_occupancy(world)
    unobserved = np.zeros_like(free)  # fully observed
    agent = np.array([50.0, 15.0])  # pixel (u, v) in room 1 (z=1.5m, x=5m)
    kernel = default_kernel(2.0)
    obstacle_map, outer, children = build_obstacle_map(
        free, unobserved, agent, kernel, approx_precision=2.0
    )
    return world, free, obstacle_map, outer, children, agent


def test_obstacle_map_basics(occupancy):
    world, free, obstacle_map, outer, children, agent = occupancy
    assert obstacle_map.dtype == np.uint8
    # agent position is free
    assert obstacle_map[int(agent[1]), int(agent[0])] == 255
    # there is meaningful free space and some obstacles
    frac_free = (obstacle_map == 255).mean()
    assert 0.2 < frac_free < 0.98
    # the dividing wall (z=3m -> v=30) blocks except at the doorway
    wall_row = obstacle_map[30, :]
    assert (wall_row == 0).sum() > wall_row.size * 0.5


def test_voronoi_graph_structure(occupancy):
    world, free, obstacle_map, outer, children, agent = occupancy
    vg = build_voronoi_graph(
        obstacle_map, outer, children,
        edge_sample_num=2, agent_radius_pixel=1.7,
        inaccessible_points=np.zeros((0, 2)),
    )
    assert len(vg.vertices) > 5
    assert len(vg.nodes_index) >= 1
    # all vertices must lie in free space
    for v in vg.vertices:
        assert obstacle_map[int(round(v[1])), int(round(v[0]))] == 255, v
    # edges weighted by euclidean length
    for a, b, data in vg.graph.edges(data=True):
        expected = np.linalg.norm(vg.vertices[a] - vg.vertices[b])
        np.testing.assert_allclose(data["weight"], expected, rtol=1e-6)


def test_dijkstra_cross_room(occupancy):
    world, free, obstacle_map, outer, children, agent = occupancy
    vg = build_voronoi_graph(
        obstacle_map, outer, children,
        edge_sample_num=2, agent_radius_pixel=1.7,
        inaccessible_points=np.zeros((0, 2)),
    )
    start = closest_reachable_vertex(vg.vertices, obstacle_map, agent, 1.7)
    # a target in the other room (z = 4.5 m -> v = 45)
    goal_px = np.array([50.0, 45.0])
    goal = closest_node(vg.vertices, np.arange(len(vg.vertices)), goal_px)
    path_idx, path, connected = safe_dijkstra_path(
        vg.graph, start, goal, vg.vertices, obstacle_map, agent, 1.0
    )
    assert connected
    assert path is not None and len(path) >= 1
    assert polyline_is_safe(obstacle_map, path, 2)
    # path must route through the doorway band (x in [4, 5.2] m)
    crossing = [p for p in path if abs(p[1] - 30) < 3]
    if crossing:  # if it crosses the wall row it must be inside the doorway
        for p in crossing:
            assert 38 <= p[0] <= 54, p


def test_fast_forward_shortens(occupancy):
    world, free, obstacle_map, outer, children, agent = occupancy
    # straight corridor of waypoints ahead of the agent
    path = np.array([[50.0, 17.0], [50.0, 20.0], [50.0, 24.0], [50.0, 27.0]])
    ff = fast_forward_path(path, obstacle_map, agent, 1.0)
    assert len(ff) <= len(path)
    assert np.allclose(ff[-1], path[-1])


def test_interpolate_path():
    path = np.array([[0.0, 0.0], [5.0, 1.0], [10.0, 0.0], [15.0, 3.0]])
    smooth = interpolate_path(path, num=30)
    assert smooth.shape == (30, 2)
    np.testing.assert_allclose(smooth[0], path[0], atol=1e-6)
    np.testing.assert_allclose(smooth[-1], path[-1], atol=1e-6)


def test_line_safety():
    grid = np.full((50, 50), 255, np.uint8)
    grid[:, 25] = 0  # a wall
    assert line_is_safe(grid, np.array([5, 5]), np.array([20, 20]), 1)
    assert not line_is_safe(grid, np.array([5, 25]), np.array([45, 25]), 1)


def test_escape_plan_turns_away_from_wall():
    grid = np.full((60, 60), 255, np.uint8)
    grid[:, 40:] = 0  # wall on the right (east)
    agent = np.array([38.0, 30.0])
    heading = np.array([1.0, 0.0])  # facing the wall
    direction, mask = get_escape_plan(
        grid, agent, heading, agent_turn_angle_deg=30.0,
        agent_step_size_pixel=8.0, inaccessible_directions=np.zeros((0, 2)),
        rng=np.random.default_rng(0),
    )
    assert direction in (-1, 1)
    assert mask.dtype == bool and mask.any()
    assert len(mask) == 12


def test_splat_inaccessible():
    grid = np.full((40, 40), 255, np.uint8)
    db = {(20.0, 20.0): np.array([[1.0, 0.0]])}
    out = splat_inaccessible(grid, db, splat_size_pixel=4.0)
    assert out[20, 24] == 0  # splat one step ahead of the failed heading
    assert out[20, 10] == 255


def test_subregions_two_rooms(occupancy):
    world, free, obstacle_map, outer, children, agent = occupancy
    vg = build_voronoi_graph(
        obstacle_map, outer, children,
        edge_sample_num=2, agent_radius_pixel=1.7,
        inaccessible_points=np.zeros((0, 2)),
    )
    subregions = compute_subregions(
        vg.graph, vg.nodes_index, vg.vertices, meter_per_pixel=0.1
    )
    assert set(subregions.keys()) == set(int(i) for i in vg.nodes_index)
    if len(vg.nodes_index) >= 2:
        # nodes exist in both rooms -> at least 2 subregions expected when
        # nodes span the dividing wall
        rows = vg.vertices[vg.nodes_index][:, 1]
        if rows.min() < 25 and rows.max() > 35:
            assert len(set(subregions.values())) >= 2
