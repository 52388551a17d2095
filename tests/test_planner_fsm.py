"""Planner FSM failure paths on a scripted world: forced ESCAPE (success and
exhaustion), the too-far target deferral, and the all-unarrived-failed weight
retune (reference behaviors: planner_node.py:775-867, 345-473, 1150-1164)."""

import numpy as np
import pytest

from activesplat_tpu.runtime.bus import Bus
from activesplat_tpu.runtime.planner_fsm import (
    FORWARD,
    WEIGHTS_INIT,
    PlannerFSM,
    PlannerState,
)

GRID = 100
MPP = 0.05  # world is 5m x 5m


def plus_corridor_map():
    """A + of two 13px-wide corridors: its Voronoi graph has a junction node
    at the center."""
    free = np.zeros((GRID, GRID), bool)
    free[44:57, 4:97] = True  # horizontal arm (v band)
    free[4:97, 44:57] = True  # vertical arm (u band)
    return free


def pose_c2w(u, v, height=1.25):
    """Identity-rotation OpenCV camera at grid pixel (u, v): heading +u."""
    c2w = np.eye(4)
    # world_dim_index=(2,0): u <- z / mpp, v <- (x_max - x) / mpp
    c2w[:3, 3] = [5.0 - v * MPP, height, u * MPP]
    return c2w


class ScriptedWorld:
    """Bus services for a static scripted occupancy world."""

    def __init__(self, bus: Bus, free_map: np.ndarray, tmp_path):
        self.bus = bus
        self.free_map = free_map
        self.forward_count = 0
        self.fail_counter = 0
        self.block_forward = False
        bus.register_service(
            "get_dataset_config",
            lambda: {
                "results_dir": str(tmp_path),
                "agent_turn_angle": 10.0,
                "agent_tilt_angle": 15.0,
                "agent_radius": 0.1,
                "agent_forward_step_size": 0.065,
                "rgbd_position": np.array([0.0, 1.25, 0.0]),
            },
        )
        bus.register_service(
            "get_topdown_config",
            lambda: {
                "world_dim_index": (2, 0),
                "world_2d_bbox": ((0.0, 5.0), (0.0, 5.0)),
                "grid_map_shape": (GRID, GRID),
                "meter_per_pixel": MPP,
            },
        )
        bus.register_service(
            "get_topdown",
            lambda arrived: {
                "free_map": self.free_map,
                "visible_map": self.free_map,
            },
        )
        bus.register_service(
            "get_opacity",
            lambda arrived, positions, nodes: {
                "targets_frustums_invisibility": np.full(len(nodes), 25.0),
                "targets_frustums_volume": np.ones(len(nodes)),
            },
        )
        bus.register_service("set_mapper", lambda *a, **k: True)
        bus.subscribe("cmd_vel", self._on_cmd_vel)

    def _on_cmd_vel(self, twist):
        if twist["linear"][0] <= 0:
            return  # turns/tilts always "succeed" silently
        self.forward_count += 1
        if self.block_forward:
            self.fail_counter += 1
            self.bus.publish("movement_fail_times", self.fail_counter)
        else:
            self.fail_counter = 0
            self.bus.publish("movement_fail_times", 0)


def make_fsm(tmp_path, free_map=None, **kwargs):
    bus = Bus()
    world = ScriptedWorld(bus, plus_corridor_map() if free_map is None else free_map, tmp_path)
    bus.publish("camera_pose", pose_c2w(10, 50))
    fsm = PlannerFSM(bus, seed=1, **kwargs)
    return bus, world, fsm


def test_movement_failure_forces_escape(tmp_path):
    bus, world, fsm = make_fsm(tmp_path)
    fsm.state = PlannerState.NAVIGATE
    fsm.navigation_path = np.array([[80.0, 50.0]])

    bus.publish("movement_fail_times", 1)
    assert fsm.escape_requested
    # the unreachable target is remembered as a fail vertex
    assert len(fsm.fail_vertices) == 1
    np.testing.assert_allclose(fsm.fail_vertices[-1], [80.0, 50.0])

    fsm.tick()
    assert fsm.state == PlannerState.ESCAPE


def test_escape_success_replans(tmp_path):
    bus, world, fsm = make_fsm(tmp_path)
    fsm.state = PlannerState.NAVIGATE
    fsm.navigation_path = np.array([[80.0, 50.0]])
    bus.publish("movement_fail_times", 1)
    fsm.tick()
    assert fsm.state == PlannerState.ESCAPE

    # world lets the forward probe through; rotation already observed here so
    # the FSM replans globally instead of local-refining
    world.block_forward = False
    fsm.rotation_observed_px = fsm.pose["px"][None].copy()
    fsm.tick()
    assert fsm.state == PlannerState.SELECT_TARGET
    assert world.forward_count >= 1
    assert fsm.movement_fail_times == 0


def test_escape_exhaustion_records_inaccessible(tmp_path):
    bus, world, fsm = make_fsm(tmp_path)
    fsm.state = PlannerState.NAVIGATE
    fsm.navigation_path = np.array([[80.0, 50.0]])
    bus.publish("movement_fail_times", 1)
    fsm.tick()
    assert fsm.state == PlannerState.ESCAPE

    world.block_forward = True
    fsm.tick()
    # every probed direction failed: they are in the inaccessible database
    # for this position, and the FSM falls back to target selection
    assert fsm.state == PlannerState.SELECT_TARGET
    assert len(fsm.inaccessible_db) == 1
    blocked = next(iter(fsm.inaccessible_db.values()))
    assert len(blocked) >= 1 and world.forward_count >= 1


def test_too_far_target_deferred_but_still_taken(tmp_path):
    """Targets beyond step_num_as_too_far are skipped in the scoring loop but
    kept as a deferred fallback; with no near target the deferred one is
    navigated to anyway (planner_node.py:345-473 semantics)."""
    bus, world, fsm = make_fsm(tmp_path, step_num_as_too_far=2)
    fsm.state = PlannerState.SELECT_TARGET
    fsm.tick()
    assert fsm.state == PlannerState.NAVIGATE, fsm.state
    assert fsm.navigation_path is not None
    # the accepted path is longer than the too-far limit -> it can only have
    # come through the deferred branch
    limit_px = fsm.max_steps_to_target * fsm.step_px
    path = np.vstack([fsm.pose["px"], fsm.navigation_path])
    length = float(np.sum(np.linalg.norm(np.diff(path, axis=0), axis=1)))
    assert length > limit_px


def test_all_unarrived_failed_retunes_weights(tmp_path):
    bus, world, fsm = make_fsm(tmp_path)
    assert fsm.weights == WEIGHTS_INIT
    assert fsm._refresh_maps(arrived=True)
    fsm._refresh_graph(arrived=False)  # build the graph without scoring
    assert fsm.vg is not None and len(fsm.vg.nodes_index) >= 1

    # mark every node as failed; none visited -> all unarrived nodes failed
    fsm.fail_vertices = fsm.vg.vertices[np.asarray(fsm.vg.nodes_index)].copy()
    fsm.visited_px = np.array([[2.0, 2.0]])
    fsm._score_nodes()

    assert fsm.weights["OPACITY_INVISIBILITY"] == 10
    assert fsm.weights["HOLE_INVISIBILITY"] == 10
    assert fsm.weights["IN_HORIZON"] == -1
    assert len(fsm.fail_vertices) == 0
    # FAIL flag cleared: no node carries the -60 penalty
    assert np.all(fsm.nodes_score > -60)


def test_manual_planning_click_targets(tmp_path):
    """MANUAL_PLANNING: a provider 'click' replaces node scoring
    (reference mouse_callback, planner_node.py:1296-1334): the nearest
    Voronoi node within 20 px wins; farther clicks and no-click ticks wait."""
    from activesplat_tpu.utils import GlobalState

    clicks = [None, np.array([2.0, 2.0]), np.array([52.0, 48.0])]
    bus, world, fsm = make_fsm(
        tmp_path, manual_target_provider=lambda vg, px: clicks.pop(0)
    )
    fsm.global_state = GlobalState.MANUAL_PLANNING
    fsm.state = PlannerState.SELECT_TARGET

    fsm.tick()  # provider returns None -> keep waiting
    assert fsm.state == PlannerState.SELECT_TARGET
    fsm.tick()  # click far from every node -> ignored
    assert fsm.state == PlannerState.SELECT_TARGET
    fsm.tick()  # click near the + junction node -> plan and navigate
    assert fsm.state == PlannerState.NAVIGATE
    assert fsm.navigation_path is not None
    target = fsm.vg.vertices[fsm.navigation_target_index]
    assert np.linalg.norm(target - np.array([52.0, 48.0])) <= 20.0


def test_planner_idles_outside_enable_states(tmp_path):
    """PAUSE / MANUAL_CONTROL: the FSM does not act (reference
    __ENABLE_STATES, planner_node.py:65)."""
    from activesplat_tpu.utils import GlobalState

    bus, world, fsm = make_fsm(tmp_path)
    fsm.state = PlannerState.NAVIGATE
    fsm.navigation_path = np.array([[80.0, 50.0]])
    for state in (GlobalState.PAUSE, GlobalState.MANUAL_CONTROL):
        fsm.global_state = state
        fsm.tick()
        assert fsm.state == PlannerState.NAVIGATE  # unchanged, no movement
        assert world.forward_count == 0


def test_navigate_bounce_livelock_breaker(tmp_path):
    """Repeated SELECT<->NAVIGATE bounces without movement poison the target
    (fail set, -60) and eventually force ESCAPE — the planner cannot spin
    forever when every fresh plan fails the whole-path line test."""
    bus, world, fsm = make_fsm(tmp_path)
    fsm._refresh_maps(arrived=True)
    fsm._refresh_graph(arrived=True)
    target = int(fsm.vg.nodes_index[0])
    unsafe_path = np.array([[50.0, 70.0], [50.0, 90.0]])  # cuts the + corner

    fails_before = len(fsm.fail_nodes_index)
    for i in range(23):
        fsm.state = PlannerState.NAVIGATE
        fsm.navigation_path = unsafe_path.copy()
        fsm.navigation_target_index = target
        fsm._tick_navigate()
        assert fsm.state == PlannerState.SELECT_TARGET
        assert world.forward_count == 0
    # every 3rd bounce records the stuck target
    assert fsm.fail_nodes_index.count(target) >= len(
        fsm.fail_nodes_index[:fails_before]
    ) + 3
    # the 24th bounce escalates to ESCAPE
    fsm.state = PlannerState.NAVIGATE
    fsm.navigation_path = unsafe_path.copy()
    fsm._tick_navigate()
    assert fsm.state == PlannerState.ESCAPE
    # any real movement resets the breaker
    fsm._move(FORWARD)
    assert fsm._no_move_bounces == 0


def test_nodeless_graph_scores_empty(tmp_path):
    """A Voronoi graph with no junction nodes (straight corridor) must not
    crash scoring (regression: empty los list coerced to float64 broke
    `in_bb & los`); target selection falls back to BOOTSTRAP."""
    free = np.zeros((GRID, GRID), bool)
    free[48:53, 10:90] = True  # thin corridor: its pruned graph has 0 nodes
    bus, world, fsm = make_fsm(tmp_path, free_map=free)
    fsm.horizon_bbox_px_translation = np.array([[0.0, 0.0], [99.0, 99.0]])
    fsm.state = PlannerState.SELECT_TARGET
    fsm.tick()  # must not raise
    assert len(fsm.nodes_score) == 0 or fsm.state in (
        PlannerState.BOOTSTRAP,
        PlannerState.NAVIGATE,
    )


def test_scan_churn_breaker_picks_farthest(tmp_path):
    """Three LOCAL_REFINE scans inside one pocket flip ONE selection round to
    farthest-of-tier (and release the local-subregion gate) — the r04/r05
    exploration stall: baby-hop targets + a ~40-action scan per arrival
    drained 700 steps inside a 2x2 m pocket (see the breaker note in
    PlannerFSM.__init__)."""
    bus, world, fsm = make_fsm(tmp_path)
    fsm._refresh_maps(arrived=True)
    fsm._refresh_graph(arrived=True)

    # no churn yet: _scan_churn is False with <3 refines
    assert not fsm._scan_churn()
    # three refine positions within 2*px_as_visited of each other => churn
    # (seed the history directly — ScriptedWorld's set_mapper stub returns a
    # bool, so driving the full refine path is a different test's job)
    for du in (0.0, 3.0, 6.0):
        fsm._refine_px_history.append(np.array([10.0 + du, 50.0]))
    assert fsm._scan_churn()

    # score all nodes equally so the tie-break decides; run one selection
    fsm.bus.publish("camera_pose", pose_c2w(10, 50))
    fsm.state = PlannerState.SELECT_TARGET
    fsm.tick()
    assert fsm.state == PlannerState.NAVIGATE
    assert fsm.scan_churn_breaks >= 0  # counter exists (hierarchical branch)
    chosen_far = fsm.vg.vertices[fsm.navigation_target_index]

    # rerun the same selection WITHOUT churn: nearest-of-tier must win, and
    # under equal scores the churn pick must be at least as far as that one
    fsm2_bus, _, fsm2 = make_fsm(tmp_path)
    fsm2._refresh_maps(arrived=True)
    fsm2._refresh_graph(arrived=True)
    fsm2.bus.publish("camera_pose", pose_c2w(10, 50))
    fsm2.state = PlannerState.SELECT_TARGET
    fsm2.tick()
    assert fsm2.state == PlannerState.NAVIGATE
    chosen_near = fsm2.vg.vertices[fsm2.navigation_target_index]
    px = fsm.pose["px"]
    assert np.linalg.norm(chosen_far - px) >= np.linalg.norm(
        chosen_near - px
    ) - 1e-9

    # a refine far away clears the churn window
    fsm._refine_px_history.append(np.array([80.0, 50.0]))
    del fsm._refine_px_history[:-4]
    assert not fsm._scan_churn()


def test_decision_log_written(tmp_path):
    """save_results dumps the decision ledger as planner_log.jsonl."""
    import json
    import os

    bus, world, fsm = make_fsm(tmp_path)
    fsm._refresh_maps(arrived=True)
    fsm._refresh_graph(arrived=True)
    fsm.state = PlannerState.SELECT_TARGET
    fsm.tick()
    fsm.save_results()
    path = os.path.join(str(tmp_path), "planner_log.jsonl")
    assert os.path.exists(path)
    events = [json.loads(l) for l in open(path)]
    kinds = {e["event"] for e in events}
    assert "scores" in kinds and ("target" in kinds or "no_target" in kinds)
