"""Post-episode planner-signal diagnosis (VERDICT r4 item 3).

Given a finished episode results dir (gaussians_data/params.npz), rebuild the
exact signal pipeline the planner FSM consumed — topdown free/unobserved maps
(queries/topdown.py render_topdown = the get_topdown service payload), the
processed agent-region free map (planner/occupancy.py build_obstacle_map with
the FSM's 4x4 kernel), the Voronoi graph and its nodes (planner/voronoi.py,
edge_sample_num=5 as in planner_fsm._refresh_graph) — and report the
geometry facts that decide whether the unexplored room is targetable:

- does the processed free map extend through the doorway (corridor px)?
- do Voronoi nodes exist beyond the doorway / near the frontier?
- which nodes sit within the FSM's close-to-obstacle ban radius
  (planner_fsm._score_nodes: _is_close_to_obstacle(px, 2*agent_radius)
  appends the node to fail_nodes_index PERMANENTLY)?

Writes diag_planner_signals.png (map composite with graph + node overlays)
and prints a JSON summary. Use PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu to run
on CPU.

Knobs via env: EP_DIR (results dir), EP_SCENE/EP_SEED/EP_RES (dataset ctor,
must match the episode), PIXEL_MAX (360), DOOR ("4.0,5.2,3.0" x0,x1,z for
two_room's doorway), AGENT_XZ (agent position for the region pick; default =
dataset start).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import cv2

    from activesplat_tpu.io.params_io import buffer_from_params, load_params
    from activesplat_tpu.planner.occupancy import build_obstacle_map
    from activesplat_tpu.planner.voronoi import build_voronoi_graph
    from activesplat_tpu.queries.topdown import (
        render_topdown,
        topdown_config_from_bbox,
        topdown_to_world,
        world_to_topdown,
    )
    from activesplat_tpu.runtime.launch import make_synthetic_dataset

    results_dir = os.environ["EP_DIR"]
    scene = os.environ.get("EP_SCENE", "two_room")
    seed = int(os.environ.get("EP_SEED", 0))
    res = int(os.environ.get("EP_RES", 256))
    pixel_max = int(os.environ.get("PIXEL_MAX", 360))
    door = tuple(
        float(x) for x in os.environ.get("DOOR", "4.0,5.2,3.0").split(",")
    )

    # mirror MapperNode's topdown grid setup (runtime/mapper_node.py:76-90)
    ds = make_synthetic_dataset(
        scene_id=scene, seed=seed, step_num=10, width=res, height=res
    )
    frame0 = ds.get_frame()
    sensor_h = float(frame0["c2w"][1, 3])
    agent_foot = sensor_h - float(ds.sensor.position[1])
    agent_head = agent_foot + ds.agent_height
    cfg_ds = ds.dataset_config(results_dir)
    bbox = np.asarray(cfg_ds["scene_bbox"], np.float64).copy()
    bbox[1, 0] = max(bbox[1, 0], agent_foot - 0.25)
    bbox[1, 1] = min(bbox[1, 1], agent_head + 2.0)
    td_cfg = topdown_config_from_bbox(
        bbox, agent_foot=agent_foot, agent_head=agent_head,
        pixel_max=pixel_max, height_axis=1,
    )
    mpp = td_cfg.meter_per_pixel
    agent_radius_px = float(cfg_ds["agent_radius"]) / mpp
    approx_precision_px = 0.225 / mpp  # FSM default obstacle_approx_precision

    params = load_params(
        os.path.join(results_dir, "gaussians_data", "params.npz")
    )
    buf = buffer_from_params(params)
    free_bin, unobs_bin, _ = render_topdown(buf, td_cfg)
    free = np.asarray(free_bin).astype(np.uint8) * 255
    unobserved = np.asarray(unobs_bin).astype(np.uint8) * 255

    if "AGENT_XZ" in os.environ:
        ax, az = (float(x) for x in os.environ["AGENT_XZ"].split(","))
        agent_world = np.array([ax, 0.0, az])
    else:
        agent_world = np.asarray(ds.position, np.float64)
    agent_px = world_to_topdown(agent_world[None], td_cfg)[0]

    # the FSM's exact processing (planner_fsm._refresh_maps / _refresh_graph)
    kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (4, 4))
    free_proc, outer_contour, child_contours = build_obstacle_map(
        free, unobserved, agent_px, kernel, approx_precision_px
    )
    vg = build_voronoi_graph(
        free_proc, outer_contour, child_contours,
        edge_sample_num=5, agent_radius_pixel=agent_radius_px,
        inaccessible_points=np.zeros((0, 2)),
    )

    # doorway corridor: processed-free samples across the door span
    x0, x1, zc = door
    xs = np.linspace(x0, x1, 25)
    door_px = world_to_topdown(
        np.stack([xs, np.zeros_like(xs), np.full_like(xs, zc)], -1), td_cfg
    )
    h, w = free_proc.shape

    def at(m, p):
        u, v = int(round(p[0])), int(round(p[1]))
        return int(m[v, u]) if 0 <= v < h and 0 <= u < w else -1

    corridor_px = int(np.sum([at(free_proc, p) > 0 for p in door_px]))

    nodes_px = (
        vg.vertices[vg.nodes_index] if len(vg.nodes_index) else np.zeros((0, 2))
    )
    node_world = np.array(
        [topdown_to_world(p, td_cfg, 0.0) for p in nodes_px]
    ).reshape(-1, 3)
    beyond = node_world[:, 2] > zc if len(node_world) else np.zeros(0, bool)

    # the FSM's permanent close-to-obstacle ban (_is_close_to_obstacle with
    # radius 2*agent_radius zero-positions the node forever)
    not_free = (free_proc == 0).astype(np.uint8)
    banned = []
    for p in nodes_px:
        mask = cv2.circle(
            np.zeros_like(free_proc), tuple(np.int32(p)),
            int(np.ceil(agent_radius_px * 2.0)), 255, -1,
        )
        banned.append(bool(cv2.countNonZero(mask & not_free)))

    summary = {
        "grid": [int(h), int(w)],
        "meter_per_pixel": round(mpp, 4),
        "agent_radius_px": round(agent_radius_px, 2),
        "free_px_raw": int(cv2.countNonZero(free)),
        "free_px_processed": int(cv2.countNonZero(free_proc)),
        "unobserved_px": int(cv2.countNonZero(unobserved)),
        "door_corridor_free_px": corridor_px,
        "door_samples": int(len(door_px)),
        "n_vertices": int(len(vg.vertices)),
        "n_nodes": int(len(vg.nodes_index)),
        "n_nodes_beyond_door": int(beyond.sum()),
        "n_nodes_banned_close_to_obstacle": int(np.sum(banned)),
        "nodes_world_xz": np.round(node_world[:, [0, 2]], 2).tolist(),
        "nodes_banned": banned,
    }
    print(json.dumps(summary, indent=2))

    # composite PNG: unobserved gray, raw free dark-green, processed free
    # bright-green; voronoi vertices orange; nodes yellow (banned magenta)
    img = np.zeros((h, w, 3), np.uint8)
    img[unobserved > 0] = (90, 90, 90)
    img[free > 0] = (40, 100, 40)
    img[free_proc > 0] = (40, 200, 40)
    for v in np.int32(vg.vertices):
        cv2.circle(img, tuple(v), 1, (200, 120, 40), -1)
    for p, b in zip(np.int32(nodes_px), banned):
        cv2.circle(img, tuple(p), 3, (255, 0, 255) if b else (0, 220, 220), -1)
    cv2.circle(img, tuple(np.int32(agent_px)), 3, (255, 255, 255), -1)
    for p in door_px:
        cv2.circle(img, (int(round(p[0])), int(round(p[1]))), 1, (0, 0, 255), -1)
    out = os.path.join(results_dir, "diag_planner_signals.png")
    cv2.imwrite(out, img)
    print("wrote", out)


if __name__ == "__main__":
    main()
