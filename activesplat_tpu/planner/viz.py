"""Planner visualization renderers (headless PNG producers — the role of the
reference's draw_voronoi_graph / plot_voronoi_subregions / visualize_agent,
planner.py:372-423, 576-611; gui_utils.py:283-307 — without a GUI)."""

from __future__ import annotations

from typing import Dict, List, Optional

import cv2
import numpy as np


def _score_color(score: float, lo: float, hi: float):
    """Red-ramp colormap for node scores (reference uses cm 'Reds')."""
    t = 0.0 if hi <= lo else float(np.clip((score - lo) / (hi - lo), 0, 1))
    # BGR: light pink -> saturated red
    return (int(200 * (1 - t) + 20 * t), int(200 * (1 - t) + 20 * t), 255)


def draw_voronoi_graph(
    background: np.ndarray,  # (H, W) uint8 obstacle map (255 = free)
    vertices: np.ndarray,
    graph,  # networkx graph with weighted edges
    nodes_index: np.ndarray,
    nodes_score: Optional[np.ndarray],
    pruned_chains: List[np.ndarray],
    ridge_color=(255, 0, 0),
    ridge_thickness: int = 1,
    node_radius: int = 3,
    pruned_color=(0, 255, 0),
) -> np.ndarray:
    image = cv2.cvtColor(background, cv2.COLOR_GRAY2BGR)
    for chain in pruned_chains:
        if len(chain) >= 2:
            cv2.polylines(image, [np.int32(chain)], False, pruned_color, 1)
    for a, b in graph.edges():
        cv2.line(
            image,
            np.int32(vertices[a]),
            np.int32(vertices[b]),
            ridge_color,
            ridge_thickness,
        )
    if nodes_score is None:
        nodes_score = np.zeros(len(nodes_index))
    lo, hi = float(np.min(nodes_score, initial=0)), float(
        np.max(nodes_score, initial=1)
    )
    for node, score in zip(nodes_index, nodes_score):
        cv2.circle(
            image,
            np.int32(vertices[int(node)]),
            node_radius,
            _score_color(float(score), lo, hi),
            -1,
        )
    return image


def draw_subregions(
    background: np.ndarray,
    vertices: np.ndarray,
    subregions: Dict[int, int],
    node_radius: int = 4,
) -> np.ndarray:
    """Color nodes by subregion id (plot_voronoi_subregions role)."""
    image = cv2.cvtColor(background, cv2.COLOR_GRAY2BGR)
    palette = [
        (31, 119, 180), (255, 127, 14), (44, 160, 44), (214, 39, 40),
        (148, 103, 189), (140, 86, 75), (227, 119, 194), (127, 127, 127),
        (188, 189, 34), (23, 190, 207),
    ]
    for node, cluster in subregions.items():
        color = palette[int(cluster) % len(palette)]
        cv2.circle(image, np.int32(vertices[int(node)]), node_radius, color, -1)
    return image


def visualize_agent(
    topdown_map: np.ndarray,
    meter_per_pixel: float,
    agent_translation: np.ndarray,  # (2,) px
    agent_rotation_vector: np.ndarray,  # (2,) unit heading
    agent_color=(0, 120, 255),
    agent_radius: float = 0.17,
    heading_color=(0, 255, 0),
    heading_length: float = 10.0,
) -> np.ndarray:
    """Agent disc + heading arrow over a map (gui_utils.py:283-307 role)."""
    image = topdown_map.copy()
    if image.ndim == 2:
        image = cv2.cvtColor(image, cv2.COLOR_GRAY2BGR)
    tip = agent_translation + heading_length * agent_rotation_vector
    cv2.arrowedLine(image, np.int32(agent_translation), np.int32(tip), heading_color, 1)
    cv2.circle(
        image,
        np.int32(agent_translation),
        max(1, int(agent_radius / meter_per_pixel)),
        agent_color,
        -1,
    )
    return image
