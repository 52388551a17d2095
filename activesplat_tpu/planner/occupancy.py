"""Occupancy-map construction from top-down renders.

Behavioral equivalents of the reference's obstacle-map pipeline
(src/planner/planner.py:111-199). Conventions (identical to the reference):

  * maps are uint8 images, 255 = free/traversable, 0 = obstacle/unknown;
  * 'visible map' input is 255 where the area is UNOBSERVED (the mapper's
    white-background render is pure white where nothing was mapped).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import cv2
import numpy as np


def clip_free_map_to_observed(
    free_map: np.ndarray, unobserved_map: np.ndarray, kernel: np.ndarray
) -> np.ndarray:
    """Constrain the free map to the largest observed region, drop unobserved
    islands, then morphologically open + dilate (update_topdown_free_map,
    planner.py:111-132)."""
    observed = cv2.bitwise_not(unobserved_map)
    contours, _ = cv2.findContours(observed, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    if not contours:
        return np.zeros_like(free_map)
    main_region = np.zeros_like(observed)
    cv2.drawContours(main_region, [max(contours, key=cv2.contourArea)], -1, 255, -1)

    # free space within the main observed region
    result = cv2.bitwise_and(main_region, free_map)
    # remove pixels that are inside the main region hull but never observed
    result[cv2.bitwise_and(main_region, unobserved_map) == 255] = 0
    result = cv2.morphologyEx(result, cv2.MORPH_OPEN, kernel)
    dilate_kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3))
    return cv2.dilate(result, dilate_kernel)


def build_obstacle_map(
    free_map: np.ndarray,
    unobserved_map: np.ndarray,
    agent_position: np.ndarray,  # (2,) pixel (u, v)
    kernel: np.ndarray,
    approx_precision: Optional[float],
) -> Tuple[np.ndarray, np.ndarray, List[np.ndarray]]:
    """The planner's working map: the polygon-approximated free-space region
    containing the agent, minus child obstacle polygons (get_obstacle_map,
    planner.py:134-199). Returns (obstacle_map 255=free, outer contour,
    child obstacle contours)."""
    clipped = clip_free_map_to_observed(free_map, unobserved_map, kernel)
    agent_pt = (float(agent_position[0]), float(agent_position[1]))

    def contour_containing_agent(image):
        contours, _ = cv2.findContours(image, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        if not contours:
            return None
        dists = np.array(
            [cv2.pointPolygonTest(c, agent_pt, False) for c in contours]
        )
        inside = np.where(dists >= 0)[0]
        if len(inside) == 0:
            return None
        return contours[inside[np.argmin(dists[inside])]]

    outer = contour_containing_agent(clipped)
    if outer is None:
        # fall back to the raw free map (planner.py:153-164)
        outer = contour_containing_agent(free_map)
    if outer is None:
        # degenerate: agent outside all free space — take the largest region
        contours, _ = cv2.findContours(
            clipped if clipped.any() else free_map,
            cv2.RETR_EXTERNAL,
            cv2.CHAIN_APPROX_SIMPLE,
        )
        outer = max(contours, key=cv2.contourArea)

    outer_approx = (
        outer if approx_precision is None else cv2.approxPolyDP(outer, approx_precision, True)
    )

    white = np.full_like(free_map, 255)
    black = np.zeros_like(free_map)
    outside_approx = cv2.drawContours(white.copy(), [outer_approx], -1, 0, -1)
    outside_exact = cv2.drawContours(white.copy(), [outer], -1, 0, -1)
    region_approx = cv2.drawContours(black.copy(), [outer_approx], -1, 255, -1)

    # obstacles inside the region: anything free-map-0 within the approx hull
    children_src = cv2.bitwise_not(
        cv2.bitwise_or(cv2.bitwise_or(outside_exact, outside_approx), free_map)
    )
    child_contours, _ = cv2.findContours(
        children_src, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
    )
    children = []
    for contour in child_contours:
        if cv2.contourArea(contour) <= 0:
            continue
        approx = (
            contour
            if approx_precision is None
            else cv2.approxPolyDP(contour, approx_precision, True)
        )
        if cv2.contourArea(approx) > 0:
            children.append(approx)
    obstacle_map = cv2.drawContours(region_approx, children, -1, 0, -1)
    return obstacle_map, outer_approx, children


def default_kernel(agent_radius_pixel: float) -> np.ndarray:
    size = max(3, int(np.ceil(agent_radius_pixel)) | 1)
    return cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (size, size))
