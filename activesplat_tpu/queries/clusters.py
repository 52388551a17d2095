"""Host-side invisibility clustering and hole-volume scoring.

Behavioral equivalents of the reference's DBSCAN/ConvexHull scoring
(src/mapper/__init__.py:8-117). Data here is tiny (360x150 panoramas), so
host numpy/sklearn/scipy is the right tool — identical to the reference's
placement of this work.
"""

from __future__ import annotations

from typing import List, Tuple

import cv2
import numpy as np
import scipy.spatial
from sklearn.cluster import DBSCAN


def get_invisibility_clusters(
    invisibility: np.ndarray, cluster_invisibility_threshold: float = 30.0
) -> Tuple[List[np.ndarray], List[float]]:
    """Cluster pixels with invisibility > 0.3; keep clusters whose summed
    invisibility exceeds the threshold. Returns (centers (row, col), sums)
    (get_invisibility_clusters, src/mapper/__init__.py:92-117)."""
    points = np.column_stack(np.where(invisibility > 0.3))
    if len(points) == 0:
        return [], []
    labels = DBSCAN(eps=5, min_samples=10).fit_predict(points)
    centers, sums = [], []
    for label in set(labels):
        if label == -1:
            continue
        members = points[labels == label]
        total = float(np.sum(invisibility[members[:, 0], members[:, 1]]))
        if total > cluster_invisibility_threshold:
            centers.append(members.mean(axis=0))
            sums.append(total)
    return centers, sums


def get_convexhull_volume(
    depth: np.ndarray,  # (H, W_total) stitched panorama depth
    invisibility: np.ndarray,  # (H, W_total)
    vfov_deg: float = 150.0,
    depth_far: float = 15.0,
) -> Tuple[float, float]:
    """Score map holes: cluster highly-invisible pixels (>0.8), take each
    cluster's dilated-contour ring, lift it to (azimuth, elevation, depth)
    coordinates, and sum ConvexHull volumes weighted by cluster invisibility
    (get_convexhull_volume, src/mapper/__init__.py:8-90). Returns
    (sum of invisibility*volume, sum of volumes)."""
    if depth.ndim == 3:
        depth = depth[..., 0]
    points = np.column_stack(np.where(invisibility > 0.8))
    if len(points) == 0:
        return 0.0, 0.0
    labels = DBSCAN(eps=5, min_samples=25).fit_predict(points)
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (15, 15))
    h_rad_per_px = np.deg2rad(360.0 / depth.shape[1])
    v_rad_per_px = np.deg2rad(vfov_deg / depth.shape[0])

    inv_volume_sum = 0.0
    volume_sum = 0.0
    for label in set(labels):
        if label == -1:
            continue
        members = points[labels == label]
        mask = np.zeros(invisibility.shape, np.uint8)
        mask[members[:, 0], members[:, 1]] = 255
        cluster_invisibility = invisibility[members[:, 0], members[:, 1]]
        dilated = cv2.dilate(mask, kernel, iterations=1)
        contours, _ = cv2.findContours(
            dilated, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
        )
        if not contours:
            continue
        contour = max(contours, key=cv2.contourArea).reshape(-1, 2)
        ring = []
        for x, y in contour:
            if 0 <= y < depth.shape[0] and 0 <= x < depth.shape[1]:
                z = depth[y, x]
                if z >= depth_far:  # unmapped/far pixels carry no geometry
                    continue
                ring.append([x * h_rad_per_px, y * v_rad_per_px, z])
        ring = np.asarray(ring, np.float64)
        volume = 0.0
        if len(ring) >= 4:
            if np.linalg.matrix_rank(ring - ring.mean(0)) < 3:
                ring = ring + np.random.normal(scale=1e-10, size=ring.shape)
            try:
                volume = float(scipy.spatial.ConvexHull(ring).volume)
            except scipy.spatial.QhullError:
                volume = 0.0
        inv_volume_sum += float(np.sum(cluster_invisibility)) * volume
        volume_sum += volume
    return inv_volume_sum, volume_sum
