"""Host-side invisibility clustering and hole-volume scoring.

Behavioral equivalents of the reference's DBSCAN/ConvexHull scoring
(src/mapper/__init__.py:8-117), placed on host like the reference. Small
point sets use sklearn DBSCAN verbatim; large ones (mostly-invisible early
panoramas — the planner's hot path) switch to a morphological grid DBSCAN
that computes the same density clustering in a few O(HW) image ops.
"""

from __future__ import annotations

from typing import List, Tuple

import cv2
import numpy as np
import scipy.spatial
from sklearn.cluster import DBSCAN


# Above this many pixels, DBSCAN switches to the morphological grid path:
# sklearn's KD-tree walk costs ~190 ms on a mostly-invisible 150x360 panorama
# (21k points x ~78 neighbors), which is the planner's early-exploration hot
# path; the grid formulation computes the same density clustering in a few
# O(HW) image ops. Below the threshold the exact sklearn result is kept.
GRID_DBSCAN_MIN_POINTS = 5000


def _disk_kernel(radius: float) -> np.ndarray:
    r = int(np.floor(radius))
    yy, xx = np.mgrid[-r : r + 1, -r : r + 1]
    return (yy * yy + xx * xx <= radius * radius).astype(np.uint8)


def _grid_dbscan_labels(
    shape: Tuple[int, int], points: np.ndarray, eps: float, min_samples: int
) -> np.ndarray:
    """DBSCAN for integer grid points via image morphology.

    core = points with >= min_samples neighbors in the eps-disk (disk-kernel
    convolution, self included — sklearn semantics); clusters = connected
    components of cores dilated by an eps/2 disk (cores within eps overlap);
    border points join the cluster of their nearest core within eps (DBSCAN
    border assignment is implementation-order-defined, so 'nearest' is as
    valid as sklearn's visit order); the rest is noise (-1). Distance
    discretization at cluster boundaries can differ from sklearn by a pixel
    — hence the large-N-only switch where such ties are negligible."""
    mask = np.zeros(shape, np.uint8)
    mask[points[:, 0], points[:, 1]] = 1
    disk = _disk_kernel(eps)
    counts = cv2.filter2D(mask.astype(np.float32), -1, disk.astype(np.float32),
                          borderType=cv2.BORDER_CONSTANT)
    core = ((counts >= min_samples - 0.5) & (mask > 0)).astype(np.uint8)
    merged = cv2.dilate(core, _disk_kernel(eps / 2.0))
    _, comp = cv2.connectedComponents(merged)
    comp = np.where(core > 0, comp, 0)
    # nearest core pixel (and its distance) for border assignment
    dist, nearest = cv2.distanceTransformWithLabels(
        (core == 0).astype(np.uint8), cv2.DIST_L2, 5,
        labelType=cv2.DIST_LABEL_PIXEL,
    )
    core_ids = np.flatnonzero(core.reshape(-1))
    if len(core_ids) == 0:
        return np.full(len(points), -1, np.int64)
    # DIST_LABEL_PIXEL ids enumerate zero pixels of the source (the cores)
    # in scan order, starting at 1
    id_to_cluster = comp.reshape(-1)[core_ids]
    cluster_of = np.zeros(int(nearest.max()) + 1, np.int64)
    cluster_of[1 : len(core_ids) + 1] = id_to_cluster
    labels_img = np.where(
        core > 0,
        comp,
        np.where(dist <= eps, cluster_of[nearest], 0),
    )
    out = labels_img[points[:, 0], points[:, 1]].astype(np.int64) - 1
    return out  # 0 -> -1 (noise); clusters 0..k-1


def _dbscan_labels(
    shape: Tuple[int, int], points: np.ndarray, eps: float, min_samples: int
) -> np.ndarray:
    if len(points) > GRID_DBSCAN_MIN_POINTS:
        return _grid_dbscan_labels(shape, points, eps, min_samples)
    return DBSCAN(eps=eps, min_samples=min_samples).fit_predict(points)


def get_invisibility_clusters(
    invisibility: np.ndarray, cluster_invisibility_threshold: float = 30.0
) -> Tuple[List[np.ndarray], List[float]]:
    """Cluster pixels with invisibility > 0.3; keep clusters whose summed
    invisibility exceeds the threshold. Returns (centers (row, col), sums)
    (get_invisibility_clusters, src/mapper/__init__.py:92-117)."""
    points = np.column_stack(np.where(invisibility > 0.3))
    if len(points) == 0:
        return [], []
    labels = _dbscan_labels(invisibility.shape, points, eps=5, min_samples=10)
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
    labels = _dbscan_labels(invisibility.shape, points, eps=5, min_samples=25)
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
