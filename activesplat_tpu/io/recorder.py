"""Runtime-data recorder (the reference's save_runtime_data:=1 artifact dumps,
visualizer.py:840-853 + planner_node.py:941-945,1460-1489): per-step top-down
maps, per-node opacity panoramas, current view renders."""

from __future__ import annotations

import os
from typing import Optional

import cv2
import numpy as np


def _colorize(gray: np.ndarray) -> np.ndarray:
    gray = np.asarray(gray, np.float64)
    top = gray.max() if gray.max() > 0 else 1.0
    u8 = np.clip(gray / top * 255, 0, 255).astype(np.uint8)
    return cv2.applyColorMap(u8, cv2.COLORMAP_JET)


class RuntimeRecorder:
    def __init__(self, results_dir: str):
        self.topdown_dir = os.path.join(results_dir, "topdown_map")
        self.opacity_dir = os.path.join(results_dir, "opacity")
        self.view_dir = os.path.join(results_dir, "current_vis_data")
        for d in (self.topdown_dir, self.opacity_dir, self.view_dir):
            os.makedirs(d, exist_ok=True)
        self.topdown_count = 0

    def save_topdown(self, free_binary: np.ndarray, unobserved_binary: np.ndarray):
        step = self.topdown_count
        self.topdown_count += 1
        cv2.imwrite(
            os.path.join(self.topdown_dir, f"free_{step:05d}.png"),
            free_binary.astype(np.uint8) * 255,
        )
        cv2.imwrite(
            os.path.join(self.topdown_dir, f"unobserved_{step:05d}.png"),
            unobserved_binary.astype(np.uint8) * 255,
        )

    def save_panorama(self, step: int, node_id, invisibility: np.ndarray):
        d = os.path.join(self.opacity_dir, f"step_{step}")
        os.makedirs(d, exist_ok=True)
        cv2.imwrite(os.path.join(d, f"{node_id}.png"), _colorize(invisibility))

    def save_rgbd_silhouette(
        self,
        step: int,
        gt_rgb: np.ndarray,  # (H, W, 3) float [0,1] or uint8
        gt_depth: np.ndarray,  # (H, W) meters
        rendered_rgb: np.ndarray,
        rendered_depth: np.ndarray,
        silhouette: np.ndarray,  # (H, W) alpha [0,1]
        psnr: float,
        depth_l1: float,
    ) -> None:
        """2x3 diagnostic panel — GT RGB | GT depth | silhouette over
        rendered RGB (PSNR) | rendered depth (L1) | |depth diff| — the
        matplotlib-free equivalent of the reference's plot_rgbd_silhouette
        (eval_helpers.py:110-151; same cell layout, jet depth maps)."""

        def to_bgr8(rgb):
            if rgb.dtype != np.uint8:
                rgb = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
            return cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR)

        def depth_jet(d, vmax=6.0):
            u8 = np.clip(np.asarray(d, np.float64) / vmax * 255, 0, 255)
            return cv2.applyColorMap(u8.astype(np.uint8), cv2.COLORMAP_JET)

        def label(img, text):
            img = img.copy()
            cv2.putText(img, text, (4, 14), cv2.FONT_HERSHEY_SIMPLEX, 0.38,
                        (255, 255, 255), 1, cv2.LINE_AA)
            return img

        sil_u8 = (np.clip(silhouette, 0, 1) * 255).astype(np.uint8)
        diff = np.abs(
            np.asarray(gt_depth, np.float64) - np.asarray(rendered_depth,
                                                          np.float64)
        ) * (np.asarray(gt_depth) > 0)
        top = np.hstack([
            label(to_bgr8(gt_rgb), "GT RGB"),
            label(depth_jet(gt_depth), "GT Depth"),
            label(cv2.cvtColor(sil_u8, cv2.COLOR_GRAY2BGR), "Silhouette"),
        ])
        bottom = np.hstack([
            label(to_bgr8(rendered_rgb), f"Render PSNR {psnr:.2f}"),
            label(depth_jet(rendered_depth), f"Render L1 {depth_l1:.2f}"),
            label(depth_jet(diff), "|Depth diff|"),
        ])
        cv2.imwrite(
            os.path.join(self.view_dir, f"rgbd_sil_{step:05d}.png"),
            np.vstack([top, bottom]),
        )

    def save_view(self, step: int, rgb: np.ndarray, depth: Optional[np.ndarray]):
        if rgb.dtype != np.uint8:
            rgb = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
        cv2.imwrite(
            os.path.join(self.view_dir, f"rgb_{step:05d}.png"),
            cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR),
        )
        if depth is not None:
            cv2.imwrite(
                os.path.join(self.view_dir, f"depth_{step:05d}.png"),
                _colorize(depth),
            )
