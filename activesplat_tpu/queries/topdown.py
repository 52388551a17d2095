"""Top-down occupancy / visibility queries on the Gaussian map.

Reproduces the reference's top-down pipeline (visualizer.py:920-976,
1576-1618, 2277-2286): a near-orthographic camera far above the scene renders
(a) the *free map* — opacity of the height-sliced map with splats shrunk by
scale_modifier=0.01, free where opacity <= 0.4 — and (b) the *visible map* —
a white-background color render where pure-white pixels mean "never
observed". Grid geometry (pixel_max over the larger dimension, world<->pixel
transforms) follows gui_utils.config_topdown_info /
translations_world_to_topdown (gui_utils.py:170-281).

Coordinate convention (this framework): world height axis +up; the top-down
image u axis is world dim (h+1)%3 increasing, v axis is world dim (h-1)%3
DEcreasing (the camera below looks along -height with x_cam aligned to dim_i).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from activesplat_tpu.models.gaussians import Camera, GaussianBuffer, make_camera
from activesplat_tpu.ops.render import render_jit

CAMERA_HEIGHT = 1000.0  # visualizer.py:1577
FREE_OPACITY_THRESHOLD = 0.4  # visualizer.py:954
TOPDOWN_SCALE_MODIFIER = 0.01  # visualizer.py:936-937


@dataclasses.dataclass(frozen=True)
class TopdownConfig:
    height_axis: int  # world axis pointing up
    world_dim_index: Tuple[int, int]  # (u-axis world dim, v-axis world dim)
    world_2d_bbox: Tuple[Tuple[float, float], Tuple[float, float]]
    grid_shape: Tuple[int, int]  # (width px, height px)
    meter_per_pixel: float
    world_center: Tuple[float, float]
    agent_foot: float  # world height of agent base
    agent_head: float  # world height of agent top

    @property
    def width(self) -> int:
        return self.grid_shape[0]

    @property
    def height(self) -> int:
        return self.grid_shape[1]


def topdown_config_from_bbox(
    bbox: np.ndarray,  # (3, 2) world min/max
    agent_foot: float,
    agent_head: float,
    pixel_max: int = 360,
    height_axis: int = 1,
    padding_ratio: float = 0.05,
) -> TopdownConfig:
    """Grid geometry from a scene bbox (visualizer.py:214-273 semantics:
    pad the bbox, pixel_max pixels along the larger dimension)."""
    bbox = np.asarray(bbox, np.float64)
    bbox = bbox + padding_ratio * np.ptp(bbox, axis=1, keepdims=True) * np.array(
        [-1.0, 1.0]
    )
    dim_u = (height_axis + 1) % 3
    dim_v = (height_axis - 1) % 3
    ub = (float(bbox[dim_u, 0]), float(bbox[dim_u, 1]))
    vb = (float(bbox[dim_v, 0]), float(bbox[dim_v, 1]))
    shape_u = ub[1] - ub[0]
    shape_v = vb[1] - vb[0]
    meter_per_pixel = max(shape_u, shape_v) / pixel_max
    grid = (
        int(np.ceil(shape_u / meter_per_pixel)),
        int(np.ceil(shape_v / meter_per_pixel)),
    )
    return TopdownConfig(
        height_axis=height_axis,
        world_dim_index=(dim_u, dim_v),
        world_2d_bbox=(ub, vb),
        grid_shape=grid,
        meter_per_pixel=meter_per_pixel,
        world_center=((ub[0] + ub[1]) / 2, (vb[0] + vb[1]) / 2),
        agent_foot=agent_foot,
        agent_head=agent_head,
    )


def world_to_topdown(points: np.ndarray, cfg: TopdownConfig) -> np.ndarray:
    """(N, 3) world -> (N, 2) float pixel coordinates (u, v)."""
    pts = np.asarray(points, np.float64).reshape(-1, 3)
    u = (pts[:, cfg.world_dim_index[0]] - cfg.world_2d_bbox[0][0]) / cfg.meter_per_pixel
    v = (cfg.world_2d_bbox[1][1] - pts[:, cfg.world_dim_index[1]]) / cfg.meter_per_pixel
    return np.stack([u, v], -1)


def solid_map(free_binary: np.ndarray, unobserved_binary: np.ndarray) -> np.ndarray:
    """u8 (H, W), 1 where the height band is OBSERVED OCCUPIED (not free and
    not unobserved) — the 2D occluder set for line-of-sight tests."""
    return ((free_binary == 0) & (unobserved_binary == 0)).astype(np.uint8)


def los_blocked(
    solid: np.ndarray,  # u8 (H, W), 1 = occupied (solid_map output)
    uv_a: np.ndarray,  # (2,) float pixel coords (u, v)
    uv_b: np.ndarray,
    trim_px: int = 2,
) -> bool:
    """True iff the straight 2D segment a->b crosses an occupied cell, with a
    `trim_px` disk around each endpoint excluded from the test.

    The trim matters because both endpoints routinely sit ON surfaces: change
    AABBs are observed-depth clouds (their samples lie on walls) and agents
    stand next to obstacles — without it every segment would read blocked by
    its own endpoint's wall. Out-of-grid endpoints return False (visible):
    callers use "blocked" to SKIP work, so unknown must stay conservative."""
    import cv2

    h, w = solid.shape
    a = np.round(np.asarray(uv_a, np.float64)).astype(int)
    b = np.round(np.asarray(uv_b, np.float64)).astype(int)
    for p in (a, b):
        if not (0 <= p[0] < w and 0 <= p[1] < h):
            return False
    mask = np.zeros((h, w), np.uint8)
    cv2.line(mask, tuple(a), tuple(b), 1, 1)
    cv2.circle(mask, tuple(a), int(trim_px), 0, -1)
    cv2.circle(mask, tuple(b), int(trim_px), 0, -1)
    return bool(np.any(mask & solid))


def topdown_to_world(
    uv: np.ndarray, cfg: TopdownConfig, height_value: float
) -> np.ndarray:
    """(2,) pixel -> (3,) world at the given height."""
    out = np.full(3, float(height_value))
    out[cfg.world_dim_index[0]] = uv[0] * cfg.meter_per_pixel + cfg.world_2d_bbox[0][0]
    out[cfg.world_dim_index[1]] = cfg.world_2d_bbox[1][1] - uv[1] * cfg.meter_per_pixel
    return out


def heading_to_topdown(c2w: np.ndarray, cfg: TopdownConfig) -> np.ndarray:
    """Camera forward direction projected into the top-down plane, unit (2,)
    (role of c2w_world_to_topdown's rotation vector, gui_utils.py:188-220)."""
    fwd = np.asarray(c2w)[:3, 2]  # OpenCV camera looks along +z
    du = fwd[cfg.world_dim_index[0]]
    dv = -fwd[cfg.world_dim_index[1]]
    n = np.hypot(du, dv)
    if n < 1e-9:
        return np.array([1.0, 0.0])
    return np.array([du / n, dv / n])


def topdown_camera(cfg: TopdownConfig) -> Camera:
    """Near-orthographic perspective camera CAMERA_HEIGHT above the scene,
    scaled so the ground plane maps 1:1 onto grid pixels."""
    h_axis = cfg.height_axis
    dim_u, dim_v = cfg.world_dim_index
    x_cam = np.zeros(3)
    x_cam[dim_u] = 1.0
    z_cam = np.zeros(3)
    z_cam[h_axis] = -1.0  # looking down
    y_cam = np.cross(z_cam, x_cam)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2] = x_cam, y_cam, z_cam
    pos = np.zeros(3)
    pos[dim_u] = cfg.world_center[0]
    pos[dim_v] = cfg.world_center[1]
    pos[h_axis] = CAMERA_HEIGHT
    c2w[:3, 3] = pos
    w2c = np.linalg.inv(c2w)
    f = CAMERA_HEIGHT / cfg.meter_per_pixel
    intr = np.array(
        [
            [f, 0, cfg.width / 2 - 0.5],
            [0, f, cfg.height / 2 - 0.5],
            [0, 0, 1],
        ]
    )
    return make_camera(
        cfg.width, cfg.height, intr, w2c, near=0.01, far=2 * CAMERA_HEIGHT
    )


def _band_mask(means3d: jnp.ndarray, height_axis: int, foot, head) -> jnp.ndarray:
    h = means3d[:, height_axis]
    return (h >= foot) & (h <= head)


def height_slice_mask(
    buf: GaussianBuffer, cfg: TopdownConfig, foot_adjust: float = 0.0
) -> jnp.ndarray:
    """Active-override mask keeping Gaussians within the agent's body band
    (role of __cut_gaussian_by_height, visualizer.py:2277-2286)."""
    return _band_mask(
        buf.params.means3d,
        cfg.height_axis,
        cfg.agent_foot + foot_adjust,
        cfg.agent_head,
    )


def render_topdown(
    buf: GaussianBuffer,
    cfg: TopdownConfig,
    foot_adjust: float = 0.0,
    chunk: int = 256,
    k_per_tile: int = 256,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (free_map_binary uint8 (H, W), unobserved_map_binary uint8,
    free_opacity float) — the payloads of the get_topdown service
    (visualizer.py:926-976, binarization at :954-955).

    free_map_binary[v, u] = 1 where the height-sliced map's opacity <= 0.4
    (i.e. the agent's body band is unobstructed); unobserved_map_binary = 1
    where *nothing* has ever been mapped (the reference's
    'visible_map_binary': pure-white pixels of a white-bg color render).
    """
    from activesplat_tpu.ops.render import forward_backend

    cam = topdown_camera(cfg)
    backend = forward_backend()
    both_u8, free_alpha = _topdown_binary(
        buf,
        cam,
        jnp.float32(cfg.agent_foot + foot_adjust),
        jnp.float32(cfg.agent_head),
        height_axis=cfg.height_axis,
        chunk=chunk,
        k_per_tile=k_per_tile,
        backend=backend,
    )
    # Binarization (and the height slice) happen ON DEVICE and only one
    # stacked 1-byte/px map pair crosses to host in a single fetch — the f32
    # alpha + rgb images are ~16x the traffic, and transfers + per-call eager
    # dispatch (not the render) dominated the query latency at 1M Gaussians.
    both = np.asarray(both_u8)
    return both[0], both[1], free_alpha


@functools.partial(
    jax.jit, static_argnames=("height_axis", "chunk", "k_per_tile", "backend")
)
def _topdown_binary(
    buf: GaussianBuffer,
    cam: Camera,
    foot: jnp.ndarray,
    head: jnp.ndarray,
    *,
    height_axis: int,
    chunk: int,
    k_per_tile: int,
    backend: str,
):
    """Both topdown renders + height slice + binarization as one device
    program. Returns (stacked (2, H, W) u8 [free, unobserved], free_alpha
    f32 [left on device])."""
    sliced = _band_mask(buf.params.means3d, height_axis, foot, head)
    # exact (uncapped) compositing: truncated opacity would mark traversable
    # space occupied / observed space unobserved for the planner
    free = render_jit(
        buf,
        cam,
        scale_modifier=TOPDOWN_SCALE_MODIFIER,
        chunk=chunk,
        active_override=sliced,
        k_per_tile=k_per_tile,
        backend=backend,
        exact=k_per_tile > 0,
        # the height slice deactivates most of the map: small CSR rungs fit
        exact_ladder=(0.5, 1.0, 2.0),
    )
    full = render_jit(
        buf,
        cam,
        bg=jnp.ones(3),
        scale_modifier=TOPDOWN_SCALE_MODIFIER,
        chunk=chunk,
        k_per_tile=k_per_tile,
        backend=backend,
        exact=k_per_tile > 0,
        # whole-map topdown measures ~2 memberships/Gaussian
        exact_ladder=(1.0, 2.0),
    )
    free_u8 = (free.alpha <= FREE_OPACITY_THRESHOLD).astype(jnp.uint8)
    # uint8 TRUNCATION (the reference's .astype(np.uint8) cast) + grayscale,
    # as the reference compares gray == 255 — rounding would flip faintly
    # observed pixels (rgb ~0.999) back to "unobserved"
    rgb_u8 = jnp.floor(jnp.clip(full.rgb, 0.0, 1.0) * 255.0)
    gray = jnp.round(
        0.299 * rgb_u8[..., 0] + 0.587 * rgb_u8[..., 1] + 0.114 * rgb_u8[..., 2]
    )
    unobs_u8 = (gray == 255.0).astype(jnp.uint8)
    return jnp.stack([free_u8, unobs_u8]), free.alpha


def horizon_bbox_topdown(
    bound_min: np.ndarray, bound_max: np.ndarray, cfg: TopdownConfig
) -> np.ndarray:
    """Axis-aligned pixel bbox of a world-space horizon box
    (get_horizon_bound_topdown, gui_utils.py:338-361)."""
    corners = np.stack([np.asarray(bound_min), np.asarray(bound_max)])
    uv = world_to_topdown(
        np.array(
            [
                [corners[a][0], corners[b][1], corners[c][2]]
                for a in (0, 1)
                for b in (0, 1)
                for c in (0, 1)
            ]
        ),
        cfg,
    )
    return np.stack([uv.min(0), uv.max(0)])
