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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from activesplat_tpu.models.gaussians import Camera, GaussianBuffer, make_camera
from activesplat_tpu.ops.render import render_jit
from activesplat_tpu.utils.tracing import fetch as tfetch
from activesplat_tpu.utils.tracing import stage

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

    from activesplat_tpu.utils.relay import with_retry

    cam = topdown_camera(cfg)
    backend = forward_backend()
    rect = jnp.array([0, 0, cfg.width, cfg.height], jnp.int32)

    def run():
        both_u8, free_alpha = _topdown_dual(
            buf,
            cam,
            jnp.float32(cfg.agent_foot + foot_adjust),
            jnp.float32(cfg.agent_head),
            rect,
            height_axis=cfg.height_axis,
            k_per_tile=k_per_tile,
            backend=backend,
        )
        # Binarization (and the height slice) happen ON DEVICE and only one
        # stacked 1-byte/px map pair crosses to host in a single fetch — the
        # f32 alpha + rgb images are ~16x the traffic, and transfers +
        # per-call eager dispatch (not the render) dominated the query
        # latency at 1M Gaussians.
        return tfetch(both_u8), free_alpha

    both, free_alpha = with_retry(run, desc="queries/topdown fetch")
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


from activesplat_tpu.utils.tracing import counted_jit as _counted_jit

_topdown_binary = _counted_jit(_topdown_binary)


@functools.partial(
    jax.jit, static_argnames=("height_axis", "k_per_tile", "backend")
)
def _topdown_dual(
    buf: GaussianBuffer,
    cam: Camera,
    foot: jnp.ndarray,
    head: jnp.ndarray,
    rect: jnp.ndarray,  # (4,) int32 [u0, v0, w, h] tile-aligned pixel window
    *,
    height_axis: int,
    k_per_tile: int,
    backend: str,
):
    """ONE device program for every topdown refresh: both maps from a single
    dual-transmittance CSR walk (rasterize_tiled_exact band mode), optionally
    restricted to the tile-aligned pixel window `rect` — which is TRACED, so
    the full grid, capacity-growth re-renders and every incremental window
    shape all reuse one executable per capacity bucket.

    Replaces the _topdown_binary pair + per-window-size cameras: that design
    compiled 3 programs per capacity bucket (full pair + one per window
    ladder rung), each holding TWO CSR expansions x 3-4 budget rungs + two
    multipass fallbacks — 44-54 MB serialized apiece — and the compile/
    cache-load of that program set was ~80% of the largest stage of the r05
    headline episode (904.6 s, steady-state only ~190 s). The window is
    enforced as a Gaussian CULL (AABB-vs-window-tiles, the binning's own
    tile_aabbs predicate +0.5 px quantization slack), so window pixels
    composite exactly the full render's entry runs; pixels outside `rect`
    are garbage and callers composite only the window region.

    Returns (stacked (2, H, W) u8 [free, unobserved], free_alpha f32 (H, W)
    [left on device]). Reference semantics: visualizer.py:926-976,
    binarization at :954-955."""
    from activesplat_tpu.ops.projection import (
        adaptive_cull_radius,
        project_gaussians,
    )
    from activesplat_tpu.ops.raster_tiled import (
        TILE as BIN_TILE,
        rasterize_tiled,
        rasterize_tiled_exact,
        tile_aabbs,
    )

    params = buf.params
    proj = project_gaussians(
        params.means3d,
        params.quats,
        params.log_scales,
        buf.active,
        cam.w2c,
        cam.fx,
        cam.fy,
        cam.cx,
        cam.cy,
        cam.width,
        cam.height,
        near=cam.near,
        far=cam.far,
        scale_modifier=TOPDOWN_SCALE_MODIFIER,
    )
    opac = jax.nn.sigmoid(params.logit_opacities)
    band = _band_mask(params.means3d, height_axis, foot, head)
    bin_radius, bin_valid = adaptive_cull_radius(proj.radius, proj.valid, opac)

    tiles_x = -(-cam.width // BIN_TILE)
    tiles_y = -(-cam.height // BIN_TILE)
    # window cull: the binning's own AABB predicate (+0.5 px slack covering
    # the sort-pack's 1/16 px mean quantization and +2/16 px radius dilation)
    # against the window's tile rect — keeps exactly the Gaussians whose
    # entries any window tile would receive from the full render
    _, tx0, tx1, ty0, ty1 = tile_aabbs(
        proj.mean2d[:, 0], proj.mean2d[:, 1], bin_radius + 0.5, bin_valid,
        tiles_x, tiles_y,
    )
    tu0 = rect[0] // BIN_TILE
    tu1 = (rect[0] + rect[2] - 1) // BIN_TILE
    tv0 = rect[1] // BIN_TILE
    tv1 = (rect[1] + rect[3] - 1) // BIN_TILE
    keep = (tx0 <= tu1) & (tx1 >= tu0) & (ty0 <= tv1) & (ty1 >= tv0)
    masked_valid = bin_valid & keep

    interpret = jax.default_backend() != "tpu"
    accum, logt, logt2, dropped = rasterize_tiled_exact(
        proj.mean2d,
        proj.conic,
        opac,
        params.rgb,
        masked_valid,
        bin_radius,
        proj.depth,
        band,
        width=cam.width,
        height=cam.height,
        # whole-map topdown measures ~2 memberships/Gaussian; windows fit 1N
        ladder=(1.0, 2.0),
        interpret=interpret,
    )

    # entry-budget overflow: provably-exact bounded multipass pair (the free
    # map via band-masked opacities — zeroed alphas composite identically to
    # exclusion, and the bounded walk visits every membership)
    k = max(int(k_per_tile), 1)
    exact_passes = -(-proj.mean2d.shape[0] // k)

    def _multipass(_):
        a_full, l_full, _ = rasterize_tiled(
            proj.mean2d, proj.conic, opac, params.rgb, masked_valid,
            bin_radius, proj.depth, width=cam.width, height=cam.height,
            k_per_tile=k, backend=backend, max_passes=exact_passes,
        )
        _, l_band, _ = rasterize_tiled(
            proj.mean2d, proj.conic, opac * band, params.rgb, masked_valid,
            bin_radius, proj.depth, width=cam.width, height=cam.height,
            k_per_tile=k, backend=backend, max_passes=exact_passes,
        )
        return a_full, l_full, l_band

    accum, logt, logt2 = jax.lax.cond(
        dropped > 0, _multipass, lambda _: (accum, logt, logt2), None
    )

    hw = (cam.height, cam.width)
    free_alpha = (1.0 - jnp.exp(logt2)).reshape(hw)
    free_u8 = (free_alpha <= FREE_OPACITY_THRESHOLD).astype(jnp.uint8)
    # white background + uint8 TRUNCATION (the reference's .astype(np.uint8)
    # cast); the reference compares gray == 255 — rounding would flip faintly
    # observed pixels (rgb ~0.999) back to "unobserved"
    rgb_img = accum[:, :3] + jnp.exp(logt)[:, None]
    rgb_u8 = jnp.floor(jnp.clip(rgb_img, 0.0, 1.0) * 255.0).reshape(hw + (3,))
    gray = jnp.round(
        0.299 * rgb_u8[..., 0] + 0.587 * rgb_u8[..., 1] + 0.114 * rgb_u8[..., 2]
    )
    unobs_u8 = (gray == 255.0).astype(jnp.uint8)
    return jnp.stack([free_u8, unobs_u8]), free_alpha


_topdown_dual = _counted_jit(_topdown_dual)


@jax.jit
def _changed_bbox(params, active, snap_params, snap_active, modifier):
    """Exact changed-set bound vs a parameter snapshot.

    Returns one packed (7,) f32 array [count, lo_xyz, hi_xyz]: the number of
    Gaussians whose parameters (or active bit) differ from the snapshot, and
    the world AABB covering the union of their OLD and NEW footprints
    (means +- 3*sigma*modifier). Exactness rests on the mapper's
    fresh-optimizer-per-event semantics (mapper/step.py:261): a Gaussian with
    zero gradient through every iteration of an event is bit-identical
    afterwards, so `!=` finds precisely the set the event touched."""

    def leaf_neq(a, b):
        d = a != b
        return jnp.any(d, axis=-1) if d.ndim > 1 else d

    differs = jnp.zeros(active.shape, bool)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(snap_params)):
        differs = differs | leaf_neq(a, b)
    changed = (active & snap_active & differs) | (active ^ snap_active)
    count = jnp.sum(changed.astype(jnp.float32))

    def footprint(p, use):
        ext = 3.0 * jnp.exp(p.log_scales).max(-1, keepdims=True) * modifier
        lo = jnp.where(use[:, None], p.means3d - ext, jnp.inf).min(0)
        hi = jnp.where(use[:, None], p.means3d + ext, -jnp.inf).max(0)
        return lo, hi

    lo_n, hi_n = footprint(params, changed & active)
    lo_o, hi_o = footprint(snap_params, changed & snap_active)
    return jnp.concatenate(
        [count[None], jnp.minimum(lo_n, lo_o), jnp.maximum(hi_n, hi_o)]
    )


_changed_bbox = _counted_jit(_changed_bbox)


class IncrementalTopdown:
    """Top-down map cache with windowed incremental re-renders.

    The planner polls get_topdown every navigation tick; the reference
    re-renders the full grid whenever the map changed (2 of every 5 frames
    under the benchmark schedule), which made `queries/topdown` the largest
    stage of the r04/r05 headline episodes. Each mapping event only touches
    a local set of Gaussians, found EXACTLY by diffing params against a
    snapshot taken at the last render (`_changed_bbox`). The changed box
    (old+new footprints, padded for screen-space dilation) is tile-aligned
    and re-rendered through `_topdown_dual`'s TRACED window rect — one
    executable per capacity bucket serves the full grid and every window
    shape (the previous per-window-size camera programs were 44-54 MB of
    serialized executable EACH, and their compile/cache-load dominated the
    stage; see _topdown_dual). The window region is composited into the
    cached maps; capacity growth and whole-grid boxes render the full rect
    through the same program.

    Reference semantics being reproduced: visualizer.py:926-976 (full-grid
    re-render per GaussianPacket).
    """

    # screen-space safety pad (px): EWA low-pass dilation + principal-point
    # rounding; the projection adds <=2 px of radius, 8 is generous
    MARGIN_PX = 8

    def __init__(
        self,
        cfg: TopdownConfig,
        k_per_tile: int = 256,
    ) -> None:
        self.cfg = cfg
        self.k_per_tile = int(k_per_tile)
        self._snap = None  # (params, active) pytree refs at last render
        self._maps: Optional[Tuple[np.ndarray, np.ndarray]] = None
        # full_first/full_growth/full_oversize decompose "full"; the sub-stage
        # timers (queries/topdown/{diff,full,window}) decompose the wall clock
        self.stats = {
            "full": 0, "window": 0, "clean": 0,
            "full_first": 0, "full_growth": 0, "full_oversize": 0,
        }

    def _render_rect(self, buf: GaussianBuffer, foot_adjust: float,
                     u0: int, v0: int, w: int, h: int) -> np.ndarray:
        """Run the dual program on [u0:u0+w, v0:v0+h] and fetch the u8 pair
        (full-grid arrays; only the rect region is valid)."""
        from activesplat_tpu.ops.render import forward_backend

        from activesplat_tpu.utils.relay import with_retry

        cam = topdown_camera(self.cfg)
        rect = np.array([u0, v0, w, h], np.int32)

        def run():
            both_u8, _ = _topdown_dual(
                buf, cam,
                jnp.float32(self.cfg.agent_foot + foot_adjust),
                jnp.float32(self.cfg.agent_head),
                rect,
                height_axis=self.cfg.height_axis,
                k_per_tile=self.k_per_tile,
                backend=forward_backend(),
            )
            return tfetch(both_u8)

        return with_retry(run, desc="queries/topdown fetch")

    def _full(self, buf: GaussianBuffer, foot_adjust: float, chunk: int,
              reason: str = "full_oversize"):
        with stage("queries/topdown/full"):
            both = self._render_rect(
                buf, foot_adjust, 0, 0, self.cfg.width, self.cfg.height
            )
        self._maps = (both[0], both[1])
        self._snap = (buf.params, buf.active)
        self.stats["full"] += 1
        self.stats[reason] += 1
        return self._maps

    def refresh(
        self, buf: GaussianBuffer, foot_adjust: float = 0.0, chunk: int = 256
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Return up-to-date (free_binary, unobserved_binary) u8 maps."""
        if self._snap is None:
            return self._full(buf, foot_adjust, chunk, reason="full_first")
        if self._snap[0].capacity != buf.capacity:
            return self._full(buf, foot_adjust, chunk, reason="full_growth")
        with stage("queries/topdown/diff"):
            packed = tfetch(
                _changed_bbox(
                    buf.params, buf.active, self._snap[0], self._snap[1],
                    jnp.float32(TOPDOWN_SCALE_MODIFIER),
                )
            )
        if packed[0] == 0:
            self.stats["clean"] += 1
            return self._maps
        box = packed[1:].reshape(2, 3)
        # project the changed box's 2D footprint to a pixel bbox
        du, dv = self.cfg.world_dim_index
        corners = np.zeros((2, 3))
        corners[:, du] = (box[0, du], box[1, du])
        corners[:, dv] = (box[0, dv], box[1, dv])
        uv = world_to_topdown(corners, self.cfg)
        lo = np.floor(uv.min(0)) - self.MARGIN_PX
        hi = np.ceil(uv.max(0)) + self.MARGIN_PX
        W, H = self.cfg.width, self.cfg.height
        # tile-align (the window cull keeps whole tiles) and clip to the grid
        t = 16
        u0 = int(np.clip(np.floor(lo[0] / t) * t, 0, W))
        v0 = int(np.clip(np.floor(lo[1] / t) * t, 0, H))
        u1 = int(np.clip(np.ceil((hi[0] + 1) / t) * t, 0, W))
        v1 = int(np.clip(np.ceil((hi[1] + 1) / t) * t, 0, H))
        if u1 <= u0 or v1 <= v0:
            self.stats["clean"] += 1
            return self._maps
        if (u1 - u0) * (v1 - v0) >= W * H:
            return self._full(buf, foot_adjust, chunk)
        with stage("queries/topdown/window"):
            both = self._render_rect(
                buf, foot_adjust, u0, v0, u1 - u0, v1 - v0
            )
        free = self._maps[0].copy()
        unobs = self._maps[1].copy()
        free[v0:v1, u0:u1] = both[0][v0:v1, u0:u1]
        unobs[v0:v1, u0:u1] = both[1][v0:v1, u0:u1]
        self._maps = (free, unobs)
        self._snap = (buf.params, buf.active)
        self.stats["window"] += 1
        return free, unobs


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
