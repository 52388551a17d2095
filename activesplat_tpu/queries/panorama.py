"""Panoramic (360 deg) invisibility queries for exploration scoring.

Reference behavior (get_global_invisibility / get_local_invisibility,
src/mapper/splatam/__init__.py:697-838): three 120deg-HFOV x 150deg-VFOV
renders (120x150 px — 1 px per degree) stitched into a panorama; invisibility
= 1 - composited opacity; global queries score hole volumes via
DBSCAN+ConvexHull; local queries propose a reorientation toward the largest
invisible cluster.

TPU-first redesign: all views (3 per node x N nodes) are rendered in ONE
batched (vmapped) device call instead of the reference's sequential
2-passes-per-view CUDA loop.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from activesplat_tpu.models.gaussians import GaussianBuffer, make_camera
from activesplat_tpu.ops.render import render
from activesplat_tpu.queries.clusters import (
    get_convexhull_volume,
    get_invisibility_clusters,
)
from activesplat_tpu.utils.transforms import compute_intrinsics, rot_axis

PANO_HFOV_DEG = 120.0
PANO_VFOV_DEG = 150.0
PANO_WIDTH = 120  # at scale 1.0: 1 px == 1 degree (splatam/__init__.py:711)
PANO_HEIGHT = 150
PANO_VIEWS = 3  # 360 / PANO_HFOV


def pano_dims(scale: float = 1.0):
    return int(round(PANO_WIDTH * scale)), int(round(PANO_HEIGHT * scale))


def _pano_camera_template(scale: float = 1.0):
    width, height = pano_dims(scale)
    fx, fy, cx, cy = compute_intrinsics(
        width, height, np.deg2rad(PANO_HFOV_DEG), np.deg2rad(PANO_VFOV_DEG)
    )
    intr = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
    return make_camera(width, height, intr, np.eye(4), near=0.01, far=100.0)


def _views_impl(buf: GaussianBuffer, w2cs: jnp.ndarray, chunk: int, scale: float):
    from activesplat_tpu.ops.render import forward_backend

    cam = _pano_camera_template(scale)
    backend = forward_backend()

    def one(w2c):
        out = render(
            buf,
            dataclasses.replace(cam, w2c=w2c),
            chunk=chunk,
            k_per_tile=256 if backend == "pallas" else 0,
            backend=backend,
            # uncapped alpha: a truncated panorama reads invisibility high,
            # which would keep the planner revisiting already-mapped space
            exact=backend == "pallas",
            # 120deg views frustum-cull ~2/3 of the map and carry ~1-tile
            # spans: true membership totals sit near 0.5N, so offer small
            # CSR budget rungs (each entry-sized op costs O(rung))
            exact_ladder=(0.5, 1.0, 2.0),
        )
        return out.rgb, out.depth, out.alpha

    # lax.map, not vmap: views on one device render sequentially either way,
    # map compiles the body once, and the exact CSR raster (a pallas_call
    # with prefetched index maps) composes with scan but not with batching
    return jax.lax.map(one, w2cs)


@functools.partial(jax.jit, static_argnames=("chunk", "scale"))
def _render_views(
    buf: GaussianBuffer, w2cs: jnp.ndarray, chunk: int = 256, scale: float = 1.0
):
    """Batched render of (M, 4, 4) w2cs -> stacked (M, H, W) outputs."""
    return _views_impl(buf, w2cs, chunk, scale)


@functools.partial(jax.jit, static_argnames=("chunk", "scale", "mesh"))
def _render_views_quantized(
    buf: GaussianBuffer,
    w2cs: jnp.ndarray,
    chunk: int = 256,
    scale: float = 1.0,
    mesh=None,
):
    """_render_views with on-device quantization of the score inputs:
    depth as uint16 millimeters (the dataset-dump precision, io/manifest),
    alpha as uint8 /255. Hole scoring thresholds invisibility at 0.3/0.8, so
    1/255 quantization is far below its sensitivity — and the host transfer
    shrinks 2.7x, which dominates the query latency on large maps.

    `mesh` shards the VIEW axis over the devices (panorama queries are
    embarrassingly parallel across look directions — each device projects +
    renders its own views against the replicated buffer, outputs
    all_gathered); len(w2cs) must divide by the mesh size."""
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        def shard(buf_rep, w2cs_local):
            _, depth, alpha = _views_impl(buf_rep, w2cs_local, chunk, scale)
            return (
                jax.lax.all_gather(depth, "px", tiled=True),
                jax.lax.all_gather(alpha, "px", tiled=True),
            )

        depth, alpha = jax.shard_map(
            shard,
            mesh=mesh,
            in_specs=(P(), P("px")),
            out_specs=(P(), P()),
            check_vma=False,
        )(buf, w2cs)
    else:
        _, depth, alpha = _views_impl(buf, w2cs, chunk, scale)
    depth_mm = jnp.clip(jnp.round(depth * 1000.0), 0, 65535).astype(jnp.uint16)
    alpha_u8 = jnp.round(jnp.clip(alpha, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    return depth_mm, alpha_u8


from activesplat_tpu.utils.tracing import counted_jit as _counted_jit

_render_views = _counted_jit(_render_views)
_render_views_quantized = _counted_jit(_render_views_quantized)


def pano_view_poses(view_c2w: np.ndarray) -> np.ndarray:
    """The 3 look-around c2ws: successive 120-deg rotations about the
    camera's own vertical axis (splatam/__init__.py:716-717)."""
    return np.stack(
        [
            rot_axis(view_c2w, "y", np.deg2rad(PANO_HFOV_DEG * i))
            for i in range(PANO_VIEWS)
        ]
    )


def render_panorama(
    buf: GaussianBuffer, view_c2w: np.ndarray, chunk: int = 256, scale: float = 1.0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One 360-deg panorama: returns (rgb (H, 3W, 3), depth (H, 3W),
    invisibility (H, 3W))."""
    poses = pano_view_poses(view_c2w)
    w2cs = jnp.asarray(np.linalg.inv(poses), jnp.float32)
    rgb, depth, alpha = _render_views(buf, w2cs, chunk, scale)
    rgb = np.concatenate(np.asarray(rgb), axis=1)
    depth = np.concatenate(np.asarray(depth), axis=1)
    invis = 1.0 - np.concatenate(np.asarray(alpha), axis=1)
    return rgb, depth, invis


ALPHA_SOLID = 0.7  # pano pixel counts as converged surface above this


def global_invisibility(
    buf: GaussianBuffer,
    view_c2w: np.ndarray,
    node_positions: np.ndarray,  # (N, 3) world positions (height from view)
    chunk: int = 256,
    scale: float = 1.0,
    mesh=None,
) -> List[Tuple[float, float, float]]:
    """Per-node (sum_invisibility, hole_volume, reach) scores. All N x 3
    views render in a single batched device call; hole scoring (DBSCAN +
    ConvexHull) runs on host over the tiny panoramas (get_global_invisibility
    semantics, splatam/__init__.py:697-759: node position replaces the
    camera's horizontal position, height/orientation kept from the current
    frame).

    `reach` is the cache-invalidation radius for this node's score: the max
    rendered depth over pixels whose alpha >= ALPHA_SOLID, or +inf when any
    pixel is still a hole (alpha below it) — content appearing at ANY
    distance through a hole can change the score, while a fully solid
    panorama can only be affected by map changes within its visible depth."""
    node_positions = np.asarray(node_positions, np.float64).reshape(-1, 3)
    n = len(node_positions)
    if n == 0:
        return []
    all_poses = []
    skip = np.zeros(n, bool)
    for i, pos in enumerate(node_positions):
        if np.all(pos == 0):
            skip[i] = True
            all_poses.append(np.stack([np.eye(4)] * PANO_VIEWS))
            continue
        c2w = view_c2w.copy()
        c2w[0, 3] = pos[0]
        c2w[2, 3] = pos[2]  # keep agent camera height (splatam/__init__.py:703-704)
        all_poses.append(pano_view_poses(c2w))
    w2cs_np = np.linalg.inv(np.concatenate(all_poses, 0))  # (N*3, 4, 4)
    # Render in fixed-size view chunks: per-view projection intermediates
    # scale with buffer capacity, so an unbounded vmap over all nodes' views
    # would exhaust HBM on large maps. 12 views/call bounds peak memory while
    # keeping one compiled variant.
    m = len(w2cs_np)
    view_chunk = 12
    if mesh is not None:  # each device takes an equal share of the chunk
        view_chunk = -(-view_chunk // mesh.shape["px"]) * mesh.shape["px"]
    padded = -(-m // view_chunk) * view_chunk
    if padded != m:
        w2cs_np = np.concatenate(
            [w2cs_np, np.tile(np.eye(4), (padded - m, 1, 1))], 0
        )
    width, height = pano_dims(scale)
    depth_parts, alpha_parts = [], []
    from activesplat_tpu.utils.relay import with_retry

    for start in range(0, padded, view_chunk):

        def run(start=start):
            d_c, a_c = _render_views_quantized(
                buf,
                jnp.asarray(w2cs_np[start : start + view_chunk], jnp.float32),
                chunk,
                scale,
                mesh,
            )
            from activesplat_tpu.utils.tracing import fetch as tfetch

            return tfetch(d_c), tfetch(a_c)

        d_np, a_np = with_retry(run, desc="queries/panorama fetch")
        depth_parts.append(d_np)
        alpha_parts.append(a_np)
    depth = (
        np.concatenate(depth_parts, 0)[:m]
        .reshape(n, PANO_VIEWS, height, width)
        .astype(np.float64)
        / 1000.0
    )
    alpha = (
        np.concatenate(alpha_parts, 0)[:m]
        .reshape(n, PANO_VIEWS, height, width)
        .astype(np.float64)
        / 255.0
    )

    results = []
    for i in range(n):
        if skip[i]:
            results.append((0.0, 0.0, 0.0))
            continue
        pano_depth = np.concatenate(depth[i], axis=1)
        pano_alpha = np.concatenate(alpha[i], axis=1)
        pano_invis = 1.0 - pano_alpha
        inv_sum, volume = get_convexhull_volume(
            pano_depth, pano_invis, vfov_deg=PANO_VFOV_DEG
        )
        solid = pano_alpha >= ALPHA_SOLID
        reach = float(pano_depth.max()) if solid.all() else float("inf")
        results.append((float(inv_sum), float(volume), reach))
    return results


def local_invisibility(
    buf: GaussianBuffer,
    view_c2w: np.ndarray,
    cluster_invisibility_threshold: float = 25.0,
    chunk: int = 256,
    scale: float = 1.0,
    mesh=None,
) -> Tuple[float, Optional[np.ndarray], np.ndarray]:
    """Local refinement query: returns (sum_invisibility, best reorientation
    c2w or None, invisibility panorama). A reorientation toward the largest
    invisible cluster is proposed when its direction is > 15 deg off-center
    (get_local_invisibility, splatam/__init__.py:761-838)."""
    # lean transfer: only the alpha panorama crosses to host (u8; the rgb
    # and depth channels of render_panorama are unused here)
    poses = pano_view_poses(view_c2w)
    w2cs_np = np.linalg.inv(poses)
    if mesh is not None:  # pad the 3 views up to a device multiple
        d = mesh.shape["px"]
        pad = -(-PANO_VIEWS // d) * d - PANO_VIEWS
        if pad:
            w2cs_np = np.concatenate([w2cs_np, np.tile(np.eye(4), (pad, 1, 1))], 0)
    _, alpha_u8 = _render_views_quantized(
        buf, jnp.asarray(w2cs_np, jnp.float32), chunk, scale, mesh
    )
    from activesplat_tpu.utils.tracing import fetch as tfetch

    invis = (
        1.0 - np.concatenate(tfetch(alpha_u8)[:PANO_VIEWS], axis=1) / 255.0
    )
    sum_invis = float(np.sum(invis))
    best_pose = None
    if sum_invis > 100.0 * scale * scale:
        # 0.5x downsample before clustering (splatam/__init__.py:810-813)
        factor = 0.5
        small = cv2.resize(
            invis,
            (int(invis.shape[1] * factor), int(invis.shape[0] * factor)),
            interpolation=cv2.INTER_AREA,
        )
        centers, sums = get_invisibility_clusters(
            small, cluster_invisibility_threshold
        )
        if sums:
            c = centers[int(np.argmax(sums))]
            # pixel offsets from the FIRST view's center (= current heading),
            # 1 px == 1 degree (splatam/__init__.py:821-823 uses the single
            # view's width/height as the reference frame)
            du = c[1] / factor - invis.shape[1] / PANO_VIEWS / 2
            dv = c[0] / factor - invis.shape[0] / 2
            # 1 px == 1/scale degrees
            h_angle = np.deg2rad(du / scale)
            v_angle = np.deg2rad(dv / scale)
            if abs(h_angle) > np.deg2rad(15) or abs(v_angle) > np.deg2rad(15):
                best_pose = rot_axis(view_c2w, "y", h_angle)
                best_pose = rot_axis(best_pose, "x", v_angle)
    return sum_invis, best_pose, invis
