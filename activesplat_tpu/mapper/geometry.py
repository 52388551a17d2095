"""Backprojection and Gaussian-initialization geometry (device-side)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from activesplat_tpu.models.gaussians import GaussianParams


def backproject(
    depth: jnp.ndarray,  # (H, W)
    fx,
    fy,
    cx,
    cy,
    c2w: jnp.ndarray,  # (4, 4) OpenCV
) -> jnp.ndarray:
    """Pixel grid + z-depth -> (H*W, 3) world points (splatam.py:25-51
    semantics: OpenCV pinhole, z-depth)."""
    h, w = depth.shape
    us = jnp.arange(w, dtype=depth.dtype)[None, :]
    vs = jnp.arange(h, dtype=depth.dtype)[:, None]
    x = (us - cx) / fx * depth
    y = (vs - cy) / fy * depth
    pts_cam = jnp.stack([x, y, depth], axis=-1).reshape(-1, 3)
    return (
        jnp.einsum(
            "nj,ij->ni", pts_cam, c2w[:3, :3], precision=jax.lax.Precision.HIGHEST
        )
        + c2w[:3, 3]
    )


def projective_scale(depth_flat: jnp.ndarray, fx, fy) -> jnp.ndarray:
    """Initial per-Gaussian scale from projected pixel size
    ("projective" mean-sq-dist method, splatam.py:54-58): a point at depth z
    covers ~z/f meters per pixel."""
    return depth_flat / ((fx + fy) / 2.0)


def gaussians_from_rgbd(
    rgb: jnp.ndarray,  # (H, W, 3)
    depth: jnp.ndarray,  # (H, W)
    fx,
    fy,
    cx,
    cy,
    c2w: jnp.ndarray,
    isotropic: bool = False,
) -> Tuple[GaussianParams, jnp.ndarray]:
    """Candidate Gaussians from every valid-depth pixel
    (initialize_params / initialize_new_params semantics, splatam.py:78-115:
    identity rotations, logit-0 opacities, log-scale = log(projected pixel
    size)). Returns (params, valid_mask)."""
    pts = backproject(depth, fx, fy, cx, cy, c2w)
    n = pts.shape[0]
    depth_flat = depth.reshape(-1)
    valid = depth_flat > 0
    scale = projective_scale(depth_flat, fx, fy)
    log_scale = jnp.log(jnp.maximum(scale, 1e-10))
    scale_dim = 1 if isotropic else 3
    params = GaussianParams(
        means3d=pts,
        rgb=rgb.reshape(-1, 3),
        quats=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0], pts.dtype), (n, 1)),
        logit_opacities=jnp.zeros((n,), pts.dtype),
        log_scales=jnp.tile(log_scale[:, None], (1, scale_dim)),
    )
    return params, valid
