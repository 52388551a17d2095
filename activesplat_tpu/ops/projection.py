"""EWA projection of 3D Gaussians to screen-space 2D Gaussians.

TPU-native replacement for the preprocess stage of the CUDA
diff-gaussian-rasterization submodule (reference API surface documented in
SURVEY.md section 2.2): world-space means/covariances -> per-Gaussian 2D mean,
inverse 2D covariance (conic), screen radius, camera depth, and a frustum
validity mask. Fully differentiable; everything is dense (C,)-shaped vector
math that XLA fuses into a handful of VPU loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from activesplat_tpu.utils.transforms import quat_to_rotmat

# Geometry must not silently drop to bf16 on the MXU: poses/covariances are
# precision-critical (a bf16 projected mean is off by ~0.2 px).
HIGHEST = jax.lax.Precision.HIGHEST

# Low-pass dilation added to 2D covariances, as in EWA splatting — ensures
# each splat covers at least ~1 pixel (same constant as Inria's rasterizer).
COV2D_DILATION = 0.3


class Projected(NamedTuple):
    mean2d: jnp.ndarray  # (C, 2) pixel coordinates
    conic: jnp.ndarray  # (C, 3) upper-triangular inverse 2D covariance (a, b, c)
    radius: jnp.ndarray  # (C,) 3-sigma screen radius in pixels (0 if culled)
    depth: jnp.ndarray  # (C,) camera-frame z
    valid: jnp.ndarray  # (C,) bool — in front of camera, on screen, active


def project_gaussians(
    means3d: jnp.ndarray,
    quats: jnp.ndarray,
    log_scales: jnp.ndarray,
    active: jnp.ndarray,
    w2c: jnp.ndarray,
    fx: jnp.ndarray,
    fy: jnp.ndarray,
    cx: jnp.ndarray,
    cy: jnp.ndarray,
    width: int,
    height: int,
    near: float = 0.01,
    far: float = 100.0,
    scale_modifier: float = 1.0,
) -> Projected:
    """Project Gaussians into a pinhole camera (OpenCV convention).

    log_scales may be (C, 1) (isotropic) or (C, 3); scale_modifier mirrors the
    reference's GaussianRasterizationSettings.scale_modifier used by the
    top-down free-space query (visualizer.py:936, scale_modifier=0.01).
    """
    # All geometry is explicit elementwise math over (C,)-vectors: batched
    # 3x3 matmuls would pad onto 128x128 MXU tiles (and bf16-quantize under
    # default precision) — the VPU does this in a handful of fused loops.
    rot_w2c = w2c[:3, :3]
    t_w2c = w2c[:3, 3]
    mx, my, mz = means3d[:, 0], means3d[:, 1], means3d[:, 2]
    r = rot_w2c
    x = r[0, 0] * mx + r[0, 1] * my + r[0, 2] * mz + t_w2c[0]
    y = r[1, 0] * mx + r[1, 1] * my + r[1, 2] * mz + t_w2c[1]
    z = r[2, 0] * mx + r[2, 1] * my + r[2, 2] * mz + t_w2c[2]

    in_front = z > near
    zs = jnp.where(in_front, z, 1.0)  # safe z for divisions
    inv_z = 1.0 / zs

    mean_x = fx * x * inv_z + cx
    mean_y = fy * y * inv_z + cy
    mean2d = jnp.stack([mean_x, mean_y], axis=-1)

    # 3D covariance: M M^T with M = R_g diag(S), then the camera-frame
    # congruence V = R M (R M)^T — fused as one elementwise product chain.
    scales = jnp.exp(log_scales) * scale_modifier  # (C, 1|3)
    scales = jnp.broadcast_to(scales, (means3d.shape[0], 3))
    rot_g = quat_to_rotmat(quats)  # (C, 3, 3)
    m = rot_g * scales[:, None, :]  # (C, 3, 3)
    # rows of A = R_w2c @ M, written out with scalar R entries (VPU-friendly)
    a = [
        [
            r[i, 0] * m[:, 0, j] + r[i, 1] * m[:, 1, j] + r[i, 2] * m[:, 2, j]
            for j in range(3)
        ]
        for i in range(3)
    ]

    def dot_rows(i, j):
        return a[i][0] * a[j][0] + a[i][1] * a[j][1] + a[i][2] * a[j][2]

    cov_cam = {
        (0, 0): dot_rows(0, 0),
        (0, 1): dot_rows(0, 1),
        (0, 2): dot_rows(0, 2),
        (1, 1): dot_rows(1, 1),
        (1, 2): dot_rows(1, 2),
        (2, 2): dot_rows(2, 2),
    }

    # EWA Jacobian with the standard frustum clamp of the tangent coordinates
    # (limits splat stretching at image borders).
    tan_fov_x = 0.5 * width / fx
    tan_fov_y = 0.5 * height / fy
    lim_x = 1.3 * tan_fov_x
    lim_y = 1.3 * tan_fov_y
    tx = jnp.clip(x * inv_z, -lim_x, lim_x) * zs
    ty = jnp.clip(y * inv_z, -lim_y, lim_y) * zs

    j00 = fx * inv_z
    j02 = -fx * tx * inv_z * inv_z
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z * inv_z

    # cov2d = J cov_cam J^T, J = [[j00, 0, j02], [0, j11, j12]]
    c00, c01, c02 = cov_cam[(0, 0)], cov_cam[(0, 1)], cov_cam[(0, 2)]
    c11, c12, c22 = cov_cam[(1, 1)], cov_cam[(1, 2)], cov_cam[(2, 2)]
    a = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22) + COV2D_DILATION
    b = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    c = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22) + COV2D_DILATION

    det = a * c - b * b
    det_ok = det > 1e-12
    det_safe = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    # 3-sigma screen radius from the larger covariance eigenvalue.
    mid = 0.5 * (a + c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    on_screen = (
        (mean_x + radius > 0)
        & (mean_x - radius < width)
        & (mean_y + radius > 0)
        & (mean_y - radius < height)
    )
    valid = active & in_front & (z < far) & det_ok & on_screen
    radius = jnp.where(valid, radius, 0.0)

    return Projected(mean2d=mean2d, conic=conic, radius=radius, depth=z, valid=valid)


def adaptive_cull_radius(
    radius: jnp.ndarray, valid: jnp.ndarray, opacity: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Opacity-adaptive tile-cull radius (AdR-Gaussian, arXiv 2409.08669) —
    LOSSLESS under this rasterizer's per-pixel cutoff.

    Every blend zeroes contributions with alpha < 1/255 (ALPHA_MIN, CUDA
    parity), and alpha at screen distance d from the center is at most
    opacity * exp(-d^2 / (2*lambda1)). Beyond
        r_eff = sqrt(2 * ln(255 * opacity)) * sigma      (sigma = radius / 3)
    that bound drops below the cutoff, so tile memberships outside the
    r_eff AABB contribute exactly nothing — to the image, the silhouette,
    or any gradient (the blends gate grads on alpha > 0). Culling them
    shrinks bin/CSR membership counts for weakly-opaque Gaussians (freshly
    densified or decayed splats; the 3-sigma box only binds at
    opacity >= ~0.04). Splats with opacity <= 1/255 are invisible
    everywhere and are culled outright.

    Returns (radius_eff, valid_eff) for BINNING ONLY — callers must keep the
    original 3-sigma radius for densification bookkeeping
    (RenderOutput.radii / max_2D_radius parity). Inputs are detached: the
    bin consumes indices, so no gradient may flow through the cull.
    """
    sg = jax.lax.stop_gradient
    radius, opacity = sg(radius), sg(opacity)
    ln = jnp.log(jnp.maximum(255.0 * opacity, 1e-20))
    r_eff = jnp.sqrt(jnp.maximum(2.0 * ln, 0.0)) * (radius / 3.0)
    visible = opacity > (1.0 / 255.0)
    return (
        jnp.where(visible, jnp.minimum(radius, r_eff), 0.0),
        valid & visible,
    )
