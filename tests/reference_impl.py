"""Slow, independent numpy implementations used as test oracles.

These deliberately mirror the *mathematical definition* of EWA splatting with
sequential front-to-back blending (per-pixel python/numpy loops), so the
vectorized XLA/Pallas renderers are validated against an implementation with
no shared code or structure.
"""

import numpy as np

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


def quat_to_rotmat_np(q):
    q = np.asarray(q, dtype=np.float64)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rot = np.empty(q.shape[:-1] + (3, 3))
    rot[..., 0, 0] = 1 - 2 * (y * y + z * z)
    rot[..., 0, 1] = 2 * (x * y - w * z)
    rot[..., 0, 2] = 2 * (x * z + w * y)
    rot[..., 1, 0] = 2 * (x * y + w * z)
    rot[..., 1, 1] = 1 - 2 * (x * x + z * z)
    rot[..., 1, 2] = 2 * (y * z - w * x)
    rot[..., 2, 0] = 2 * (x * z - w * y)
    rot[..., 2, 1] = 2 * (y * z + w * x)
    rot[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return rot


def render_reference(
    means3d,
    rgb,
    quats,
    logit_opacities,
    log_scales,
    active,
    w2c,
    fx,
    fy,
    cx,
    cy,
    width,
    height,
    near=0.01,
    far=100.0,
    scale_modifier=1.0,
    bg=(0.0, 0.0, 0.0),
):
    """Per-pixel sequential front-to-back EWA splatting (numpy, O(N*P))."""
    n = means3d.shape[0]
    p_cam = means3d @ w2c[:3, :3].T + w2c[:3, 3]
    z = p_cam[:, 2]

    tan_x, tan_y = 0.5 * width / fx, 0.5 * height / fy
    lim_x, lim_y = 1.3 * tan_x, 1.3 * tan_y

    mean2d = np.zeros((n, 2))
    conic = np.zeros((n, 3))
    radius = np.zeros(n)
    valid = np.zeros(n, dtype=bool)

    scales = np.exp(log_scales) * scale_modifier
    if scales.shape[1] == 1:
        scales = np.tile(scales, (1, 3))
    rot_g = quat_to_rotmat_np(quats)

    for i in range(n):
        if not active[i] or z[i] <= near or z[i] >= far:
            continue
        x, y, zz = p_cam[i]
        mean2d[i] = [fx * x / zz + cx, fy * y / zz + cy]
        m = rot_g[i] * scales[i][None, :]
        cov3d = m @ m.T
        cov_cam = w2c[:3, :3] @ cov3d @ w2c[:3, :3].T
        tx = np.clip(x / zz, -lim_x, lim_x) * zz
        ty = np.clip(y / zz, -lim_y, lim_y) * zz
        jac = np.array(
            [
                [fx / zz, 0, -fx * tx / zz**2],
                [0, fy / zz, -fy * ty / zz**2],
            ]
        )
        cov2d = jac @ cov_cam @ jac.T + 0.3 * np.eye(2)
        det = np.linalg.det(cov2d)
        if det <= 1e-12:
            continue
        inv = np.linalg.inv(cov2d)
        conic[i] = [inv[0, 0], inv[0, 1], inv[1, 1]]
        mid = 0.5 * (cov2d[0, 0] + cov2d[1, 1])
        lam = mid + np.sqrt(max(0.1, mid * mid - det))
        radius[i] = np.ceil(3.0 * np.sqrt(lam))
        mx, my = mean2d[i]
        if (
            mx + radius[i] <= 0
            or mx - radius[i] >= width
            or my + radius[i] <= 0
            or my - radius[i] >= height
        ):
            continue
        valid[i] = True
    radius = np.where(valid, radius, 0.0)

    order = np.argsort(np.where(valid, z, np.inf), kind="stable")
    opac = 1.0 / (1.0 + np.exp(-logit_opacities))

    out_rgb = np.zeros((height, width, 3))
    out_depth = np.zeros((height, width))
    out_depth_sq = np.zeros((height, width))

    # Strictly sequential front-to-back over Gaussians (the ground-truth
    # blending order); vectorized over pixels for speed only.
    pu, pv = np.meshgrid(np.arange(width), np.arange(height))
    t = np.ones((height, width))
    for i in order:
        if not valid[i]:
            break
        dx = mean2d[i, 0] - pu
        dy = mean2d[i, 1] - pv
        a, b, c = conic[i]
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
        alpha = np.minimum(ALPHA_MAX, opac[i] * np.exp(power))
        alpha = np.where((power > 0) | (alpha < ALPHA_MIN), 0.0, alpha)
        w = alpha * t
        out_rgb += w[..., None] * rgb[i]
        out_depth += w * z[i]
        out_depth_sq += w * z[i] * z[i]
        t = t * (1.0 - alpha)
    out_rgb += t[..., None] * np.asarray(bg)
    out_alpha = 1.0 - t

    return {
        "rgb": out_rgb,
        "depth": out_depth,
        "depth_sq": out_depth_sq,
        "alpha": out_alpha,
        "radii": radius,
        "valid": valid,
    }


def random_scene(rng, n, spread=2.0, z_range=(1.5, 6.0), scale_range=(-2.5, -1.2)):
    """A random cloud of Gaussians in front of the camera at the origin."""
    means = np.stack(
        [
            rng.uniform(-spread, spread, n),
            rng.uniform(-spread, spread, n),
            rng.uniform(z_range[0], z_range[1], n),
        ],
        axis=-1,
    )
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    return {
        "means3d": means.astype(np.float32),
        "rgb": rng.uniform(0, 1, (n, 3)).astype(np.float32),
        "quats": quats.astype(np.float32),
        "logit_opacities": rng.uniform(-1.0, 3.0, n).astype(np.float32),
        "log_scales": rng.uniform(*scale_range, (n, 3)).astype(np.float32),
        "active": np.ones(n, dtype=bool),
    }
