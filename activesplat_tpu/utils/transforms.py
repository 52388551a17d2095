"""Pose / quaternion math, in both JAX (device, differentiable) and numpy
(host planner/runtime) flavors.

Quaternions are stored (w, x, y, z), matching the reference's convention
(src/mapper/splatam/splatam.py:81 initializes rotations to [1, 0, 0, 0]).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as _ScipyRotation

from activesplat_tpu.utils import OPENCV_TO_OPENGL

# --------------------------------------------------------------------------- #
# JAX (device-side, differentiable)
# --------------------------------------------------------------------------- #


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize (..., 4) quaternions."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)
    return q / norm


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix.

    Normalizes internally (behavioral parity with the reference's
    build_rotation, src/mapper/splatam/utils/slam_external.py:25-42).
    """
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    rows = jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of (..., 4) wxyz quaternions
    (semantics of src/mapper/splatam/utils/slam_helpers.py:21-28)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def transform_points(matrix4: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply a (4, 4) homogeneous transform to (N, 3) points."""
    return (
        jnp.einsum(
            "nj,ij->ni", points, matrix4[:3, :3], precision=jax.lax.Precision.HIGHEST
        )
        + matrix4[:3, 3]
    )


def pose_from_quat_trans(quat_wxyz: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Build a (4, 4) transform from a wxyz quaternion and translation."""
    mat = jnp.eye(4, dtype=trans.dtype)
    mat = mat.at[:3, :3].set(quat_to_rotmat(quat_wxyz))
    mat = mat.at[:3, 3].set(trans)
    return mat


# --------------------------------------------------------------------------- #
# numpy (host-side)
# --------------------------------------------------------------------------- #


def np_quat_to_rotmat(q_wxyz: np.ndarray) -> np.ndarray:
    q = np.asarray(q_wxyz, dtype=np.float64)
    return _ScipyRotation.from_quat(np.roll(q, -1, axis=-1)).as_matrix()


def np_rotmat_to_quat(matrix3: np.ndarray) -> np.ndarray:
    """(3, 3) rotation matrix -> wxyz quaternion."""
    q_xyzw = _ScipyRotation.from_matrix(np.asarray(matrix3, dtype=np.float64)).as_quat()
    return np.roll(q_xyzw, 1, axis=-1)


def mat_to_q_pos(pose: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(4, 4) pose -> (wxyz quaternion, translation)
    (semantics of src/utils/pose_utils.py:13-21)."""
    assert pose.shape == (4, 4)
    return np_rotmat_to_quat(pose[:3, :3]), pose[:3, 3].copy()


def rot_axis(view_c2w: np.ndarray, axis: str, angle_rad: float) -> np.ndarray:
    """Rotate a camera pose about one of its *own* axes
    (semantics of src/utils/pose_utils.py:23-43): right-multiplication of the
    c2w by an elementary rotation.
    """
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    if axis == "x":
        rot = np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    elif axis == "y":
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    elif axis == "z":
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    else:
        raise ValueError(f"axis must be x, y or z, got {axis!r}")
    rot4 = np.eye(4)
    rot4[:3, :3] = rot
    return view_c2w @ rot4


def relative_transformation(trans_01: np.ndarray, trans_02: np.ndarray) -> np.ndarray:
    """Pose of frame 2 expressed in frame 1: inv(T_01) @ T_02
    (semantics of src/mapper/splatam/utils/geometryutils.py:413-479)."""
    return np.linalg.inv(trans_01) @ trans_02


def opencv_from_opengl(pose: np.ndarray) -> np.ndarray:
    """Conjugate a c2w between OpenGL and OpenCV camera conventions."""
    return pose @ OPENCV_TO_OPENGL


def compute_intrinsics(width: int, height: int, hfov_rad: float, vfov_rad: float | None = None):
    """Pinhole intrinsics from FOV, with the Habitat cx = W/2 - 1 quirk kept
    for output parity (reference: src/dataloader/__init__.py:275-284)."""
    fx = 0.5 * width / np.tan(hfov_rad / 2.0)
    fy = fx if vfov_rad is None else 0.5 * height / np.tan(vfov_rad / 2.0)
    cx = width / 2 - 1
    cy = height / 2 - 1
    return fx, fy, cx, cy


def rotation_distance_deg(rot_a: np.ndarray, rot_b: np.ndarray) -> float:
    """Geodesic angle between two rotation matrices in degrees."""
    diff = rot_a @ rot_b.T
    cos = np.clip((np.trace(diff) - 1.0) / 2.0, -1.0, 1.0)
    return float(np.degrees(np.arccos(cos)))


class PoseChangeType:
    """Pose-change classification (reference: gui_utils.py:309-336)."""

    NONE = 0
    TRANSLATION = 1
    ROTATION = 2
    BOTH = 3


def pose_change_type(
    c2w_old: np.ndarray,
    c2w_new: np.ndarray,
    translation_threshold: float,
    rotation_threshold_deg: float,
) -> int:
    dt = float(np.linalg.norm(c2w_new[:3, 3] - c2w_old[:3, 3]))
    dr = rotation_distance_deg(c2w_new[:3, :3], c2w_old[:3, :3])
    moved = dt > translation_threshold
    turned = dr > rotation_threshold_deg
    if moved and turned:
        return PoseChangeType.BOTH
    if moved:
        return PoseChangeType.TRANSLATION
    if turned:
        return PoseChangeType.ROTATION
    return PoseChangeType.NONE
