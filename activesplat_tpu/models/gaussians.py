"""Gaussian map pytrees.

TPU-first re-design of the reference's parameter dict
(src/mapper/splatam/splatam.py:78-115): instead of torch tensors that are
concatenated / sliced as the map grows (slam_external.py:126-164), the map
lives in a *fixed-capacity* buffer with an ``active`` mask. Densification
writes into free slots; pruning clears mask bits. Capacity grows in
power-of-two buckets so XLA recompiles a bounded number of times.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class GaussianParams(struct.PyTreeNode):
    """Learnable per-Gaussian parameters; leading dim = buffer capacity.

    Same parameterization as the reference (splatam.py:89-95): raw
    (unnormalized / log / logit) storage, activations applied at render time.
    """

    means3d: jnp.ndarray  # (C, 3) world-frame centers
    rgb: jnp.ndarray  # (C, 3) linear color in [0, 1]
    quats: jnp.ndarray  # (C, 4) unnormalized wxyz rotations
    logit_opacities: jnp.ndarray  # (C,)
    log_scales: jnp.ndarray  # (C, 3) anisotropic or (C, 1) isotropic

    @property
    def capacity(self) -> int:
        return self.means3d.shape[0]

    @property
    def isotropic(self) -> bool:
        return self.log_scales.shape[-1] == 1


class GaussianBuffer(struct.PyTreeNode):
    """Gaussian map = parameters + occupancy/bookkeeping state.

    ``active`` replaces dynamic tensor growth; the remaining fields mirror the
    reference's ``variables`` dict (splatam.py:110-113).
    """

    params: GaussianParams
    active: jnp.ndarray  # (C,) bool
    timestep: jnp.ndarray  # (C,) f32 — frame id at which each Gaussian was added
    max_radius: jnp.ndarray  # (C,) f32 — running max screen-space radius
    grad_accum: jnp.ndarray  # (C,) f32 — accumulated ||d loss/d mean2d||
    denom: jnp.ndarray  # (C,) f32 — number of grad accumulation events

    @property
    def capacity(self) -> int:
        return self.params.capacity

    def num_active(self) -> jnp.ndarray:
        return jnp.sum(self.active.astype(jnp.int32))

    @staticmethod
    def empty(capacity: int, isotropic: bool = False) -> "GaussianBuffer":
        scale_dim = 1 if isotropic else 3
        params = GaussianParams(
            means3d=jnp.zeros((capacity, 3), jnp.float32),
            rgb=jnp.zeros((capacity, 3), jnp.float32),
            quats=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32), (capacity, 1)),
            logit_opacities=jnp.zeros((capacity,), jnp.float32),
            log_scales=jnp.full((capacity, scale_dim), -10.0, jnp.float32),
        )
        return GaussianBuffer(
            params=params,
            active=jnp.zeros((capacity,), bool),
            timestep=jnp.zeros((capacity,), jnp.float32),
            max_radius=jnp.zeros((capacity,), jnp.float32),
            grad_accum=jnp.zeros((capacity,), jnp.float32),
            denom=jnp.zeros((capacity,), jnp.float32),
        )

    def grown(self, new_capacity: int) -> "GaussianBuffer":
        """Return a copy with capacity extended to ``new_capacity`` (padding
        slots inactive). Host-side, called between jitted steps."""
        assert new_capacity >= self.capacity
        pad = new_capacity - self.capacity

        def pad_leading(x):
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths)

        params = jax.tree.map(pad_leading, self.params)
        # padded quats must stay normalizable
        params = params.replace(
            quats=params.quats.at[self.capacity :, 0].set(1.0),
            log_scales=params.log_scales.at[self.capacity :].set(-10.0),
        )
        return GaussianBuffer(
            params=params,
            active=pad_leading(self.active),
            timestep=pad_leading(self.timestep),
            max_radius=pad_leading(self.max_radius),
            grad_accum=pad_leading(self.grad_accum),
            denom=pad_leading(self.denom),
        )


def insert_gaussians(
    buf: GaussianBuffer,
    new_params: GaussianParams,
    new_valid: jnp.ndarray,
    frame_id: jnp.ndarray,
) -> Tuple[GaussianBuffer, jnp.ndarray]:
    """Write candidate Gaussians into free slots of the buffer.

    TPU-native equivalent of the reference's torch.cat-based densification
    (splatam.py:370-377): candidates whose ``new_valid`` bit is set are
    scattered into the first free slots, in order. Candidates that do not fit
    are dropped (returned as ``num_dropped``); the caller grows the buffer
    and retries if that is nonzero.

    Returns (new_buffer, num_dropped).
    """
    capacity = buf.capacity
    new_valid = new_valid.astype(bool)

    # Rank of each free slot among free slots, stable in slot order.
    free = ~buf.active
    # stable argsort: active slots (False in `free`) go last
    slot_order = jnp.argsort(~free, stable=True)  # free slots first, ascending index
    num_free = jnp.sum(free.astype(jnp.int32))

    # Rank of each valid candidate among valid candidates.
    cand_rank = jnp.cumsum(new_valid.astype(jnp.int32)) - 1
    fits = new_valid & (cand_rank < num_free)
    #

    # Target slot for each candidate; invalid/overflow candidates scatter to
    # index `capacity`, which is dropped by scatter's out-of-bounds mode.
    target = jnp.where(fits, slot_order[jnp.clip(cand_rank, 0, capacity - 1)], capacity)

    def scatter(dst, src):
        return dst.at[target].set(src, mode="drop")

    params = GaussianParams(
        means3d=scatter(buf.params.means3d, new_params.means3d),
        rgb=scatter(buf.params.rgb, new_params.rgb),
        quats=scatter(buf.params.quats, new_params.quats),
        logit_opacities=scatter(buf.params.logit_opacities, new_params.logit_opacities),
        log_scales=scatter(buf.params.log_scales, new_params.log_scales),
    )
    n_inserted = jnp.sum(fits.astype(jnp.int32))
    num_dropped = jnp.sum(new_valid.astype(jnp.int32)) - n_inserted
    new_buf = GaussianBuffer(
        params=params,
        active=scatter(buf.active, jnp.ones_like(new_valid)),
        timestep=scatter(buf.timestep, jnp.full(new_valid.shape, frame_id, jnp.float32)),
        # reference resets these bookkeeping arrays on densification
        # (splatam.py:372-375)
        max_radius=jnp.zeros_like(buf.max_radius),
        grad_accum=jnp.zeros_like(buf.grad_accum),
        denom=jnp.zeros_like(buf.denom),
    )
    return new_buf, num_dropped


def prune_mask(buf: GaussianBuffer, remove: jnp.ndarray) -> GaussianBuffer:
    """Deactivate Gaussians where ``remove`` is set (reference: remove_points,
    slam_external.py:143-164 — here a mask clear instead of tensor surgery)."""
    return buf.replace(active=buf.active & ~remove)


# --------------------------------------------------------------------------- #
# Camera
# --------------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole camera for rendering. Width/height are static (shape-defining);
    intrinsics and pose are arrays so one compiled render serves all views.

    Equivalent of the reference's GaussianRasterizationSettings construction
    (src/mapper/splatam/utils/recon_helpers.py:4-28), without the OpenGL
    projection matrix — the TPU renderer projects directly from intrinsics.
    """

    width: int
    height: int
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    w2c: jnp.ndarray  # (4, 4) OpenCV world-to-camera
    near: float = 0.01
    far: float = 100.0

    @property
    def intrinsics(self) -> jnp.ndarray:
        k = jnp.zeros((3, 3), jnp.float32)
        k = k.at[0, 0].set(self.fx).at[1, 1].set(self.fy)
        k = k.at[0, 2].set(self.cx).at[1, 2].set(self.cy).at[2, 2].set(1.0)
        return k


jax.tree_util.register_dataclass(
    Camera,
    data_fields=["fx", "fy", "cx", "cy", "w2c"],
    meta_fields=["width", "height", "near", "far"],
)


def make_camera(
    width: int,
    height: int,
    intrinsics: np.ndarray,
    w2c: np.ndarray,
    near: float = 0.01,
    far: float = 100.0,
) -> Camera:
    intrinsics = np.asarray(intrinsics)
    return Camera(
        width=int(width),
        height=int(height),
        fx=jnp.float32(intrinsics[0, 0]),
        fy=jnp.float32(intrinsics[1, 1]),
        cx=jnp.float32(intrinsics[0, 2]),
        cy=jnp.float32(intrinsics[1, 2]),
        w2c=jnp.asarray(w2c, jnp.float32),
        near=near,
        far=far,
    )
