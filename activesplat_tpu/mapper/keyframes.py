"""Keyframe storage and overlap-based selection, fully on device.

The reference keeps a python list of keyframe dicts and reselects per mapping
event (keyframe_selection_overlap, keyframe_selection.py:40-96). TPU-native
design: a fixed-capacity device-resident store (rgb/depth/w2c arrays); the
per-iteration keyframe *gather* then happens inside the jitted mapping scan,
so optimization never round-trips to host.

Selection semantics matched to the reference: sample `pixels` valid-depth
pixels of the current frame, backproject, project into each stored keyframe,
keep keyframes with any in-view overlap, and pick k of them uniformly at
random (the reference sorts by overlap then takes k from a random permutation
of all overlapping keyframes — i.e. a uniform choice among overlapping ones,
keyframe_selection.py:87-94).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from activesplat_tpu.mapper.geometry import backproject


class KeyframeStore(struct.PyTreeNode):
    rgb: jnp.ndarray  # (K, H, W, 3) f32
    depth: jnp.ndarray  # (K, H, W) f32
    w2c: jnp.ndarray  # (K, 4, 4) f32
    frame_id: jnp.ndarray  # (K,) i32, -1 = empty
    count: jnp.ndarray  # () i32 number of committed keyframes

    @staticmethod
    def empty(capacity: int, height: int, width: int) -> "KeyframeStore":
        return KeyframeStore(
            rgb=jnp.zeros((capacity, height, width, 3), jnp.float32),
            depth=jnp.zeros((capacity, height, width), jnp.float32),
            w2c=jnp.tile(jnp.eye(4, dtype=jnp.float32), (capacity, 1, 1)),
            frame_id=jnp.full((capacity,), -1, jnp.int32),
            count=jnp.zeros((), jnp.int32),
        )

    @property
    def capacity(self) -> int:
        return self.rgb.shape[0]

    @property
    def scratch_slot(self) -> int:
        """Last slot, reserved for the *current frame* during a mapping phase
        (the reference appends the current frame to the selected keyframes,
        splatam/__init__.py:434-436)."""
        return self.capacity - 1

    def with_scratch(self, rgb, depth, w2c, frame_id) -> "KeyframeStore":
        s = self.scratch_slot
        return self.replace(
            rgb=self.rgb.at[s].set(rgb),
            depth=self.depth.at[s].set(depth),
            w2c=self.w2c.at[s].set(w2c),
            frame_id=self.frame_id.at[s].set(frame_id),
        )

    def committed(self, rgb, depth, w2c, frame_id) -> "KeyframeStore":
        """Append a keyframe at the next free slot (capacity - 1 is scratch;
        overflow silently drops, callers should size capacity to the step
        budget / kf_every)."""
        slot = jnp.minimum(self.count, self.capacity - 2)
        return self.replace(
            rgb=self.rgb.at[slot].set(rgb),
            depth=self.depth.at[slot].set(depth),
            w2c=self.w2c.at[slot].set(w2c),
            frame_id=self.frame_id.at[slot].set(frame_id),
            count=jnp.minimum(self.count + 1, self.capacity - 1),
        )


@functools.partial(jax.jit, static_argnames=("num_select", "pixels", "edge"))
def select_keyframes_overlap(
    store: KeyframeStore,
    depth_cur: jnp.ndarray,  # (H, W)
    w2c_cur: jnp.ndarray,  # (4, 4)
    fx,
    fy,
    cx,
    cy,
    key: jax.Array,
    num_select: int,
    pixels: int = 1600,
    edge: int = 20,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (selected slot ids (num_select,), valid mask (num_select,)).

    Only keyframes with slot < count - 1 participate (the *last* committed
    keyframe is always added separately by the caller, mirroring
    splatam/__init__.py:428-433).
    """
    h, w = depth_cur.shape
    k_cap = store.capacity

    key_px, key_sel = jax.random.split(key)
    flat_depth = depth_cur.reshape(-1)
    valid_px = flat_depth > 0
    probs = valid_px.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    px_idx = jax.random.choice(key_px, h * w, (pixels,), replace=True, p=probs)

    c2w_cur = jnp.linalg.inv(w2c_cur)
    pts_all = backproject(depth_cur, fx, fy, cx, cy, c2w_cur)  # (H*W, 3)
    pts = pts_all[px_idx]  # (pixels, 3)

    def overlap_with(kf_w2c):
        p_cam = (
            jnp.einsum(
                "nj,ij->ni", pts, kf_w2c[:3, :3], precision=jax.lax.Precision.HIGHEST
            )
            + kf_w2c[:3, 3]
        )
        z = p_cam[:, 2] + 1e-5
        u = fx * p_cam[:, 0] / z + cx
        v = fy * p_cam[:, 1] / z + cy
        inside = (
            (u > edge) & (u < w - edge) & (v > edge) & (v < h - edge) & (z > 0)
        )
        return jnp.mean(inside.astype(jnp.float32))

    percent = jax.vmap(overlap_with)(store.w2c)  # (K,)
    slot_ids = jnp.arange(k_cap)
    eligible = (slot_ids < store.count - 1) & (percent > 0.0)

    # uniform random choice among eligible via Gumbel top-k
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key_sel, (k_cap,)) + 1e-12) + 1e-12)
    scores = jnp.where(eligible, gumbel, -jnp.inf)
    top_scores, top_ids = jax.lax.top_k(scores, num_select)
    sel_valid = jnp.isfinite(top_scores)
    return top_ids.astype(jnp.int32), sel_valid
