"""params.npz reader/writer with the reference's schema.

Schema (save_params, src/mapper/splatam/utils/common_utils.py:37-44, assembled
at splatam/__init__.py:554-573):

  means3D (N,3)  rgb_colors (N,3)  unnorm_rotations (N,4)
  logit_opacities (N,1)  log_scales (N,1|3)  timestep (N,)
  cam_unnorm_rots (1,4,T)  cam_trans (1,3,T)
  intrinsics (3,3)  w2c (4,4)  org_width ()  org_height ()
  gt_w2c_all_frames (T,4,4)  keyframe_time_indices (K,)

The TPU buffer is compacted to active Gaussians on export.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from activesplat_tpu.models.gaussians import GaussianBuffer, GaussianParams


def params_dict_from_buffer(buf: GaussianBuffer) -> Dict[str, np.ndarray]:
    active = np.asarray(buf.active)
    idx = np.nonzero(active)[0]
    params = buf.params
    return {
        "means3D": np.asarray(params.means3d)[idx],
        "rgb_colors": np.asarray(params.rgb)[idx],
        "unnorm_rotations": np.asarray(params.quats)[idx],
        "logit_opacities": np.asarray(params.logit_opacities)[idx][:, None],
        "log_scales": np.asarray(params.log_scales)[idx],
        "timestep": np.asarray(buf.timestep)[idx],
    }


def save_params(
    output_dir: str,
    buf: GaussianBuffer,
    cam_unnorm_rots: np.ndarray,  # (1, 4, T)
    cam_trans: np.ndarray,  # (1, 3, T)
    intrinsics: np.ndarray,
    first_frame_w2c: np.ndarray,
    org_width: int,
    org_height: int,
    gt_w2c_all_frames: np.ndarray,
    keyframe_time_indices: np.ndarray,
) -> str:
    params = params_dict_from_buffer(buf)
    params.update(
        {
            "cam_unnorm_rots": np.asarray(cam_unnorm_rots, np.float32),
            "cam_trans": np.asarray(cam_trans, np.float32),
            "intrinsics": np.asarray(intrinsics, np.float32),
            "w2c": np.asarray(first_frame_w2c, np.float32),
            "org_width": np.asarray(org_width),
            "org_height": np.asarray(org_height),
            "gt_w2c_all_frames": np.asarray(gt_w2c_all_frames, np.float32),
            "keyframe_time_indices": np.asarray(keyframe_time_indices),
        }
    )
    params = {
        k: (v.astype(np.float32) if v.dtype.kind == "f" else v)
        for k, v in params.items()
    }
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, "params.npz")
    np.savez(path, **params)
    return path


def save_params_ckpt(output_dir: str, buf: GaussianBuffer, time_idx: int, **extras) -> str:
    """Mid-run checkpoint: params{t}.npz (common_utils.py:61-68)."""
    params = params_dict_from_buffer(buf)
    for k, v in extras.items():
        params[k] = np.asarray(v)
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, f"params{time_idx}.npz")
    np.savez(path, **params)
    return path


def load_params(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as data:
        return {k: data[k] for k in data.files}


def buffer_from_params(
    params: Dict[str, np.ndarray], capacity: int | None = None
) -> GaussianBuffer:
    """Rebuild a GaussianBuffer from a params dict (resume / offline eval)."""
    import jax.numpy as jnp

    n = params["means3D"].shape[0]
    capacity = capacity or max(1 << (n - 1).bit_length(), 1024)
    buf = GaussianBuffer.empty(capacity, isotropic=params["log_scales"].shape[-1] == 1)

    def fill(dst, src):
        return dst.at[:n].set(jnp.asarray(src))

    gp = GaussianParams(
        means3d=fill(buf.params.means3d, params["means3D"]),
        rgb=fill(buf.params.rgb, params["rgb_colors"]),
        quats=fill(buf.params.quats, params["unnorm_rotations"]),
        logit_opacities=fill(
            buf.params.logit_opacities, params["logit_opacities"].reshape(-1)
        ),
        log_scales=fill(buf.params.log_scales, params["log_scales"]),
    )
    timestep = params.get("timestep", np.zeros(n))
    return buf.replace(
        params=gp,
        active=buf.active.at[:n].set(True),
        timestep=buf.timestep.at[:n].set(jnp.asarray(timestep, jnp.float32)),
    )
