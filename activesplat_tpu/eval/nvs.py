"""Novel-view-synthesis evaluation of a fitted Gaussian map.

eval_nvs parity (reference: src/mapper/splatam/utils/eval_helpers.py:627-806):
for each held-out view, render rgb/depth/silhouette from the map; a frame is
a VALID novel view when < 0.1% of its pixels are holes (silhouette below
sil_thres while GT depth is valid); metrics are valid-depth-masked PSNR,
MS-SSIM, LPIPS (when weights exist) and depth L1/RMSE normalized by the
valid-pixel count, averaged over valid frames only.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from activesplat_tpu.models.gaussians import GaussianBuffer


def eval_nvs(
    buf: GaussianBuffer,
    frames: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],  # (rgb, depth, c2w)
    intrinsics: np.ndarray,
    width: int,
    height: int,
    sil_thres: float = 0.98,
    eval_every: int = 1,
    chunk: int = 256,
    k_per_tile: int = 0,
    mask_with_silhouette: bool = False,  # mapping_iters==0 mode (eval_helpers.py:706)
) -> Dict[str, float]:
    """Returns averaged psnr / ms_ssim / depth_rmse / depth_l1 (+ lpips when
    available) over valid novel views, plus the valid-frame ratio."""
    import jax.numpy as jnp

    from activesplat_tpu.eval.metrics import lpips, ms_ssim, psnr
    from activesplat_tpu.models.gaussians import make_camera
    from activesplat_tpu.ops.render import render_jit

    per_frame: List[Dict[str, float]] = []
    valid_flags: List[bool] = []
    for idx, (rgb_gt, depth_gt, c2w) in enumerate(frames):
        if idx != 0 and (idx + 1) % eval_every != 0:
            continue
        cam = make_camera(width, height, intrinsics, np.linalg.inv(c2w))
        from activesplat_tpu.ops.render import forward_backend

        out = render_jit(
            buf, cam, chunk=chunk, k_per_tile=k_per_tile,
            backend=forward_backend() if k_per_tile else "xla",
            exact=k_per_tile > 0,  # NVS scoring must not be k-truncated
        )
        im = np.asarray(out.rgb)
        rastered_depth = np.asarray(out.depth)
        silhouette = np.asarray(out.alpha)

        valid_depth = depth_gt > 0
        presence = silhouette > sil_thres
        holes = ~(presence | ~valid_depth)
        valid_frame = holes.sum() / holes.size * 100 <= 0.1
        valid_flags.append(bool(valid_frame))

        pix_mask = valid_depth & presence if mask_with_silhouette else valid_depth
        w_im = im * pix_mask[..., None]
        w_gt = rgb_gt * pix_mask[..., None]
        n_valid = max(int(valid_depth.sum()), 1)
        d_err = (rastered_depth - depth_gt) * (
            presence if mask_with_silhouette else 1.0
        )
        d_err = d_err * valid_depth
        report = {
            "psnr": float(psnr(w_im, w_gt)),
            "ms_ssim": _ms_ssim_safe(w_im, w_gt),
            # NOT a true RMSE: sqrt applies per pixel, so this equals the
            # masked L1 — a deliberate quirk replicated from the reference
            # (eval_helpers.py eval_nvs: torch.sqrt((diff**2)) elementwise);
            # metrics.depth_metrics computes the real RMSE
            "depth_rmse": float(np.sqrt(d_err**2).sum() / n_valid),
            "depth_l1": float(np.abs(d_err).sum() / n_valid),
        }
        lp = lpips(np.clip(w_im, 0, 1), np.clip(w_gt, 0, 1))
        if lp is not None:
            report["lpips"] = lp
        per_frame.append(report)

    valid = np.asarray(valid_flags)
    if not valid.any():
        return {"valid_frame_ratio": 0.0, "num_eval_frames": len(per_frame)}
    keys = per_frame[0].keys()
    out = {
        k: float(np.mean([r[k] for r, v in zip(per_frame, valid) if v]))
        for k in keys
    }
    out["valid_frame_ratio"] = float(valid.mean())
    out["num_eval_frames"] = len(per_frame)
    return out


def _ms_ssim_safe(a: np.ndarray, b: np.ndarray) -> float:
    from activesplat_tpu.eval.metrics import ms_ssim, ms_ssim_levels, ssim

    if min(a.shape[0], a.shape[1]) < 11:  # below one VALID window
        return float(ssim(a, b))
    return float(ms_ssim(a, b, levels=ms_ssim_levels(a.shape[0], a.shape[1])))


def eval_nvs_from_dump(
    params_path: str,
    gaussians_data_dir: str,
    holdout_every: int = 5,
    **kwargs,
) -> Dict[str, float]:
    """NVS eval on a gaussians_data dump: frames NOT in the training split
    (every ``holdout_every``-th, offset 1 — the first train frame is skipped
    as in the reference, eval_helpers.py:663-664) score the saved map."""
    from activesplat_tpu.io.manifest import load_frame, load_manifest
    from activesplat_tpu.io.params_io import buffer_from_params, load_params

    params = load_params(params_path)
    buf = buffer_from_params(params)
    manifest = load_manifest(gaussians_data_dir)
    intr = np.array(
        [
            [manifest["fl_x"], 0, manifest["cx"]],
            [0, manifest["fl_y"], manifest["cy"]],
            [0, 0, 1],
        ]
    )
    frames = []
    for i, entry in enumerate(manifest["frames"]):
        if i % holdout_every != 1:  # hold-out split
            continue
        rgb, depth, w2c = load_frame(gaussians_data_dir, entry)
        frames.append((rgb, depth, np.linalg.inv(w2c)))
    return eval_nvs(
        buf, frames, intr, manifest["w"], manifest["h"], **kwargs
    )
