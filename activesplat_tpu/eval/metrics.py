"""Image / depth / trajectory quality metrics.

The reference's metric suite (src/mapper/splatam/utils/eval_helpers.py;
BASELINE.md): PSNR, MS-SSIM, LPIPS, depth L1/RMSE, ATE RMSE. LPIPS requires
torchmetrics' pretrained AlexNet which is not available offline — it is
exposed behind `lpips_available()` and skipped gracefully otherwise.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from activesplat_tpu.ops.ssim import psnr as _psnr_jax, ssim as _ssim_jax


def psnr(img_a: np.ndarray, img_b: np.ndarray) -> float:
    return float(_psnr_jax(jnp.asarray(img_a), jnp.asarray(img_b)))


def ssim(img_a: np.ndarray, img_b: np.ndarray) -> float:
    return float(_ssim_jax(jnp.asarray(img_a), jnp.asarray(img_b)))


def ms_ssim_levels(height: int, width: int, max_levels: int = 5) -> int:
    """Largest pyramid depth whose coarsest level still fits the 11-px VALID
    SSIM window UNDER TRUNCATING 2x downsampling (size -> size // 2 per
    level; the naive `min_side > 10 * 2**(L-1)` bound over-admits borderline
    sizes like 42 px, whose truncated pyramid 42->20->10 leaves no valid
    window and made the metric NaN)."""
    size = min(height, width)
    levels = 0
    while levels < max_levels and size >= 11:
        levels += 1
        size //= 2
    return max(levels, 1)


def ms_ssim(img_a: np.ndarray, img_b: np.ndarray, levels: int = 5) -> float:
    """Multi-scale SSIM matching `pytorch_msssim.ms_ssim` (the reference's
    eval metric, eval_helpers.py:483-484): per level, VALID-windowed SSIM;
    the *contrast-structure* term at levels 0..L-2 and the full SSIM only at
    the coarsest level; relu-clamped per-channel means; weighted per-channel
    product, then mean over channels. 2x average-pool between levels
    (pytorch pads odd dims; reference images are 256/512 so dims stay even —
    odd dims here are truncated).

    Requires every pyramid level to fit the 11-px window (pytorch_msssim
    raises for such sizes too; use ms_ssim_levels() to pick a legal depth)."""
    a = jnp.asarray(img_a, jnp.float32)
    b = jnp.asarray(img_b, jnp.float32)
    if a.ndim == 2:
        a = a[:, :, None]
        b = b[:, :, None]
    if ms_ssim_levels(a.shape[0], a.shape[1], levels) < levels:
        raise ValueError(
            f"image {a.shape[:2]} too small for {levels}-level MS-SSIM"
        )
    return float(ms_ssim_jax(a, b, levels))


def ms_ssim_jax(a: jnp.ndarray, b: jnp.ndarray, levels: int) -> jnp.ndarray:
    """Pure-jnp MS-SSIM core (see ms_ssim): traceable, so fused device
    scorers (eval_map_quality) can compute it in-graph next to the render
    instead of shuttling images over the host link per metric call. `levels`
    is static; callers validate it with ms_ssim_levels()."""
    from activesplat_tpu.ops.ssim import ssim_cs

    weights = jnp.asarray(
        np.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])[:levels],
        jnp.float32,
    )
    per_level = []  # (C,) arrays: cs at 0..L-2, ssim at L-1
    for level in range(levels):
        ssim_pc, cs_pc = ssim_cs(a, b)
        per_level.append(
            jnp.maximum(ssim_pc if level == levels - 1 else cs_pc, 0.0)
        )
        if level < levels - 1:
            h = (a.shape[0] // 2) * 2
            w = (a.shape[1] // 2) * 2
            a = (
                a[:h:2, :w:2] + a[1:h:2, :w:2] + a[:h:2, 1:w:2] + a[1:h:2, 1:w:2]
            ) / 4.0
            b = (
                b[:h:2, :w:2] + b[1:h:2, :w:2] + b[:h:2, 1:w:2] + b[1:h:2, 1:w:2]
            ) / 4.0
    stacked = jnp.stack(per_level)  # (levels, C)
    per_channel = jnp.prod(stacked ** weights[:, None], axis=0)
    return jnp.mean(per_channel)


def depth_metrics(
    depth_pred: np.ndarray, depth_gt: np.ndarray
) -> Tuple[float, float]:
    """(L1, RMSE) over valid GT depth (eval_helpers.py:236-245)."""
    mask = depth_gt > 0
    if not mask.any():
        return 0.0, 0.0
    diff = depth_pred[mask] - depth_gt[mask]
    return float(np.abs(diff).mean()), float(np.sqrt((diff**2).mean()))


def align_trajectories(est: np.ndarray, gt: np.ndarray):
    """Horn alignment of (N, 3) trajectories: returns (rot, trans,
    per-point residuals) (evaluate_ate semantics, eval_helpers.py:24-79)."""
    est = np.asarray(est, np.float64).T  # (3, N)
    gt = np.asarray(gt, np.float64).T
    est_c = est - est.mean(1, keepdims=True)
    gt_c = gt - gt.mean(1, keepdims=True)
    w = est_c @ gt_c.T
    u, _, vt = np.linalg.svd(w)
    s = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        s[2, 2] = -1
    rot = u @ s @ vt
    rot = rot.T  # maps est -> gt
    trans = gt.mean(1, keepdims=True) - rot @ est.mean(1, keepdims=True)
    aligned = rot @ est + trans
    residuals = np.linalg.norm(aligned - gt, axis=0)
    return rot, trans, residuals


def ate_rmse(est_c2w: np.ndarray, gt_c2w: np.ndarray) -> float:
    """ATE RMSE over (N, 4, 4) pose arrays."""
    _, _, residuals = align_trajectories(est_c2w[:, :3, 3], gt_c2w[:, :3, 3])
    return float(np.sqrt((residuals**2).mean()))


def lpips_available() -> bool:
    try:
        import torchmetrics.image.lpip  # noqa: F401

        return True
    except Exception:
        return False


def lpips(img_a: np.ndarray, img_b: np.ndarray) -> Optional[float]:
    """LPIPS(alexnet): torchmetrics when importable, else the native JAX
    implementation when ACTIVESPLAT_LPIPS_WEIGHTS points at a converted
    checkpoint (eval/lpips_jax.py), else None (eval_helpers.py:16,485-487)."""
    if lpips_available():
        try:
            import torch
            from torchmetrics.image.lpip import (
                LearnedPerceptualImagePatchSimilarity,
            )

            metric = LearnedPerceptualImagePatchSimilarity(
                net_type="alex", normalize=True
            )
            a = torch.from_numpy(
                np.asarray(img_a, np.float32)
            ).permute(2, 0, 1)[None]
            b = torch.from_numpy(
                np.asarray(img_b, np.float32)
            ).permute(2, 0, 1)[None]
            with torch.no_grad():
                return float(metric(a, b))
        except Exception:
            pass  # e.g. pretrained-weight download blocked: fall through
    from activesplat_tpu.eval import lpips_jax

    return lpips_jax.lpips(img_a, img_b)


def frame_scores_jax(
    rgb_pred: jnp.ndarray,
    rgb_gt: jnp.ndarray,
    depth_pred: jnp.ndarray,
    depth_gt: jnp.ndarray,
    levels: int,
) -> jnp.ndarray:
    """In-graph (5,) scores [psnr, ssim, ms_ssim, depth_l1, depth_rmse]
    mirroring frame_report. Lets eval loops fuse render+metrics into ONE
    device program and fetch 5 scalars instead of shuttling full f32 images
    host<->device per metric (the relay moves ~10 MB/s; a 256px frame is
    ~1 MB each way)."""
    from activesplat_tpu.ops.ssim import psnr as psnr_j, ssim as ssim_j

    # unclamped, like frame_report / the reference's eval (only LPIPS
    # clamps, eval_helpers.py:485-486)
    a = rgb_pred.astype(jnp.float32)
    b = rgb_gt.astype(jnp.float32)
    mask = depth_gt > 0
    n_valid = jnp.maximum(jnp.sum(mask), 1)
    diff = jnp.where(mask, depth_pred - depth_gt, 0.0)
    l1 = jnp.sum(jnp.abs(diff)) / n_valid
    rmse = jnp.sqrt(jnp.sum(diff * diff) / n_valid)
    ssim_val = ssim_j(a, b)
    ms_val = ms_ssim_jax(a, b, levels) if levels >= 1 else ssim_val
    return jnp.stack([psnr_j(a, b), ssim_val, ms_val, l1, rmse])


def frame_report(
    rgb_pred: np.ndarray,
    rgb_gt: np.ndarray,
    depth_pred: np.ndarray,
    depth_gt: np.ndarray,
) -> Dict[str, float]:
    l1, rmse = depth_metrics(depth_pred, depth_gt)
    # largest pyramid depth (<=5) the image supports; 5 at the reference's
    # 256px, fewer for small test frames; below the 11-px VALID window no
    # level fits, so single-scale SSIM (gaussian-windowed) stands in
    ssim_val = ssim(rgb_pred, rgb_gt)
    if min(rgb_pred.shape[0], rgb_pred.shape[1]) >= 11:
        levels = ms_ssim_levels(rgb_pred.shape[0], rgb_pred.shape[1])
        ms_val = ms_ssim(rgb_pred, rgb_gt, levels=levels)
    else:
        ms_val = ssim_val
    out = {
        "psnr": psnr(rgb_pred, rgb_gt),
        "ssim": ssim_val,
        "ms_ssim": ms_val,
        "depth_l1": l1,
        "depth_rmse": rmse,
    }
    value = lpips(rgb_pred, rgb_gt)
    if value is not None:
        out["lpips"] = value
    return out
