"""Exploration coverage judge: replay actions.txt and measure scene coverage.

Equivalent of the reference's action-replay judge
(scripts/judges/eval_actions.py): re-run the recorded trajectory in the
simulator, backproject every frame into a world point cloud, and measure
against GT surface samples with a KD-tree:

  completeness (m)      — mean distance GT sample -> nearest observed point
  completeness ratio    — fraction of GT samples within `dist_threshold`
  accuracy (m)          — mean distance observed point -> nearest GT sample
  path length (m)       — forward steps x step size

The reference parallelizes per-frame KD queries with a ProcessPoolExecutor
(eval_actions.py:98): one tree per frame, 200k GT queries against each, with
a running min. min-over-frames of per-frame nearest distances equals the
nearest distance against the UNION cloud, so this implementation builds ONE
KD-tree over all observed points and queries the GT samples once — identical
numbers, ~25x less query work for a 1000-frame episode (the per-frame path
cost ~45 min on this host; the union path is dominated by the single tree
build). `workers` maps to scipy's threaded query.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np
from scipy.spatial import cKDTree

from activesplat_tpu.io.actions import read_actions
from activesplat_tpu.runtime.dataloader import SimAction, SyntheticDataset


@dataclasses.dataclass
class CoverageReport:
    completeness: float
    completeness_ratio: float
    accuracy: float
    path_length: float
    num_observed_points: int

    def as_row(self) -> str:
        """The actions_error.txt row layout (eval_actions.py:150-152)."""
        return (
            f"{self.completeness:.6f} {self.completeness_ratio:.6f} "
            f"{self.accuracy:.6f} {self.path_length:.6f}"
        )


def backproject_frame(depth: np.ndarray, intrinsics: np.ndarray, c2w: np.ndarray):
    h, w = depth.shape
    us, vs = np.meshgrid(np.arange(w), np.arange(h))
    z = depth.reshape(-1)
    valid = z > 0
    x = (us.reshape(-1) - intrinsics[0, 2]) / intrinsics[0, 0] * z
    y = (vs.reshape(-1) - intrinsics[1, 2]) / intrinsics[1, 1] * z
    pts = np.stack([x, y, z], -1)[valid]
    return pts @ c2w[:3, :3].T + c2w[:3, 3]


def _observed_cloud(
    frames: List,
    intrinsics: np.ndarray,
    point_subsample: int,
) -> np.ndarray:
    """Union of all frames' backprojected (subsampled) world points."""
    observed: List[np.ndarray] = []
    for depth, c2w in frames:
        pts = backproject_frame(depth, intrinsics, c2w)
        if len(pts) == 0:
            continue
        observed.append(pts[::point_subsample])
    return np.concatenate(observed, 0) if observed else np.zeros((0, 3))


def sample_gt_surface(dataset, num_samples: int = 200_000) -> np.ndarray:
    """GT surface samples for the coverage judge: the synthetic world's
    analytic surfaces, or — for mesh-backed datasets like Habitat — 200k
    trimesh samples of the GT scene mesh (eval_actions.py:65-67)."""
    world = getattr(dataset, "world", None)
    if world is None:
        # HabitatDataset driven by the BoxWorld mock sim: the analytic
        # geometry lives on the simulator (runtime/mock_habitat.py)
        world = getattr(getattr(dataset, "_sim", None), "world", None)
    if world is not None:
        return world.sample_surface(num_samples, seed=0)
    mesh_url = getattr(dataset, "scene_mesh_url", None)
    if mesh_url:
        try:
            import trimesh
        except ImportError as exc:
            raise RuntimeError(
                "coverage eval for a mesh-backed dataset needs trimesh to "
                "sample the GT mesh (pass gt_samples= explicitly instead)"
            ) from exc
        mesh = trimesh.load(mesh_url, force="mesh")
        return np.asarray(mesh.sample(num_samples), np.float64)
    raise ValueError(
        "dataset exposes neither .world nor .scene_mesh_url; pass gt_samples="
    )


def eval_actions(
    dataset: SyntheticDataset,
    actions_path: str,
    gt_samples: Optional[np.ndarray] = None,
    num_gt_samples: int = 200_000,
    dist_threshold: float = 0.05,
    frame_stride: int = 1,
    point_subsample: int = 4,
    workers: int = 0,
) -> CoverageReport:
    """Replay a recorded action sequence in a *fresh* dataset and score
    coverage (eval_actions.py:42-153 semantics; 200k GT samples, 5 cm
    completeness threshold). The per-frame trees the reference loops over
    (eval_actions.py:96-148) are replaced by one union-cloud tree — same
    min-distance math, one query pass. workers > 1 threads that query."""
    if hasattr(dataset, "setup") and getattr(dataset, "_sim", None) is None:
        dataset.setup()  # fresh HabitatDataset in 'Eval' mode
    dataset.reset()
    if gt_samples is None:
        gt_samples = sample_gt_surface(dataset, num_gt_samples)
    tree_gt = cKDTree(gt_samples)

    forward_steps = 0
    intrinsics = dataset.sensor.intrinsics

    actions = read_actions(actions_path)
    frame = dataset.get_frame()
    frames = [frame]
    for action in actions:
        if action == int(SimAction.MOVE_FORWARD):
            forward_steps += 1
        dataset.step(SimAction(action))
        frames.append(dataset.get_frame())

    work = [
        (f["depth"], np.asarray(f["c2w"], np.float64))
        for f in frames[::frame_stride]
    ]
    all_pts = _observed_cloud(work, intrinsics, point_subsample)

    if len(all_pts):
        query_workers = workers if workers > 1 else 1
        tree_obs = cKDTree(all_pts)
        min_dist, _ = tree_obs.query(gt_samples, k=1, workers=query_workers)
        d_acc, _ = tree_gt.query(
            all_pts[:: max(1, len(all_pts) // 500_000 + 1)],
            k=1,
            workers=query_workers,
        )
        accuracy = float(d_acc.mean())
        completeness = float(min_dist.mean())
        ratio = float((min_dist < dist_threshold).mean())
    else:
        accuracy = float("inf")
        completeness = float("inf")
        ratio = 0.0
    return CoverageReport(
        completeness=completeness,
        completeness_ratio=ratio,
        accuracy=accuracy,
        path_length=forward_steps * dataset.forward_step,
        num_observed_points=len(all_pts),
    )


def eval_map_quality(
    params_path: str,
    gaussians_data_dir: str,
    frame_stride: int = 1,
    chunk: int = 256,
    k_per_tile: int = 0,
) -> Dict[str, float]:
    """Render the saved map at every dumped frame pose and report averaged
    PSNR / SSIM / MS-SSIM / depth metrics (role of eval/eval_nvs,
    eval_helpers.py:409-625, over the gaussians_data dump)."""
    import functools
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from activesplat_tpu.eval.metrics import (
        frame_scores_jax,
        lpips,
        lpips_available,
        ms_ssim_levels,
    )
    from activesplat_tpu.io.manifest import load_frame, load_manifest
    from activesplat_tpu.io.params_io import buffer_from_params, load_params
    from activesplat_tpu.models.gaussians import make_camera
    from activesplat_tpu.ops.render import forward_backend, render

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
    w, h = manifest["w"], manifest["h"]
    levels = ms_ssim_levels(h, w) if min(h, w) >= 11 else 0
    backend = forward_backend() if k_per_tile else "xla"
    # LPIPS needs the rendered image on host; everything else fuses into one
    # device program per frame (render + metrics -> 5 scalars), so the relay
    # moves ~40 bytes/frame instead of ~2 MB of f32 images
    want_lpips = lpips_available() or bool(
        os.environ.get("ACTIVESPLAT_LPIPS_WEIGHTS")
    )

    @functools.partial(jax.jit, static_argnames=())
    def score_frame(buf, cam, rgb_gt, depth_gt):
        out = render(
            buf, cam, chunk=chunk, k_per_tile=k_per_tile,
            backend=backend,
            exact=k_per_tile > 0,  # quality eval must not be k-truncated
        )
        scores = frame_scores_jax(out.rgb, rgb_gt, out.depth, depth_gt, levels)
        return scores, out.rgb

    keys = ("psnr", "ssim", "ms_ssim", "depth_l1", "depth_rmse")
    reports = []
    for entry in manifest["frames"][::frame_stride]:
        rgb_gt, depth_gt, w2c = load_frame(gaussians_data_dir, entry)
        cam = make_camera(w, h, intr, w2c)
        scores, rgb_dev = score_frame(
            buf, cam, jnp.asarray(rgb_gt), jnp.asarray(depth_gt)
        )
        report = dict(zip(keys, np.asarray(scores, np.float64)))
        if want_lpips:
            value = lpips(np.clip(np.asarray(rgb_dev), 0, 1), rgb_gt)
            if value is not None:
                report["lpips"] = value
        reports.append(report)
    all_keys = reports[0].keys()
    return {k: float(np.mean([r[k] for r in reports])) for k in all_keys}
