"""Offline replay fit: fit a Gaussian map to a recorded gaussians_data/ dump.

First-class CLI for BASELINE config 1 (the SplaTAM offline path the reference
drives via config/splatam): read a dumped dataset
(gaussians_data/{rgb,depth,transforms.json} — the byte layout the online
mapper writes, splatam/__init__.py:281-330), run the online mapping loop over
its frames at ground-truth poses, save params.npz, and report averaged
PSNR / SSIM / depth-L1 over the fitted views.

    python -m activesplat_tpu.runtime.offline_fit \
        --data results/<run>/gaussians_data --out /tmp/fit [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, Optional

import numpy as np

from activesplat_tpu.mapper.config import MapperConfig


def fit_offline(
    gaussians_data_dir: str,
    cfg: Optional[MapperConfig] = None,
    out_dir: Optional[str] = None,
    frame_stride: int = 1,
    eval_stride: int = 1,
) -> Dict[str, float]:
    """Fit a map to every ``frame_stride``-th dumped frame and return
    averaged eval metrics (psnr / ssim / ms_ssim / depth_l1 / depth_rmse,
    plus mapping timing)."""
    from activesplat_tpu.eval.metrics import frame_report
    from activesplat_tpu.io.manifest import load_frame, load_manifest
    from activesplat_tpu.mapper.splatam import SplaTAMMapper
    from activesplat_tpu.models.gaussians import make_camera
    from activesplat_tpu.ops.render import render_jit

    manifest = load_manifest(gaussians_data_dir)
    intr = np.array(
        [
            [manifest["fl_x"], 0, manifest["cx"]],
            [0, manifest["fl_y"], manifest["cy"]],
            [0, 0, 1],
        ]
    )
    entries = manifest["frames"][::frame_stride]
    cfg = cfg or MapperConfig()
    mapper = SplaTAMMapper(
        cfg,
        manifest["w"],
        manifest["h"],
        intr,
        step_num=len(entries) + 1,
        results_dir=out_dir,
        save_dataset=False,
    )
    frames = []
    for frame_id, entry in enumerate(entries):
        rgb, depth, w2c = load_frame(gaussians_data_dir, entry)
        c2w = np.linalg.inv(w2c)
        frames.append((rgb, depth, c2w))
        mapper.run(
            {"rgb": rgb, "depth": depth, "c2w": c2w, "frame_id": frame_id}
        )

    reports = []
    for rgb_gt, depth_gt, c2w in frames[::eval_stride]:
        cam = make_camera(
            manifest["w"], manifest["h"], intr, np.linalg.inv(c2w)
        )
        out = render_jit(
            mapper.buf, cam, chunk=cfg.chunk, k_per_tile=cfg.k_per_tile
        )
        reports.append(
            frame_report(
                np.asarray(out.rgb), rgb_gt, np.asarray(out.depth), depth_gt
            )
        )
    metrics = {
        k: float(np.mean([r[k] for r in reports])) for k in reports[0]
    }
    metrics["num_frames"] = len(frames)
    metrics["num_gaussians"] = int(mapper.num_gaussians())
    metrics["avg_mapping_iter_ms"] = (
        1000.0
        * mapper.mapping_iter_time_sum
        / max(mapper.mapping_iter_time_count, 1)
    )
    if out_dir is not None:
        mapper.post_processing()
        with open(os.path.join(out_dir, "offline_fit_metrics.json"), "w") as fh:
            json.dump(metrics, fh, indent=2)
    return metrics


def main():
    parser = argparse.ArgumentParser(description="Offline gaussians_data fit")
    parser.add_argument("--data", required=True, help="gaussians_data directory")
    parser.add_argument("--out", default=None, help="output results dir")
    parser.add_argument("--iters", type=int, default=None, help="mapping iters")
    parser.add_argument("--map_every", type=int, default=1)
    parser.add_argument("--kf_every", type=int, default=5)
    parser.add_argument("--frame_stride", type=int, default=1)
    parser.add_argument("--k_per_tile", type=int, default=256)
    args = parser.parse_args()

    import dataclasses

    cfg = MapperConfig(map_every=args.map_every, kf_every=args.kf_every,
                       k_per_tile=args.k_per_tile)
    if args.iters is not None:
        cfg = dataclasses.replace(cfg, mapping_iters=args.iters)
    metrics = fit_offline(
        args.data, cfg, out_dir=args.out, frame_stride=args.frame_stride
    )
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
