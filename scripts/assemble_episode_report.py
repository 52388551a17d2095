"""Assemble EPISODE_r{N}.json from the per-run artifacts under episodes/.

Usage: python scripts/assemble_episode_report.py EPISODE_r03.json base:episodes/r03_base.json ...
Each arg is label:path; the first labeled 'headline' (or the last arg) is
surfaced at the top level for the judge, the rest ride under "runs".
"""

import json
import sys


def main():
    out_path = sys.argv[1]
    runs = {}
    note = None
    for arg in sys.argv[2:]:
        label, path = arg.split(":", 1)
        if label == "note":  # plain-text narrative file, surfaced at the top
            with open(path) as fh:
                note = fh.read().strip()
            continue
        with open(path) as fh:
            runs[label] = json.load(fh)
    headline_key = "headline" if "headline" in runs else list(runs)[-1]
    headline = runs[headline_key]
    report = {
        "headline": headline_key,
        "steps": headline["knobs"]["steps"],
        "num_gaussians": headline["num_gaussians"],
        "wall_clock_min": headline["wall_clock_min"],
        "completeness_ratio": headline["completeness_ratio"],
        "accuracy_m": headline["accuracy_m"],
        "psnr": headline["psnr"],
        "ms_ssim": headline["ms_ssim"],
        "depth_l1": headline["depth_l1"],
        "runs": runs,
    }
    if note is not None:
        report["note"] = note
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "runs"}, indent=2))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
