"""Experiment-tracker hooks (the reference's optional Weights & Biases
logging: `use_wandb` knob in config/splatam/online_habitat_sim.py:14, log
calls throughout eval_helpers.py:81-108, 257-264).

Import-gated like every optional dependency here: `get_tracker()` returns a
live wandb run when the package is importable and WANDB-style logging was
requested, a JSONL file tracker as the hermetic fallback, or a no-op. The
mapper calls `tracker.log({...}, step=frame_id)` — the wandb API shape — so
swapping trackers never touches call sites.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional


class NullTracker:
    enabled = False

    def log(self, metrics: Dict[str, float], step: Optional[int] = None) -> None:
        pass

    def finish(self) -> None:
        pass


class JsonlTracker:
    """Hermetic stand-in: appends wandb-shaped log rows to metrics.jsonl."""

    enabled = True

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._fh = open(path, "a")

    def log(self, metrics: Dict[str, float], step: Optional[int] = None) -> None:
        row = dict(metrics)
        if step is not None:
            row["step"] = int(step)
        self._fh.write(json.dumps(row) + "\n")
        self._fh.flush()

    def finish(self) -> None:
        self._fh.close()


class WandbTracker:
    enabled = True

    def __init__(self, run):
        self._run = run

    def log(self, metrics: Dict[str, float], step: Optional[int] = None) -> None:
        self._run.log(metrics, step=step)

    def finish(self) -> None:
        self._run.finish()


def get_tracker(
    use_wandb: bool,
    results_dir: Optional[str],
    project: str = "activesplat_tpu",
    run_name: Optional[str] = None,
):
    """Tracker per the reference's use_wandb semantics: wandb when available,
    else a metrics.jsonl fallback in the results dir, else a no-op."""
    if not use_wandb:
        return NullTracker()
    try:
        import wandb  # optional; absent in this image

        return WandbTracker(wandb.init(project=project, name=run_name))
    except Exception:
        if results_dir:
            return JsonlTracker(os.path.join(results_dir, "metrics.jsonl"))
        return NullTracker()
