"""Mapper hyper-parameters.

Defaults reproduce the reference's config surface: the SplaTAM module config
(config/splatam/online_habitat_sim.py) plus the per-dataset mapper block
(config/datasets/gibson.json "mapper"). Hashable dataclass so it can be a
static jit argument.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class LearningRates:
    """Per-parameter-group Adam LRs (online_habitat_sim.py:61-69)."""

    means3d: float = 0.0001
    rgb: float = 0.0025
    quats: float = 0.001
    logit_opacities: float = 0.05
    log_scales: float = 0.001


@dataclasses.dataclass(frozen=True)
class PruneConfig:
    """prune_gaussians schedule (pruning_dict, online_habitat_sim.py:71-80;
    consumed by slam_external.py:171-192). Iteration indices count within one
    mapping event, matching the reference's per-frame `iter` loop variable."""

    start_after: int = 0
    remove_big_after: int = 0
    stop_after: int = 20
    prune_every: int = 20
    removal_opacity_threshold: float = 0.005
    final_removal_opacity_threshold: float = 0.005
    reset_opacities: bool = False
    reset_opacities_every: int = 500  # doesn't consider iter 0

    def removal_fires(self, iteration: int) -> bool:
        return (
            iteration <= self.stop_after
            and iteration >= self.start_after
            and iteration % self.prune_every == 0
        )

    def reset_fires(self, iteration: int) -> bool:
        return (
            iteration <= self.stop_after
            and self.reset_opacities
            and iteration > 0
            and iteration % self.reset_opacities_every == 0
        )


@dataclasses.dataclass(frozen=True)
class MapperConfig:
    seed: int = 0
    # scheduling (gibson.json mapper block)
    map_every: int = 5
    kf_every: int = 5
    mapping_window_size: int = 12
    mapping_iters: int = 2
    # losses (online_habitat_sim.py mapping block)
    loss_w_im: float = 0.5
    loss_w_depth: float = 1.0
    sil_thres: float = 0.98
    use_sil_for_loss: bool = False
    ignore_outlier_depth_loss: bool = False
    lrs: LearningRates = LearningRates()
    # experiment tracking (use_wandb, online_habitat_sim.py:14; falls back
    # to a metrics.jsonl file tracker when wandb is not importable)
    use_wandb: bool = False
    # densification
    add_new_gaussians: bool = True
    densify_downscale_factor: int = 1
    new_gaussian_depth_limit: float = 5.0  # splatam.py:348
    # gradient-based clone/split densification (use_gaussian_splatting_
    # densification, online_habitat_sim.py:81-92 — off by default there too).
    # grad_thresh is in mean2d PIXEL units (the CUDA tap is NDC-scaled).
    use_gs_densification: bool = False
    densify_grad_thresh: float = 0.05
    densify_percent_dense: float = 0.01  # big-vs-small split threshold x scene_radius
    # pruning (prune_gaussians, online_habitat_sim.py:70 — off by default
    # there too)
    prune_gaussians: bool = False
    prune: PruneConfig = PruneConfig()
    # gaussian init
    gaussian_distribution: str = "anisotropic"
    scene_radius_depth_ratio: float = 3.0
    # buffer management (TPU-specific: fixed-capacity growth buckets)
    initial_capacity: int = 1 << 17
    max_capacity: int = 1 << 22
    keyframe_capacity: int = 512
    # rasterizer: chunk size for the dense path; k_per_tile > 0 switches to
    # the tile-binned production rasterizer (ops/raster_tiled.py)
    chunk: int = 256
    k_per_tile: int = 256
    # k_per_tile overflow policy: the CUDA reference has no per-tile cap
    # (dynamic lists), so a tile denser than k silently truncates its
    # farthest splats. When a training render drops more than
    # k_overflow_tolerance memberships for k_overflow_patience consecutive
    # mapping events, the mapper doubles k_per_tile (one bounded recompile
    # per bucket) up to k_per_tile_max; past the max it warns loudly.
    k_per_tile_max: int = 1024
    k_overflow_tolerance: int = 0
    k_overflow_patience: int = 3
    # Escalation (and its ceiling warning) only engages once the map holds at
    # least this many active Gaussians. Rationale: doubling k costs a full
    # program recompile (30-120 s on this 1-core host) that only pays off on
    # production-scale maps; tiny scenes — unit tests, the multichip dryrun,
    # smoke episodes — trip the harmful-drop counter on a handful of big
    # splats and would churn k for no quality gain (MULTICHIP_r03 doubled k
    # on a 4096-Gaussian dryrun). Hardware runs initialize one Gaussian per
    # pixel (>= 65k at 256px) and are unaffected.
    k_overflow_min_active: int = 8192
    # Exact (uncapped) TRAINING compositing: mapping/densify-tap losses render
    # through the differentiable CSR rasterizer (blend_csr's analytic Pallas
    # backward) instead of the k-truncated tile blend — zero truncation bias
    # in the gradients, the CUDA reference's uncapped dynamic-list semantics
    # (reference splatam.py:208-212) for the training path too. "off" keeps
    # the k-capped path; "on" uses the full CSR walk (O(total memberships)
    # per render — measured ~2.5x the capped cost); "hybrid" keeps the
    # capped blend everywhere and CSR-recomposites ONLY harmfully
    # overflowing tiles (rasterize_tiled_hybrid — same unbiased gradients at
    # capped + O(harmful memberships) cost); "auto" (default) starts
    # k-capped and switches to "hybrid" permanently the first time harmful
    # drops persist AT the k_per_tile_max ceiling — exactly where the old
    # path could only print a warning and train on biased gradients
    # (truncation_bias in EPISODE_r04: ~7.8 dB mean online PSNR delta).
    # NOTE mesh-sharded training maps "hybrid" to the full CSR walk (each
    # shard walks its row block's entries; the harmful-tile fold is not yet
    # sharded).
    exact_training: str = "auto"
    # Online progress PSNR/depth-L1 from an exact (uncapped) re-render of the
    # current frame rather than the k-truncated training render. The training
    # render reads up to ~8 dB low on dense maps at the k ceiling (harmful
    # truncations zero out far splats), while the reference's report_progress
    # renders with its uncapped CUDA rasterizer (eval_helpers.py:153-277).
    # Costs one forward render per mapping frame (~0.3 s at 900k Gaussians);
    # the truncated value is kept alongside as psnr_train/depth_l1_train.
    exact_online_metrics: bool = True
    # Ship frames to the device quantized — RGB as uint8, depth as uint16
    # millimeters — and convert on device. The raw f32 frame is ~1 MB at
    # 256px and the axon relay moves ~10 MB/s, so f32 transfers cost ~100 ms
    # of every mapped frame; quantized they cost ~33 ms. Both quantizations
    # are at-or-below sensor precision (Habitat RGB is uint8-native; the
    # dataset dump itself stores 16-bit mm depth, io/manifest.py).
    quantize_frame_transfer: bool = True
    # multi-chip: shard training renders over whole tile rows of a 1D device
    # mesh when >1 device is visible (parallel/sharded.py; the mapper builds
    # the largest mesh dividing the image height). Off by default: the bench
    # target is one v5e chip, and unit tests run a virtual 8-CPU mesh.
    use_mesh: bool = False
    # adam
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-15  # torch Adam eps used by the reference
    # keyframe selection
    kf_select_pixels: int = 1600
    kf_select_edge: int = 20

    def lr_tuple(self) -> Tuple[float, float, float, float, float]:
        return (
            self.lrs.means3d,
            self.lrs.rgb,
            self.lrs.quats,
            self.lrs.logit_opacities,
            self.lrs.log_scales,
        )
