"""Host-side online mapping orchestrator.

TPU-native counterpart of the reference's SplaTAM wrapper
(src/mapper/splatam/__init__.py:55-838): frame scheduling (map_every /
kf_every), first-frame init, densification with buffer growth, the jitted
per-frame optimization phase, keyframe commits, dataset dump, and final
params.npz export. Tracking is skipped — ground-truth poses are written into
the camera trajectory, as in the reference (splatam/__init__.py:399-405).

All per-frame compute is 3 jitted device calls at most (densify, mapping
phase, keyframe commit); python only routes scheduling decisions.
"""

from __future__ import annotations

import functools
import os
import shutil
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from activesplat_tpu.io.manifest import DatasetDumper
from activesplat_tpu.io.params_io import save_params, save_params_ckpt
from activesplat_tpu.mapper import MapperState, MapperType
from activesplat_tpu.mapper.config import MapperConfig
from activesplat_tpu.mapper.keyframes import KeyframeStore
from activesplat_tpu.mapper.step import (
    densify_phase,
    first_frame_phase,
    mapping_phase,
)
from activesplat_tpu.models.gaussians import Camera, GaussianBuffer, make_camera
from activesplat_tpu.ops.render import forward_backend, render, render_jit
from activesplat_tpu.utils import OPENCV_TO_OPENGL
from activesplat_tpu.utils.tracing import fetch as tfetch
from activesplat_tpu.utils.tracing import format_stage_report, stage
from activesplat_tpu.utils.transforms import mat_to_q_pos


@jax.jit
def _frame_to_device(rgb_u8: jnp.ndarray, depth_u16: jnp.ndarray):
    """On-device dequantization of the (u8 RGB, u16-mm depth) frame transfer
    (MapperConfig.quantize_frame_transfer). One dispatch, both conversions."""
    return (
        rgb_u8.astype(jnp.float32) / 255.0,
        depth_u16.astype(jnp.float32) / 1000.0,
    )


@functools.partial(
    jax.jit, static_argnames=("chunk", "k_per_tile", "backend")
)
def _exact_online_scores(
    buf: GaussianBuffer,
    cam: Camera,
    rgb_gt: jnp.ndarray,
    depth_gt: jnp.ndarray,
    *,
    chunk: int,
    k_per_tile: int,
    backend: str,
):
    """Fused exact render + (psnr, depth_l1) for online progress metrics.

    bg=0 matches the k-truncated training render (and the reference's
    report_progress camera, recon_helpers.py:19), so psnr vs psnr_train
    isolates truncation rather than background choice. Returns two scalars —
    the whole map-frame metric costs 2 scalar fetches instead of ~1 MB of
    f32 image transfer."""
    from activesplat_tpu.ops.ssim import psnr as psnr_j

    out = render(
        buf, cam, bg=jnp.zeros(3, jnp.float32), chunk=chunk,
        k_per_tile=k_per_tile, backend=backend, exact=k_per_tile > 0,
    )
    a = jnp.clip(out.rgb, 0.0, 1.0)
    b = jnp.clip(rgb_gt.astype(jnp.float32), 0.0, 1.0)
    mask = depth_gt > 0
    n_valid = jnp.maximum(jnp.sum(mask), 1)
    l1 = jnp.sum(jnp.where(mask, jnp.abs(out.depth - depth_gt), 0.0)) / n_valid
    return jnp.stack([psnr_j(a, b), l1])  # one array -> one host fetch


from activesplat_tpu.utils.tracing import counted_jit as _counted_jit

_frame_to_device = _counted_jit(_frame_to_device)
_exact_online_scores = _counted_jit(_exact_online_scores)


class SplaTAMMapper:
    def __init__(
        self,
        cfg: MapperConfig,
        width: int,
        height: int,
        intrinsics: np.ndarray,
        step_num: int,
        results_dir: Optional[str] = None,
        depth_scale: float = 1.0,
        save_dataset: bool = True,
        save_checkpoints: bool = False,
        checkpoint_interval: int = 5,
        pano_scale: float = 1.0,
        mesh=None,
    ):
        self.pano_scale = pano_scale
        self.cfg = cfg
        self.width, self.height = int(width), int(height)
        # Production multi-chip mapping (SURVEY.md section 2.3): shard every
        # training render's blend over whole tile rows of the mesh. Built
        # here when cfg.use_mesh and >1 device is visible; an explicit
        # `mesh` argument wins.
        if mesh is None and cfg.use_mesh:
            from activesplat_tpu.parallel.sharded import mesh_for_height

            mesh = mesh_for_height(self.height)
        if mesh is not None and cfg.use_gs_densification:
            print(
                "mapper: use_gs_densification needs the single-device mean2d "
                "gradient tap — disabling the mesh"
            )
            mesh = None
        self.mesh = mesh
        # densify renders at height/downscale_factor — its own (possibly
        # smaller) mesh must divide THAT height into whole tile rows
        self._densify_mesh = None
        if mesh is not None:
            from activesplat_tpu.parallel.sharded import mesh_for_height

            f = max(int(cfg.densify_downscale_factor), 1)
            self._densify_mesh = mesh_for_height(
                self.height // f, list(mesh.devices.flat)
            )
            print(
                f"mapper: sharding renders over {mesh.shape['px']} devices "
                f"({self.height // mesh.shape['px']} rows each)"
            )
        self.intrinsics = np.asarray(intrinsics, np.float64)
        self.step_num = int(step_num)
        self.results_dir = results_dir
        self.save_checkpoints = save_checkpoints
        self.checkpoint_interval = checkpoint_interval

        # mutable scheduling knobs (set_mapper service swaps these during
        # bootstrap, visualizer.py:2236-2254)
        self.kf_every = cfg.kf_every
        self.map_every = cfg.map_every
        self.mapping_iters = cfg.mapping_iters

        self.buf = GaussianBuffer.empty(
            cfg.initial_capacity, isotropic=cfg.gaussian_distribution == "isotropic"
        )
        self.store = KeyframeStore.empty(cfg.keyframe_capacity, self.height, self.width)
        self.key = jax.random.PRNGKey(cfg.seed)

        self.tracking_idx = 0
        self.mapping_idx: Optional[int] = None
        # Bumped whenever the Gaussian buffer changes; map-query consumers
        # (get_topdown) key their render caches on it — the reference only
        # re-renders topdown maps when a fresh GaussianPacket arrives
        # (visualizer.py:926-939), not per planner tick.
        self.map_version = 0
        # Per-version change AABBs: each buffer mutation logs the AABB of the
        # mutating frame's valid-depth point cloud (a superset of where new
        # Gaussians were inserted, and a good proxy for where optimization
        # acts — the keyframe window overlaps the current view). Panorama
        # score caches use aabb_since() to skip re-scoring nodes whose
        # visible reach cannot intersect any change (mapper_node._get_opacity).
        self._change_log: List[tuple] = []  # [(version, (2,3) aabb), ...]
        self._change_log_floor = 0  # versions <= floor have been trimmed
        self._change_log_cap = 4096
        self.scene_radius: float = 1.0
        self.est_c2w: List[np.ndarray] = []
        self.gt_w2c_rel: List[np.ndarray] = []  # gradslam-convention relative w2c
        self.cam_quats: List[np.ndarray] = []  # absolute OpenCV w2c as quat/trans
        self.cam_trans: List[np.ndarray] = []
        self.keyframe_time_indices: List[int] = []
        self._first_pose_gl: Optional[np.ndarray] = None

        self._overflow_streak = 0
        self._overflow_warned_frame = -(10**9)
        # (capacity, k_per_tile) transition log: every entry past the first
        # is a full recompile of the mapping program set — the dominant
        # episode overhead on this 1-core host (VERDICT r3 weak #1). The
        # persistent compile cache amortizes repeats across runs; this log
        # makes the count auditable per episode.
        self.shape_history: List[Dict] = []
        self.mapping_iter_time_sum = 0.0
        self.mapping_iter_time_count = 0
        self.mapping_frame_time_sum = 0.0
        self.mapping_frame_time_count = 0
        self.last_metrics: Dict[str, float] = {}
        self.online_metrics: List[Dict[str, float]] = []
        from activesplat_tpu.io.metrics_log import get_tracker

        self.tracker = get_tracker(cfg.use_wandb, results_dir)
        self.high_loss_samples_pose_c2w: Optional[np.ndarray] = None

        self.dumper: Optional[DatasetDumper] = None
        if results_dir is not None:
            gdir = os.path.join(results_dir, "gaussians_data")
            if os.path.exists(os.path.join(gdir, "rgb")):
                shutil.rmtree(gdir)
            self.dumper = DatasetDumper(
                gdir,
                self.width,
                self.height,
                intrinsics[0, 0],
                intrinsics[1, 1],
                intrinsics[0, 2],
                intrinsics[1, 2],
                depth_scale=depth_scale,
                save_images=save_dataset,
            )

    # ------------------------------------------------------------------ #

    def _camera(self, w2c: np.ndarray) -> Camera:
        return make_camera(self.width, self.height, self.intrinsics, w2c)

    def _next_key(self) -> jax.Array:
        self.key, sub = jax.random.split(self.key)
        return sub

    def _check_tile_overflow(self, dropped: int, frame_id: int) -> None:
        """k_per_tile overflow escalation: the tiled rasterizer keeps only
        the k nearest splats per 16x16 tile (ops/raster_tiled.py:190-191).
        Sustained drops during *training* corrupt the silhouette channel that
        gates densification (step.py non_presence mask), so k is doubled —
        one bounded recompile per bucket, like buffer capacity growth — and
        a loud warning fires once the config ceiling is hit."""
        import dataclasses

        if dropped <= self.cfg.k_overflow_tolerance:
            self._overflow_streak = 0
            return
        self._overflow_streak += 1
        if self._overflow_streak < self.cfg.k_overflow_patience:
            return
        self._overflow_streak = 0
        # Gate checked only at would-escalate time: num_active() is a device
        # fetch, and the relay charges ~1 ms per eager roundtrip.
        if int(self.buf.num_active()) < self.cfg.k_overflow_min_active:
            return  # tiny scene: a recompile costs more than the truncation
        if self.cfg.k_per_tile >= self.cfg.k_per_tile_max:
            # the escalation ladder is exhausted. exact_training="auto" now
            # swaps the training render for the differentiable CSR exact
            # rasterizer (uncapped — the reference's dynamic-list semantics,
            # splatam.py:208-212) instead of training on at the ceiling with
            # biased gradients. One recompile, logged via shape_history.
            # Mesh-sharded training takes the same switch (each shard walks
            # its row block's CSR entries, parallel/sharded.py).
            if self.cfg.exact_training == "auto":
                print(
                    f"k_per_tile at ceiling {self.cfg.k_per_tile_max} with "
                    f"{dropped} harmful memberships dropped — switching the "
                    "training render to hybrid exact compositing "
                    "(exact_training auto -> hybrid: capped blend + CSR on "
                    "harmfully overflowing tiles only)"
                )
                self.cfg = dataclasses.replace(
                    self.cfg, exact_training="hybrid"
                )
                return
            if self.cfg.exact_training in ("on", "hybrid"):
                # training is already unbiased; under "hybrid", `dropped` is
                # the k-cap pressure telemetry (CSR recomposits those tiles)
                # and at the ceiling there is nothing left to escalate
                return
            if frame_id - self._overflow_warned_frame >= 50:
                self._overflow_warned_frame = frame_id
                print(
                    f"WARNING: tile lists overflowing ({dropped} memberships "
                    f"dropped) with k_per_tile already at the ceiling "
                    f"{self.cfg.k_per_tile_max}; dense tiles are truncating "
                    "far splats — raise MapperConfig.k_per_tile_max"
                )
            return
        new_k = min(self.cfg.k_per_tile * 2, self.cfg.k_per_tile_max)
        print(
            f"k_per_tile overflow: {dropped} tile memberships dropped for "
            f"{self.cfg.k_overflow_patience} consecutive mapping events — "
            f"escalating k_per_tile {self.cfg.k_per_tile} -> {new_k}"
        )
        self.cfg = dataclasses.replace(self.cfg, k_per_tile=new_k)

    def _grow_if_needed(self, dropped: int, headroom: int) -> bool:
        if dropped <= 0:
            return False
        needed = int(self.buf.num_active()) + dropped + headroom
        new_cap = self.buf.capacity
        while new_cap < needed and new_cap < self.cfg.max_capacity:
            new_cap *= 2
        if new_cap > self.buf.capacity:
            self.buf = self.buf.grown(new_cap)
            return True
        return False

    # ------------------------------------------------------------------ #

    def run(self, batch: Optional[Dict[str, np.ndarray]]) -> MapperState:
        """Feed one frame {rgb (H,W,3) f32, depth (H,W) f32, c2w (4,4) OpenCV,
        frame_id int}. Returns the mapper state for this frame
        (run semantics: splatam/__init__.py:139-174)."""
        if batch is None:
            return MapperState.MAPPING
        frame_id = int(batch["frame_id"])
        assert frame_id == self.tracking_idx, (
            f"frame ids must be consecutive, got {frame_id} != {self.tracking_idx}"
        )
        self.tracking_idx += 1

        if self.mapping_idx is None:
            state = MapperState.BOOTSTRAP
            self.mapping_idx = 0
        elif self.tracking_idx <= self.step_num:
            self.mapping_idx = frame_id
            state = MapperState.MAPPING
        else:
            return MapperState.IDLE

        self._mapping(batch, frame_id)
        return state

    # ------------------------------------------------------------------ #

    def _mapping(self, batch: Dict[str, np.ndarray], frame_id: int) -> None:
        t_frame = time.time()
        buf_before = self.buf  # pytree updates replace the object: identity
        # change at the end of the frame == the map changed (see map_version)
        rgb = np.asarray(batch["rgb"], np.float32)
        depth = np.asarray(batch["depth"], np.float32)
        c2w = np.asarray(batch["c2w"], np.float64)
        w2c = np.linalg.inv(c2w)
        self.est_c2w.append(c2w)

        # trajectory bookkeeping: absolute OpenCV w2c as quat/trans
        # (splatam/__init__.py:400-405), and the gradslam-convention
        # relative-to-first-frame w2c used by gt_w2c_all_frames
        # (splatam/__init__.py:333-338).
        quat, pos = mat_to_q_pos(w2c)
        self.cam_quats.append(quat)
        self.cam_trans.append(pos)
        pose_gl = OPENCV_TO_OPENGL @ w2c.T @ OPENCV_TO_OPENGL
        if self._first_pose_gl is None:
            self._first_pose_gl = pose_gl
        rel_pose = np.linalg.inv(self._first_pose_gl) @ pose_gl
        self.gt_w2c_rel.append(np.linalg.inv(rel_pose))

        if self.dumper is not None:
            self.dumper.add_frame(frame_id, rgb, depth, w2c)

        cam = self._camera(w2c)
        with stage("mapper/frame_transfer"):
            if self.cfg.quantize_frame_transfer:
                # 3x smaller host->device transfer through the ~10 MB/s
                # relay; dequantized on device in one dispatch
                rgb_j, depth_j = _frame_to_device(
                    jnp.asarray(
                        np.clip(rgb * 255.0 + 0.5, 0, 255).astype(np.uint8)
                    ),
                    jnp.asarray(
                        np.clip(np.round(depth * 1000.0), 0, 65535).astype(
                            np.uint16
                        )
                    ),
                )
            else:
                rgb_j = jnp.asarray(rgb)
                depth_j = jnp.asarray(depth)

        if frame_id == 0:
            with stage("mapper/first_frame"):
                from activesplat_tpu.utils.relay import with_retry

                def _first():
                    buf, dropped, radius = first_frame_phase(
                        self.buf, cam, rgb_j, depth_j, self.cfg
                    )
                    # fetch inside the closure so a transient fetch error
                    # retries the (pure) phase; also first device contact —
                    # the watchdog attributes relay init hangs in real time
                    return buf, int(tfetch(dropped)), radius

                self.buf, dropped, scene_radius = with_retry(
                    _first, desc="mapper/first_frame", stall_warn_s=60.0
                )
                if self._grow_if_needed(dropped, self.width * self.height):
                    self.buf, dropped, scene_radius = with_retry(
                        _first, desc="mapper/first_frame (grown)"
                    )
            self.scene_radius = float(scene_radius)

        # Scheduling (splatam/__init__.py:395-397): iters run every frame if
        # mapping_iters >= map_every, otherwise only on map frames.
        iter_per_frame = int(self.mapping_iters // self.map_every)
        if iter_per_frame == 0 and frame_id % self.map_every == 0:
            iter_per_frame = int(self.mapping_iters)

        is_map_frame = frame_id == 0 or (frame_id + 1) % self.map_every == 0

        # Densification on map frames (splatam/__init__.py:408-417).
        if is_map_frame and self.cfg.add_new_gaussians and frame_id > 0:
            from activesplat_tpu.ops.render import forward_backend

            densify_kw = dict(
                mesh=self._densify_mesh,
                backend=forward_backend() if self.cfg.k_per_tile else "xla",
            )
            with stage("mapper/densify"):
                from activesplat_tpu.utils.relay import with_retry

                # closure reads self.buf at call time: a transient relay
                # failure (compile or fetch) re-dispatches the pure phase
                # from the unchanged buffer; after a capacity growth it
                # re-densifies the grown buffer (same semantics as before)
                def _densify():
                    buf, dropped, n_new = densify_phase(
                        self.buf, cam, rgb_j, depth_j, jnp.float32(frame_id),
                        self.cfg, **densify_kw,
                    )
                    return buf, int(tfetch(dropped)), n_new

                self.buf, dropped_n, n_new = with_retry(
                    _densify, desc="mapper/densify"
                )
                if self._grow_if_needed(dropped_n, 4096):
                    self.buf, dropped_n, n_new = with_retry(
                        _densify, desc="mapper/densify (grown)"
                    )

        # Optimization phase: selection + iterations, one device program
        # (split into segments at prune-schedule fire points when pruning is
        # on; default schedule fires only at iteration 0, so the common case
        # stays a single program). Documented deviation when mid-event fire
        # points exist: each segment re-inits the Adam moments and re-draws
        # its keyframe window, where the reference keeps survivors' moments
        # across a prune (slam_external.py:143-164) — acceptable because the
        # reference also re-inits Adam every mapping event (:440) and prune
        # is off by default in both.
        if iter_per_frame > 0:
            t_iter = time.time()
            with stage("mapper/mapping_iters"):
                pd = self.cfg.prune
                fires = lambda i: self.cfg.prune_gaussians and (
                    pd.removal_fires(i) or pd.reset_fires(i)
                )
                i = 0
                while i < iter_per_frame:
                    if fires(i):
                        from activesplat_tpu.mapper.step import prune_phase

                        self.buf, _ = prune_phase(
                            self.buf, self.cfg, i, self.scene_radius
                        )
                    nxt = next(
                        (j for j in range(i + 1, iter_per_frame) if fires(j)),
                        iter_per_frame,
                    )
                    from activesplat_tpu.ops.render import forward_backend
                    from activesplat_tpu.utils.relay import with_retry

                    # seg_key drawn OUTSIDE the closure so a transient-error
                    # re-dispatch replays the identical segment
                    seg_key, seg_iters = self._next_key(), nxt - i
                    self.buf, self.store, metrics = with_retry(
                        lambda: mapping_phase(
                            self.buf,
                            self.store,
                            rgb_j,
                            depth_j,
                            jnp.asarray(w2c, jnp.float32),
                            jnp.int32(frame_id),
                            cam,
                            seg_key,
                            self.cfg,
                            seg_iters,
                            mesh=self.mesh,
                            backend=(
                                forward_backend()
                                if self.cfg.k_per_tile
                                else "xla"
                            ),
                        ),
                        desc="mapper/mapping_iters",
                    )
                    i = nxt
                from activesplat_tpu.utils.relay import with_retry

                packed = with_retry(
                    lambda: tfetch(metrics["packed"]),
                    desc="mapper/mapping_iters fetch",
                )  # ONE host fetch,
                # which also synchronizes the chain (block_until_ready is
                # unreliable through the tunneled-TPU relay, CLAUDE.md)
            dt = time.time() - t_iter
            self.mapping_iter_time_sum += dt
            self.mapping_iter_time_count += iter_per_frame
            self.last_metrics = {
                "loss": float(packed[0]),
                "psnr": float(packed[1]),
                "depth_l1": float(packed[2]),
                "dropped": int(packed[3]),
                "rgb_l1": float(packed[4]),
                "ssim": float(packed[5]),
            }
            if (
                self.cfg.exact_online_metrics
                and self.cfg.k_per_tile > 0
                and self.cfg.exact_training in ("on", "hybrid")
            ):
                # the training render is ALREADY exact (full CSR or hybrid):
                # its psnr/depth_l1 ARE the exact-online scores, so the
                # separate exact re-render program is pure overhead
                # (EPISODE_r04 warm: 112 ms x 685 calls). Record train ==
                # exact so the truncation ledger shows the bias collapse.
                self.last_metrics["psnr_train"] = self.last_metrics["psnr"]
                self.last_metrics["depth_l1_train"] = self.last_metrics[
                    "depth_l1"
                ]
            elif self.cfg.exact_online_metrics and self.cfg.k_per_tile > 0:
                # Honest progress numbers: the k-truncated training render
                # reads low once dense tiles overflow (see MapperConfig.
                # exact_online_metrics); report from the exact render like
                # the reference's report_progress (eval_helpers.py:153-277).
                # One fused device program -> 2 scalar fetches (the separate
                # render + host metrics moved ~1 MB of f32 per map frame
                # through the ~10 MB/s relay).
                with stage("mapper/exact_online"):
                    from activesplat_tpu.utils.relay import with_retry

                    # idempotent dispatch+fetch closure: a transient relay
                    # error on the fetch re-runs the pure program (CLAUDE.md:
                    # observed FAILED_PRECONDITION on a first value fetch)
                    ex = with_retry(
                        lambda: tfetch(
                            _exact_online_scores(
                                self.buf, cam, rgb_j, depth_j,
                                chunk=self.cfg.chunk,
                                k_per_tile=self.cfg.k_per_tile,
                                backend=forward_backend(),
                            )
                        ),
                        desc="mapper/exact_online fetch",
                    )  # one (2,) fetch
                self.last_metrics["psnr_train"] = self.last_metrics["psnr"]
                self.last_metrics["depth_l1_train"] = self.last_metrics[
                    "depth_l1"
                ]
                self.last_metrics["psnr"] = float(ex[0])
                self.last_metrics["depth_l1"] = float(ex[1])
            self._check_tile_overflow(self.last_metrics["dropped"], frame_id)
            # online progress record (role of report_progress + the
            # online_psnr.txt summaries, eval_helpers.py:153-277, 370-402)
            self.online_metrics.append({"frame": frame_id, **self.last_metrics})
            self.tracker.log(self.last_metrics, step=frame_id)

        # Gradient-based clone/split densification (off by default, as in
        # the reference config online_habitat_sim.py:81).
        if self.cfg.use_gs_densification and is_map_frame and frame_id > 0:
            from activesplat_tpu.mapper.step import densify_gradient_phase

            self.buf, dropped, n_new = densify_gradient_phase(
                self.buf,
                jnp.float32(self.scene_radius),
                jnp.float32(frame_id),
                self._next_key(),
                self.cfg,
            )
            if self._grow_if_needed(int(dropped), 4096):
                self.buf, dropped, n_new = densify_gradient_phase(
                    self.buf,
                    jnp.float32(self.scene_radius),
                    jnp.float32(frame_id),
                    self._next_key(),
                    self.cfg,
                )

        # Keyframe commit (splatam/__init__.py:514-524).
        if (
            frame_id == 0
            or (frame_id + 1) % self.kf_every == 0
            or frame_id == self.step_num - 2
        ) and np.isfinite(w2c).all():
            self.store = self.store.committed(
                rgb_j, depth_j, jnp.asarray(w2c, jnp.float32), jnp.int32(frame_id)
            )
            self.keyframe_time_indices.append(frame_id)

        if (
            self.save_checkpoints
            and self.results_dir
            and frame_id % self.checkpoint_interval == 0
        ):
            ckpt_dir = os.path.join(self.results_dir, "gaussians_data", "checkpoints")
            self.save_checkpoint(ckpt_dir, frame_id)

        if self.buf is not buf_before:
            self.map_version += 1
            self._log_change(depth, c2w)
        shape = {
            "capacity": int(self.buf.capacity),
            "k_per_tile": int(self.cfg.k_per_tile),
            "exact_training": self.cfg.exact_training
            if self.cfg.exact_training in ("on", "hybrid")
            else False,
        }
        if not self.shape_history or {
            k: self.shape_history[-1].get(k) for k in shape
        } != shape:
            self.shape_history.append({"frame": frame_id, **shape})
        self.mapping_frame_time_sum += time.time() - t_frame
        self.mapping_frame_time_count += 1

    def _log_change(self, depth: np.ndarray, c2w: np.ndarray) -> None:
        """Record the current frame's cloud AABB against the new map_version
        (host numpy — ~1 ms at 256px, no device traffic)."""
        fx, fy = self.intrinsics[0, 0], self.intrinsics[1, 1]
        cx, cy = self.intrinsics[0, 2], self.intrinsics[1, 2]
        v, u = np.nonzero(depth > 0)
        if len(v) == 0:
            p = c2w[:3, 3][None]
        else:
            z = depth[v, u].astype(np.float64)
            x = (u - cx) / fx * z
            y = (v - cy) / fy * z
            p = np.stack([x, y, z], -1) @ c2w[:3, :3].T + c2w[:3, 3]
        self._change_log.append(
            (self.map_version, np.stack([p.min(0), p.max(0)]))
        )
        if len(self._change_log) > self._change_log_cap:
            drop = len(self._change_log) - self._change_log_cap
            self._change_log_floor = self._change_log[drop - 1][0]
            del self._change_log[:drop]

    def boxes_since(self, version: int) -> Optional[np.ndarray]:
        """(M, 2, 3) per-frame change AABBs with map_version > `version`, or
        None when unknowable (changes that old were trimmed from the log).
        M == 0 means the map has not changed.

        Kept per-box rather than unioned: each box is one frame's observed
        cloud (localized), but the union over the ~10²-version gap between
        SELECT_TARGET ticks covers most of a small scene, which made the
        round-4 cold episode's reach cache score 0 hits in 192 lookups."""
        if version < self._change_log_floor:
            return None
        boxes = [b for v, b in self._change_log if v > version]
        return np.stack(boxes) if boxes else np.zeros((0, 2, 3))

    def aabb_since(self, version: int) -> Optional[np.ndarray]:
        """Union AABB of all map changes with map_version > `version`, or
        None when unknowable (changes that old were trimmed from the log).
        An empty range returns a degenerate inverted box that intersects
        nothing."""
        boxes = self.boxes_since(version)
        if boxes is None:
            return None
        if len(boxes) == 0:
            return np.array([[np.inf] * 3, [-np.inf] * 3])
        return np.stack([boxes[:, 0].min(0), boxes[:, 1].max(0)])

    # ------------------------------------------------------------------ #

    def post_processing(self) -> Optional[str]:
        """Final export (post_processing semantics,
        splatam/__init__.py:544-578)."""
        self.tracker.finish()
        iters = max(self.mapping_iter_time_count, 1)
        frames = max(self.mapping_frame_time_count, 1)
        print(
            f"Average Mapping/Iteration Time: {self.mapping_iter_time_sum / iters * 1000:.2f} ms"
        )
        print(f"Average Mapping/Frame Time: {self.mapping_frame_time_sum / frames:.4f} s")
        print("Stage timing (host wall-clock; device-accurate numbers come "
              "from ACTIVESPLAT_TRACE_DIR profiles):")
        print(format_stage_report())
        if self.results_dir is None:
            return None
        t = len(self.cam_quats)
        cam_unnorm_rots = np.stack(self.cam_quats, -1)[None]  # (1, 4, T)
        cam_trans = np.stack(self.cam_trans, -1)[None]  # (1, 3, T)
        out_dir = os.path.join(self.results_dir, "gaussians_data")
        path = save_params(
            out_dir,
            self.buf,
            cam_unnorm_rots,
            cam_trans,
            self.intrinsics,
            np.eye(4, dtype=np.float32),
            self.width,
            self.height,
            np.stack(self.gt_w2c_rel, 0) if t else np.zeros((0, 4, 4)),
            np.array(self.keyframe_time_indices),
        )
        if self.dumper is not None:
            self.dumper.write()
        # keyframe RGB|depth side-by-side dumps (save_keyframes role,
        # common_utils.py:46-59)
        kf_dir = os.path.join(out_dir, "keyframes")
        os.makedirs(kf_dir, exist_ok=True)
        import cv2

        count = int(self.store.count)
        for slot in range(count):
            fid = int(self.store.frame_id[slot])
            rgb_u8 = (
                np.clip(np.asarray(self.store.rgb[slot]), 0, 1) * 255
            ).astype(np.uint8)
            dep = np.asarray(self.store.depth[slot])
            top = dep.max() if dep.max() > 0 else 1.0
            dep_u8 = cv2.applyColorMap(
                np.clip(dep / top * 255, 0, 255).astype(np.uint8),
                cv2.COLORMAP_JET,
            )
            side = np.hstack([cv2.cvtColor(rgb_u8, cv2.COLOR_RGB2BGR), dep_u8])
            cv2.imwrite(os.path.join(kf_dir, f"{fid:04d}.png"), side)

        if self.online_metrics:
            with open(os.path.join(out_dir, "online_psnr.txt"), "w") as fh:
                fh.writelines(f"{m['psnr']}\n" for m in self.online_metrics)
            with open(os.path.join(out_dir, "online_depth_l1.txt"), "w") as fh:
                fh.writelines(f"{m['depth_l1']}\n" for m in self.online_metrics)
        print("Saved SplaTAM results to:", out_dir)
        return path

    def save_checkpoint(self, ckpt_dir: str, frame_id: int) -> str:
        """Full mid-run checkpoint: the reference's params{t}.npz +
        keyframe_time_indices{t}.npy layout (common_utils.py:61-68,
        splatam/__init__.py:526-530) plus a mapper_state{t}.npz carrying the
        keyframe store, trajectory bookkeeping, scene radius and PRNG key —
        everything kill-and-resume needs (the reference declares a
        load_checkpoint knob but never wires it; here it round-trips)."""
        path = save_params_ckpt(ckpt_dir, self.buf, frame_id)
        np.save(
            os.path.join(ckpt_dir, f"keyframe_time_indices{frame_id}.npy"),
            np.array(self.keyframe_time_indices),
        )
        count = int(self.store.count)
        np.savez(
            os.path.join(ckpt_dir, f"mapper_state{frame_id}.npz"),
            kf_rgb=np.asarray(self.store.rgb[:count]),
            kf_depth=np.asarray(self.store.depth[:count]),
            kf_w2c=np.asarray(self.store.w2c[:count]),
            kf_frame_id=np.asarray(self.store.frame_id[:count]),
            est_c2w=np.asarray(self.est_c2w),
            gt_w2c_rel=np.asarray(self.gt_w2c_rel),
            cam_quats=np.asarray(self.cam_quats),
            cam_trans=np.asarray(self.cam_trans),
            keyframe_time_indices=np.array(self.keyframe_time_indices),
            scene_radius=np.float64(self.scene_radius),
            tracking_idx=np.int64(self.tracking_idx),
            mapping_idx=np.int64(-1 if self.mapping_idx is None else self.mapping_idx),
            first_pose_gl=(
                np.zeros((0, 4)) if self._first_pose_gl is None else self._first_pose_gl
            ),
            rng_key=np.asarray(self.key),
        )
        return path

    def load_map(self, params_path: str, state_path: Optional[str] = None) -> None:
        """Resume from a saved params{t}.npz. With the sibling
        mapper_state{t}.npz (written by save_checkpoint; auto-discovered),
        the FULL mapper state is restored — keyframe store, trajectory,
        scene radius, schedule counters, PRNG key — so a killed episode
        continues exactly. With params only, the Gaussian buffer is restored
        and bookkeeping restarts from the next fed frame."""
        from activesplat_tpu.io.params_io import buffer_from_params, load_params

        params = load_params(params_path)
        n = params["means3D"].shape[0]
        capacity = self.cfg.initial_capacity
        while capacity < n:  # run may have grown past the initial bucket
            capacity *= 2
        self.buf = buffer_from_params(params, capacity=capacity)

        if state_path is None:
            base = os.path.basename(params_path)
            if base.startswith("params") and base.endswith(".npz"):
                candidate = os.path.join(
                    os.path.dirname(params_path),
                    f"mapper_state{base[len('params'):-len('.npz')]}.npz",
                )
                if os.path.exists(candidate):
                    state_path = candidate
        if state_path is None:
            return

        with np.load(state_path) as st:
            import jax.numpy as jnp

            count = st["kf_rgb"].shape[0]
            store = self.store
            self.store = store.replace(
                rgb=store.rgb.at[:count].set(jnp.asarray(st["kf_rgb"])),
                depth=store.depth.at[:count].set(jnp.asarray(st["kf_depth"])),
                w2c=store.w2c.at[:count].set(jnp.asarray(st["kf_w2c"])),
                frame_id=store.frame_id.at[:count].set(
                    jnp.asarray(st["kf_frame_id"])
                ),
                count=jnp.asarray(count, jnp.int32),
            )
            self.est_c2w = list(st["est_c2w"])
            self.gt_w2c_rel = list(st["gt_w2c_rel"])
            self.cam_quats = list(st["cam_quats"])
            self.cam_trans = list(st["cam_trans"])
            self.keyframe_time_indices = [
                int(x) for x in st["keyframe_time_indices"]
            ]
            self.scene_radius = float(st["scene_radius"])
            self.tracking_idx = int(st["tracking_idx"])
            mi = int(st["mapping_idx"])
            self.mapping_idx = None if mi < 0 else mi
            if st["first_pose_gl"].size:
                self._first_pose_gl = np.asarray(st["first_pose_gl"])
            self.key = jnp.asarray(st["rng_key"], jnp.uint32)

    # ------------------------------------------------------------------ #
    # map-query renders (L3): panoramic invisibility + view renders

    def render_rgbd(self, c2w: np.ndarray, scale_modifier: float = 1.0):
        """Render the map from a pose: (rgb uint8 (H,W,3), depth meters (H,W))
        (render_rgbd semantics, splatam/__init__.py:604-632; white bg for the
        color channel as in render(), splatam.py:413-434)."""
        rgb, depth = self.render_rgbd_float(
            self._camera(np.linalg.inv(c2w)), scale_modifier
        )
        return (rgb * 255).astype(np.uint8), depth

    def render_rgbd_float(
        self, cam: Camera, scale_modifier: float = 1.0, bg: float = 1.0
    ):
        """Exact render from an already-built Camera: (rgb float (H,W,3) in
        [0,1], depth meters (H,W)). Float flavor of render_rgbd for metric
        consumers. bg defaults to white (render() semantics, splatam.py:
        413-434); online-progress metrics pass bg=0.0 because the reference's
        report_progress renders with the black training background
        (eval_helpers.py:220-230 via recon_helpers.py:19)."""
        from activesplat_tpu.ops.render import forward_backend

        out = render_jit(
            self.buf,
            cam,
            bg=jnp.full((3,), bg, jnp.float32),
            scale_modifier=scale_modifier,
            chunk=self.cfg.chunk,
            k_per_tile=self.cfg.k_per_tile,
            backend=forward_backend(),
            exact=self.cfg.k_per_tile > 0,
        )
        return (
            np.clip(tfetch(out.rgb), 0.0, 1.0),
            tfetch(out.depth),
        )

    def render_view(
        self, cam: Camera, scale_modifier: float = 1.0
    ) -> Dict[str, np.ndarray]:
        """Full-channel view render for GUI/topdown consumers
        (render_o3d_image role, splatam/__init__.py:634-695). Returns dict
        with rgb (float), depth, opacity."""
        from activesplat_tpu.ops.render import forward_backend

        out = render_jit(
            self.buf,
            cam,
            bg=jnp.ones(3),
            scale_modifier=scale_modifier,
            chunk=self.cfg.chunk,
            k_per_tile=self.cfg.k_per_tile,
            backend=forward_backend(),
            exact=self.cfg.k_per_tile > 0,
        )
        return {
            "rgb": tfetch(out.rgb),
            "depth": tfetch(out.depth),
            "opacity": tfetch(out.alpha),
        }

    def get_global_invisibility(self, view_c2w: np.ndarray, node_positions):
        """Per-node (invisibility, hole volume) — one batched device call
        for all nodes (reference loops 3x2 renders per node,
        splatam/__init__.py:697-759)."""
        from activesplat_tpu.queries.panorama import global_invisibility

        return global_invisibility(
            self.buf,
            np.asarray(view_c2w),
            node_positions,
            chunk=self.cfg.chunk,
            scale=self.pano_scale,
            mesh=self.mesh,
        )

    def get_local_invisibility(
        self, view_c2w: np.ndarray, cluster_invisibility_threshold: float = 25.0
    ):
        from activesplat_tpu.queries.panorama import local_invisibility

        return local_invisibility(
            self.buf,
            np.asarray(view_c2w),
            cluster_invisibility_threshold,
            chunk=self.cfg.chunk,
            scale=self.pano_scale,
            mesh=self.mesh,
        )

    def get_high_loss_samples(
        self,
        rgb_gt: np.ndarray,
        depth_gt: np.ndarray,
        c2w: np.ndarray,
        cluster_invisibility_threshold: float = 25.0,
        hfov_deg: float = 90.0,
        vfov_deg: float = 90.0,
    ) -> Optional[np.ndarray]:
        """Reorientation target from depth-error clusters of the current view
        (get_high_loss_samples, splatam/__init__.py:185-252): pixels where the
        map renders *behind* the GT depth with high confidence are clustered;
        a rotation toward the biggest cluster is returned if > 5 deg away."""
        import cv2
        from sklearn.cluster import DBSCAN

        from activesplat_tpu.utils.transforms import rot_axis

        from activesplat_tpu.ops.render import forward_backend

        cam = self._camera(np.linalg.inv(c2w))
        from activesplat_tpu.utils.relay import with_retry

        def _render_fetch():
            out = render_jit(
                self.buf,
                cam,
                chunk=self.cfg.chunk,
                k_per_tile=self.cfg.k_per_tile,
                backend=forward_backend(),
                exact=self.cfg.k_per_tile > 0,
            )
            return tfetch(out.depth), tfetch(out.alpha)

        depth, opacity = with_retry(_render_fetch, desc="mapper/high_loss")
        depth_error = np.abs(depth - depth_gt) * (depth_gt > 0)
        mask = (depth > depth_gt) & (depth_error > 0.3) & (opacity > 0.8)
        mask_small = cv2.resize(
            mask.astype(np.uint8),
            (int(hfov_deg), int(vfov_deg)),
            interpolation=cv2.INTER_LINEAR,
        )
        points = np.column_stack(np.where(mask_small > 0))
        if len(points) == 0 or mask_small.sum() <= 20:
            return None
        labels = DBSCAN(eps=5, min_samples=10).fit_predict(points)
        centers, sums = [], []
        for label in set(labels):
            if label == -1:
                continue
            members = points[labels == label]
            total = float(mask_small[members[:, 0], members[:, 1]].sum())
            if total > cluster_invisibility_threshold:
                centers.append(members.mean(0))
                sums.append(total)
        if not sums:
            return None
        c = centers[int(np.argmax(sums))]
        h_angle = np.deg2rad(c[1] / mask_small.shape[1] * hfov_deg - hfov_deg / 2)
        v_angle = np.deg2rad(c[0] / mask_small.shape[0] * vfov_deg - vfov_deg / 2)
        if abs(h_angle) <= np.deg2rad(5) and abs(v_angle) <= np.deg2rad(5):
            return None
        pose = rot_axis(np.asarray(c2w, np.float64), "y", h_angle)
        return rot_axis(pose, "x", v_angle)

    # ------------------------------------------------------------------ #
    # knobs used by the set_mapper service (visualizer.py:2236-2254)

    def truncation_bias(self) -> Optional[Dict[str, float]]:
        """Quantify k_per_tile training-truncation bias from the online
        metric record: per map frame, exact_online_metrics stores both the
        k-truncated training render's psnr/depth_l1 (*_train) and the exact
        render's (VERDICT r3 item 3 — the CUDA reference's dynamic tile lists
        are uncapped, splatam.py:208-212, so its training loss sees every
        splat; ours drops tile memberships past k and this measures what that
        costs). psnr_delta == 0 means the cap was lossless."""
        rows = [m for m in self.online_metrics if "psnr_train" in m]
        if not rows:
            return None
        d_psnr = np.array([m["psnr"] - m["psnr_train"] for m in rows])
        d_l1 = np.array([m["depth_l1_train"] - m["depth_l1"] for m in rows])
        return {
            "frames": len(rows),
            "psnr_delta_mean": float(d_psnr.mean()),
            "psnr_delta_last100_mean": float(d_psnr[-100:].mean()),
            "psnr_delta_max": float(d_psnr.max()),
            "depth_l1_delta_mean": float(d_l1.mean()),
            "depth_l1_delta_last100_mean": float(d_l1[-100:].mean()),
        }

    def get_kf_every(self) -> int:
        return int(self.kf_every)

    def set_kf_every(self, value: int) -> None:
        self.kf_every = int(value)

    def get_map_every(self) -> int:
        return int(self.map_every)

    def set_map_every(self, value: int) -> None:
        self.map_every = int(value)

    def get_mapping_iters(self) -> int:
        return int(self.mapping_iters)

    def get_step_num(self) -> int:
        return self.step_num

    def get_mapper_type(self) -> MapperType:
        return MapperType.SplaTAM

    def num_gaussians(self) -> int:
        return int(self.buf.num_active())
