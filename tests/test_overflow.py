"""k_per_tile overflow: detection, mapper auto-escalation, and image
recovery (the CUDA reference's dynamic per-tile lists have no cap, so the
fixed-capacity TPU lists must escalate rather than silently truncate)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from activesplat_tpu.mapper.config import MapperConfig
from activesplat_tpu.mapper.splatam import SplaTAMMapper
from activesplat_tpu.models.gaussians import GaussianBuffer, GaussianParams, make_camera
from activesplat_tpu.ops.render import render
from activesplat_tpu.ops.ssim import psnr
from activesplat_tpu.runtime.synthetic import BoxWorld

W = H = 32


def make_intrinsics():
    fx = 0.5 * W / np.tan(np.deg2rad(45.0))
    return np.array([[fx, 0, W / 2 - 1], [0, fx, H / 2 - 1], [0, 0, 1]])


def dense_cluster_buffer(rng, n=600):
    """n low-opacity Gaussians packed into a ~1 m patch 2 m in front of the
    camera — hundreds overlap every central tile, so a small k cap truncates
    splats that still carry visible weight (nothing saturates)."""
    capacity = 1024
    buf = GaussianBuffer.empty(capacity)
    pts = np.column_stack(
        [
            rng.uniform(-0.5, 0.5, n),
            rng.uniform(-0.5, 0.5, n),
            rng.uniform(1.8, 2.6, n),
        ]
    ).astype(np.float32)
    params = GaussianParams(
        means3d=buf.params.means3d.at[:n].set(jnp.asarray(pts)),
        rgb=buf.params.rgb.at[:n].set(
            jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
        ),
        quats=buf.params.quats,
        logit_opacities=buf.params.logit_opacities.at[:n].set(-3.0),
        log_scales=buf.params.log_scales.at[:n].set(float(np.log(0.08))),
    )
    return buf.replace(params=params, active=buf.active.at[:n].set(True))


def test_escalated_render_recovers_dense_image(rng):
    """A dense tile truncated at k=16 visibly corrupts the image; the
    escalated k recovers the uncapped (dense-path) reference."""
    buf = dense_cluster_buffer(rng)
    cam = make_camera(W, H, make_intrinsics(), np.eye(4))
    reference = render(buf, cam, k_per_tile=0)  # dense path: every Gaussian
    capped = render(buf, cam, k_per_tile=16)
    escalated = render(buf, cam, k_per_tile=1024)
    assert int(capped.dropped) > 0
    assert int(escalated.dropped) == 0
    psnr_capped = float(psnr(capped.rgb, reference.rgb))
    psnr_escalated = float(psnr(escalated.rgb, reference.rgb))
    assert psnr_escalated > 45.0, psnr_escalated
    assert psnr_escalated > psnr_capped + 10.0, (psnr_capped, psnr_escalated)


def dim_map(mapper):
    """Force the map translucent: harmful drops are counted only in tiles
    whose kept k-list does NOT saturate (raster_tiled.py dropped docstring) —
    the first-frame init's 0.5-opacity splats saturate a 16-deep list."""
    p = mapper.buf.params
    mapper.buf = mapper.buf.replace(
        params=p.replace(
            logit_opacities=jnp.full_like(p.logit_opacities, -4.0)
        )
    )


def test_saturated_drops_are_harmless_and_uncounted(rng):
    """Overflow behind an opaque kept-list must not count as dropped — the
    truncated splats have zero blend weight, so the capped image already
    matches the dense reference. Needs EVERY pixel of every overflowing tile
    saturated: an opaque splat wall spanning the whole frustum."""
    n = 900
    capacity = 1024
    buf = GaussianBuffer.empty(capacity)
    # co-located giant opaque splats: screen sigma = 2.0/z*fx = 16px, so the
    # 16 nearest (by depth) cover every pixel of every tile with alpha
    # >= ~0.37 -> end-of-list transmittance < 2% frame-wide
    pts = np.column_stack(
        [np.zeros(n), np.zeros(n), np.linspace(1.9, 2.4, n)]
    ).astype(np.float32)
    p = buf.params
    params = GaussianParams(
        means3d=p.means3d.at[:n].set(jnp.asarray(pts)),
        rgb=p.rgb.at[:n].set(jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)),
        quats=p.quats,
        logit_opacities=p.logit_opacities.at[:n].set(4.0),
        log_scales=p.log_scales.at[:n].set(float(np.log(2.0))),
    )
    buf = buf.replace(params=params, active=buf.active.at[:n].set(True))
    cam = make_camera(W, H, make_intrinsics(), np.eye(4))
    reference = render(buf, cam, k_per_tile=0)
    capped = render(buf, cam, k_per_tile=16)
    # tiles genuinely overflow (hundreds of members vs k=16) ...
    assert int(reference.valid.sum()) == n
    # ... yet every kept list saturates, so no drop is counted as harmful
    assert int(capped.dropped) == 0
    psnr_capped = float(psnr(capped.rgb, reference.rgb))
    assert psnr_capped > 45.0, psnr_capped


def run_frames(mapper, n_frames=3, dim_after_first=True):
    world = BoxWorld.single_room(seed=0)
    intr = make_intrinsics()
    c2w = np.eye(4)
    c2w[:3, :3] = np.diag([1.0, -1.0, -1.0])
    c2w[:3, 3] = [3.0, 1.25, 3.0]
    rgb, depth = world.render(c2w, intr, W, H)
    for i in range(n_frames):
        mapper.run({"frame_id": i, "rgb": rgb, "depth": depth, "c2w": c2w})
        if i == 0 and dim_after_first:
            dim_map(mapper)


def test_mapper_escalates_k_per_tile(capsys):
    """First-frame init creates one Gaussian per pixel (256+ per 16x16 tile),
    so k_per_tile=16 overflows during training; the mapper must surface the
    counter and double k after the configured patience."""
    cfg = MapperConfig(
        initial_capacity=1 << 11,
        max_capacity=1 << 12,
        keyframe_capacity=8,
        map_every=1,
        kf_every=1,
        mapping_iters=1,
        mapping_window_size=4,
        chunk=64,
        kf_select_pixels=64,
        k_per_tile=16,
        k_per_tile_max=64,
        k_overflow_patience=2,
        k_overflow_min_active=0,  # engage escalation on this tiny scene
    )
    mapper = SplaTAMMapper(cfg, W, H, make_intrinsics(), step_num=8)
    run_frames(mapper, n_frames=3)  # frame 0 saturates (no harmful drops);
    # the dimmed map overflows harmfully on frames 1-2 -> patience met
    assert mapper.last_metrics["dropped"] > 0
    assert mapper.cfg.k_per_tile == 32  # doubled after 2 overflowing events
    out = capsys.readouterr().out
    assert "escalating k_per_tile 16 -> 32" in out


def test_mapper_warns_at_ceiling(capsys):
    """With exact_training='off' (auto would switch to CSR exact instead —
    tests/test_exact_grad.py), the at-ceiling overflow warns loudly."""
    cfg = MapperConfig(
        initial_capacity=1 << 11,
        max_capacity=1 << 12,
        keyframe_capacity=8,
        map_every=1,
        kf_every=1,
        mapping_iters=1,
        mapping_window_size=4,
        chunk=64,
        kf_select_pixels=64,
        k_per_tile=16,
        k_per_tile_max=16,  # already at the ceiling: cannot escalate
        k_overflow_patience=1,
        k_overflow_min_active=0,
        exact_training="off",
    )
    mapper = SplaTAMMapper(cfg, W, H, make_intrinsics(), step_num=8)
    run_frames(mapper, n_frames=2)
    assert mapper.cfg.k_per_tile == 16
    assert "WARNING: tile lists overflowing" in capsys.readouterr().out


def test_tiny_scene_does_not_escalate_by_default(capsys):
    """Default k_overflow_min_active keeps small scenes (tests, the multichip
    dryrun) from churning k: same overflow as test_mapper_escalates_k_per_tile
    but with the default gate — harmful drops are counted yet k stays put and
    no recompile-triggering escalation fires (VERDICT r3 weak #7)."""
    cfg = MapperConfig(
        initial_capacity=1 << 11,
        max_capacity=1 << 12,
        keyframe_capacity=8,
        map_every=1,
        kf_every=1,
        mapping_iters=1,
        mapping_window_size=4,
        chunk=64,
        kf_select_pixels=64,
        k_per_tile=16,
        k_per_tile_max=64,
        k_overflow_patience=2,
    )
    mapper = SplaTAMMapper(cfg, W, H, make_intrinsics(), step_num=8)
    run_frames(mapper, n_frames=3)
    assert mapper.last_metrics["dropped"] > 0
    assert mapper.cfg.k_per_tile == 16  # gate held: ~1k active < 8192
    assert "escalating k_per_tile" not in capsys.readouterr().out


def test_no_escalation_without_overflow():
    cfg = MapperConfig(
        initial_capacity=1 << 11,
        max_capacity=1 << 12,
        keyframe_capacity=8,
        map_every=1,
        kf_every=1,
        mapping_iters=1,
        mapping_window_size=4,
        chunk=64,
        kf_select_pixels=64,
        k_per_tile=1024,
        k_overflow_patience=1,
    )
    mapper = SplaTAMMapper(cfg, W, H, make_intrinsics(), step_num=8)
    run_frames(mapper, n_frames=1)
    assert mapper.last_metrics["dropped"] == 0
    assert mapper.cfg.k_per_tile == 1024


def test_exact_online_metrics_beat_truncated_train_psnr():
    """With harmful truncation in the training render, the online progress
    record must come from the exact (uncapped) render: psnr > psnr_train,
    and the truncated values are kept alongside (MapperConfig.
    exact_online_metrics; reference report_progress renders uncapped,
    eval_helpers.py:153-277)."""
    cfg = MapperConfig(
        initial_capacity=1 << 11,
        max_capacity=1 << 12,
        keyframe_capacity=8,
        map_every=1,
        kf_every=1,
        mapping_iters=1,
        mapping_window_size=4,
        chunk=64,
        kf_select_pixels=64,
        k_per_tile=16,
        k_per_tile_max=16,  # pinned at the ceiling: truncation persists
        k_overflow_patience=1000,
    )
    mapper = SplaTAMMapper(cfg, W, H, make_intrinsics(), step_num=8)
    run_frames(mapper, n_frames=3)
    m = mapper.last_metrics
    assert m["dropped"] > 0  # harmful truncation present
    assert "psnr_train" in m and "depth_l1_train" in m
    # the exact render composites the splats the capped training lists drop
    assert m["psnr"] > m["psnr_train"], m
    assert np.isfinite(m["depth_l1"])


def test_truncation_bias_quantified_at_ceiling():
    """The k-ceiling gradient-bias ledger (VERDICT r3 item 3): an engineered
    at-ceiling scene must report a positive psnr delta (exact beats the
    truncated training render), and a scene with ample k must report ~zero
    bias — the cap was lossless."""
    def run(k):
        cfg = MapperConfig(
            initial_capacity=1 << 11,
            max_capacity=1 << 12,
            keyframe_capacity=8,
            map_every=1,
            kf_every=1,
            mapping_iters=1,
            mapping_window_size=4,
            chunk=64,
            kf_select_pixels=64,
            k_per_tile=k,
            k_per_tile_max=k,  # pinned at the ceiling
            k_overflow_patience=1000,
        )
        mapper = SplaTAMMapper(cfg, W, H, make_intrinsics(), step_num=8)
        run_frames(mapper, n_frames=3)
        return mapper

    at_ceiling = run(16)
    bias = at_ceiling.truncation_bias()
    assert bias is not None and bias["frames"] >= 2
    assert bias["psnr_delta_mean"] > 0.5, bias  # truncation visibly biased
    ample = run(1024)
    bias_ok = ample.truncation_bias()
    # ~lossless cap: residual is compositing-order/precision noise only (the
    # exact renderer walks passes in a different reduction order)
    assert abs(bias_ok["psnr_delta_mean"]) < 0.2, bias_ok


def test_exact_online_metrics_off_keeps_training_record():
    cfg = MapperConfig(
        initial_capacity=1 << 11,
        max_capacity=1 << 12,
        keyframe_capacity=8,
        map_every=1,
        kf_every=1,
        mapping_iters=1,
        mapping_window_size=4,
        chunk=64,
        kf_select_pixels=64,
        k_per_tile=16,
        k_per_tile_max=16,
        k_overflow_patience=1000,
        exact_online_metrics=False,
    )
    mapper = SplaTAMMapper(cfg, W, H, make_intrinsics(), step_num=8)
    run_frames(mapper, n_frames=2)
    assert "psnr_train" not in mapper.last_metrics
