"""Evaluation judges: coverage replay + quality metrics."""

import os

import numpy as np

from activesplat_tpu.eval.metrics import (
    ate_rmse,
    depth_metrics,
    ms_ssim,
    psnr,
    ssim,
)
from activesplat_tpu.eval.replay import eval_actions
from activesplat_tpu.runtime.dataloader import RGBDSensor, SimAction, SyntheticDataset
from activesplat_tpu.runtime.synthetic import BoxWorld


def test_metrics_identity(rng):
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    assert psnr(img, img) > 60
    assert abs(ssim(img, img) - 1.0) < 1e-5
    assert ms_ssim(img, img, levels=2) > 0.999
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1).astype(np.float32)
    assert psnr(img, noisy) < 30
    assert ssim(img, noisy) < 0.98


def _np_gauss_window(k=11, sigma=1.5):
    xs = np.arange(k) - k // 2
    g = np.exp(-(xs**2) / (2 * sigma**2))
    return g / g.sum()


def _np_filter_valid(img, w):
    """Independent separable VALID gaussian filter, (H, W, C)."""
    k = len(w)
    h, wd, c = img.shape
    out1 = np.zeros((h - k + 1, wd, c))
    for i in range(h - k + 1):
        out1[i] = np.tensordot(w, img[i : i + k], axes=(0, 0))
    out2 = np.zeros((h - k + 1, wd - k + 1, c))
    for j in range(wd - k + 1):
        out2[:, j] = np.tensordot(w, out1[:, j : j + k], axes=(0, 1))
    return out2


def _np_ssim_cs(a, b):
    c1, c2 = 0.01**2, 0.03**2
    w = _np_gauss_window()
    f = lambda x: _np_filter_valid(x, w)
    mua, mub = f(a), f(b)
    saa = f(a * a) - mua * mua
    sbb = f(b * b) - mub * mub
    sab = f(a * b) - mua * mub
    cs = (2 * sab + c2) / (saa + sbb + c2)
    ss = ((2 * mua * mub + c1) / (mua * mua + mub * mub + c1)) * cs
    return ss.mean(axis=(0, 1)), cs.mean(axis=(0, 1))


def test_ms_ssim_matches_reference_formula(rng):
    """2-level MS-SSIM against a hand-written numpy implementation of the
    pytorch_msssim recipe: VALID windows, contrast-structure at level 0,
    full SSIM only at the coarsest level, per-channel weighted product."""
    a = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.08, a.shape), 0, 1).astype(np.float32)

    _, cs0 = _np_ssim_cs(a, b)
    a2 = (a[::2, ::2] + a[1::2, ::2] + a[::2, 1::2] + a[1::2, 1::2]) / 4
    b2 = (b[::2, ::2] + b[1::2, ::2] + b[::2, 1::2] + b[1::2, 1::2]) / 4
    ss1, _ = _np_ssim_cs(a2, b2)
    w0, w1 = 0.0448, 0.2856
    expected = float(
        np.mean(np.maximum(cs0, 0) ** w0 * np.maximum(ss1, 0) ** w1)
    )

    got = ms_ssim(a, b, levels=2)
    np.testing.assert_allclose(got, expected, atol=2e-5)
    # distinguishable from plain SSIM and from the identity value
    assert got != ssim(a, b)


def test_depth_metrics():
    gt = np.array([[1.0, 2.0], [0.0, 3.0]])
    pred = np.array([[1.1, 2.0], [5.0, 2.5]])
    l1, rmse = depth_metrics(pred, gt)
    np.testing.assert_allclose(l1, (0.1 + 0.0 + 0.5) / 3, atol=1e-6)
    assert rmse >= l1


def test_ate_rmse_alignment():
    rng = np.random.default_rng(0)
    gt = np.tile(np.eye(4), (20, 1, 1))
    gt[:, :3, 3] = rng.uniform(-3, 3, (20, 3))
    # rigidly transformed estimate -> ATE ~ 0
    theta = 0.7
    rot = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    est = gt.copy()
    est[:, :3, 3] = gt[:, :3, 3] @ rot.T + np.array([1.0, -2.0, 0.5])
    assert ate_rmse(est, gt) < 1e-9


def make_dataset(results_dir, step_num=40):
    world = BoxWorld.single_room(seed=5)
    sensor = RGBDSensor.from_fov(32, 32, 90.0, depth_min=0.0, depth_max=10.0)
    return SyntheticDataset(
        world,
        sensor,
        step_num=step_num,
        start_position=np.array([3.0, 0.0, 3.0]),
        turn_angle_deg=30.0,
        results_dir=results_dir,
    )


def test_coverage_judge(tmp_path):
    results_dir = str(tmp_path)
    dataset = make_dataset(results_dir)
    # scripted trajectory: spin + advance
    for _ in range(12):
        dataset.step(SimAction.TURN_LEFT)
    for _ in range(20):
        dataset.step(SimAction.MOVE_FORWARD)
    dataset.close()

    replay = make_dataset(None)
    report = eval_actions(
        replay,
        os.path.join(results_dir, "actions.txt"),
        num_gt_samples=20000,
        frame_stride=2,
    )
    assert 0.0 < report.completeness < 2.0
    assert 0.0 < report.completeness_ratio <= 1.0
    assert report.accuracy < 0.2  # backprojected GT depth lies on surfaces
    np.testing.assert_allclose(report.path_length, 20 * 0.065, atol=1e-9)
    # a full spin at room center must see most of the room
    assert report.completeness_ratio > 0.1, report  # sparse 32x32 test frames

    # process-parallel path is bit-identical to serial
    par = eval_actions(
        make_dataset(None),
        os.path.join(results_dir, "actions.txt"),
        num_gt_samples=20000,
        frame_stride=2,
        workers=2,
    )
    np.testing.assert_allclose(par.completeness, report.completeness)
    np.testing.assert_allclose(
        par.completeness_ratio, report.completeness_ratio
    )
    assert par.num_observed_points == report.num_observed_points

    # union-cloud tree == the reference's per-frame trees + running min
    # (eval_actions.py:96-148): replay the same frames and score the slow way
    from scipy.spatial import cKDTree

    from activesplat_tpu.eval.replay import (
        backproject_frame,
        read_actions,
        sample_gt_surface,
    )

    slow = make_dataset(None)
    slow.reset()
    gt = sample_gt_surface(slow, 20000)
    frames = [slow.get_frame()]
    for a in read_actions(os.path.join(results_dir, "actions.txt")):
        slow.step(SimAction(a))
        frames.append(slow.get_frame())
    min_dist = np.full(len(gt), np.inf)
    for f in frames[::2]:
        pts = backproject_frame(
            f["depth"], slow.sensor.intrinsics, np.asarray(f["c2w"], np.float64)
        )[::4]
        if len(pts) == 0:
            continue
        d, _ = cKDTree(pts).query(gt, k=1)
        np.minimum(min_dist, d, out=min_dist)
    np.testing.assert_allclose(report.completeness, min_dist.mean())
    np.testing.assert_allclose(
        report.completeness_ratio, (min_dist < 0.05).mean()
    )


def test_coverage_monotone(tmp_path):
    """More exploration -> better coverage."""
    short_dir = str(tmp_path / "short")
    long_dir = str(tmp_path / "long")
    d1 = make_dataset(short_dir)
    for _ in range(3):
        d1.step(SimAction.TURN_LEFT)
    d1.close()
    d2 = make_dataset(long_dir)
    for _ in range(12):
        d2.step(SimAction.TURN_LEFT)
    d2.close()
    r1 = eval_actions(
        make_dataset(None), os.path.join(short_dir, "actions.txt"),
        num_gt_samples=10000, frame_stride=2,
    )
    r2 = eval_actions(
        make_dataset(None), os.path.join(long_dir, "actions.txt"),
        num_gt_samples=10000, frame_stride=2,
    )
    assert r2.completeness_ratio > r1.completeness_ratio


def test_ms_ssim_borderline_sizes_finite():
    """Truncating 2x downsampling shrinks borderline sizes below the 11-px
    VALID window (42 -> 20 -> 10); level selection must account for it and
    frame_report must stay finite at any size (regression: NaN ms_ssim)."""
    from activesplat_tpu.eval.metrics import frame_report, ms_ssim_levels

    assert ms_ssim_levels(42, 42) == 2  # naive 10*2^(L-1) bound says 3
    assert ms_ssim_levels(256, 256) == 5
    assert ms_ssim_levels(8, 8) == 1
    rng = np.random.default_rng(0)
    for side in (10, 21, 42, 84):
        a = rng.uniform(0, 1, (side, side, 3))
        b = np.clip(a + 0.05, 0, 1)
        d = rng.uniform(1, 3, (side, side))
        rep = frame_report(a, b, d, d)
        assert np.isfinite(rep["ms_ssim"]), (side, rep)


def test_frame_scores_jax_matches_frame_report(rng):
    """The fused device scorer must reproduce frame_report (the host path)
    on arbitrary images, including out-of-range predictions and invalid
    depth."""
    import jax.numpy as jnp

    from activesplat_tpu.eval.metrics import (
        frame_report,
        frame_scores_jax,
        ms_ssim_levels,
    )

    h = w = 48
    rgb_gt = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    rgb_pred = (rgb_gt + rng.normal(0, 0.08, rgb_gt.shape)).astype(np.float32)
    depth_gt = rng.uniform(0.5, 5.0, (h, w)).astype(np.float32)
    depth_gt[rng.uniform(size=depth_gt.shape) < 0.2] = 0.0  # invalid holes
    depth_pred = (depth_gt + rng.normal(0, 0.05, depth_gt.shape)).astype(
        np.float32
    )

    want = frame_report(rgb_pred, rgb_gt, depth_pred, depth_gt)
    got = np.asarray(
        frame_scores_jax(
            jnp.asarray(rgb_pred),
            jnp.asarray(rgb_gt),
            jnp.asarray(depth_pred),
            jnp.asarray(depth_gt),
            ms_ssim_levels(h, w),
        )
    )
    for i, key in enumerate(("psnr", "ssim", "ms_ssim", "depth_l1", "depth_rmse")):
        np.testing.assert_allclose(got[i], want[key], rtol=1e-5, atol=1e-6,
                                   err_msg=key)
