"""LPIPS(alex) JAX implementation vs a torch oracle built from the SAME
random weights (pretrained weights are not downloadable here; the pipeline
math is what these tests pin down).

torch is imported lazily (function scope) and conftest orders this module's
tests LAST: torch and jaxlib each bundle their own LLVM, and loading torch
before the suite's XLA:CPU compiles intermittently segfaulted the compiler
(`backend_compile_and_load`). Keeping torch out of the process until every
other module has compiled removes that interaction."""

import numpy as np
import pytest

from activesplat_tpu.eval import lpips_jax


def make_weights(rng):
    weights = {}
    c_in = 3
    for i, (k, _, _, c_out, _) in enumerate(lpips_jax.ALEX_LAYERS):
        weights[f"conv{i}_w"] = rng.normal(0, 0.1, (k, k, c_in, c_out)).astype(
            np.float32
        )
        weights[f"conv{i}_b"] = rng.normal(0, 0.1, (c_out,)).astype(np.float32)
        weights[f"lin{i}_w"] = rng.uniform(0, 1, (c_out,)).astype(np.float32)
        c_in = c_out
    return weights


def torch_lpips(img_a, img_b, weights):
    """Oracle: the exact LPIPS(alex) pipeline in torch (NCHW/OIHW)."""
    import torch
    import torch.nn as nn

    def prep(img):
        x = torch.from_numpy(np.asarray(img, np.float32)).permute(2, 0, 1)[None]
        x = x * 2.0 - 1.0
        shift = torch.tensor(lpips_jax.SHIFT).view(1, 3, 1, 1)
        scale = torch.tensor(lpips_jax.SCALE).view(1, 3, 1, 1)
        return (x - shift) / scale

    def features(x):
        taps = []
        for i, (k, stride, pad, _, pool_before) in enumerate(
            lpips_jax.ALEX_LAYERS
        ):
            if pool_before:
                x = nn.functional.max_pool2d(x, 3, stride=2)
            w = torch.from_numpy(
                weights[f"conv{i}_w"].transpose(3, 2, 0, 1).copy()
            )
            b = torch.from_numpy(weights[f"conv{i}_b"])
            x = nn.functional.conv2d(x, w, b, stride=stride, padding=pad)
            x = nn.functional.relu(x)
            taps.append(x)
        return taps

    with torch.no_grad():
        taps_a = features(prep(img_a))
        taps_b = features(prep(img_b))
        total = 0.0
        for i, (fa, fb) in enumerate(zip(taps_a, taps_b)):
            # lpips normalize_tensor: x / (||x|| + eps), eps outside the sqrt
            na = fa / (torch.sqrt((fa * fa).sum(1, keepdim=True)) + 1e-10)
            nb = fb / (torch.sqrt((fb * fb).sum(1, keepdim=True)) + 1e-10)
            diff2 = (na - nb) ** 2
            lin = torch.from_numpy(weights[f"lin{i}_w"]).view(1, -1, 1, 1)
            total += float((diff2 * lin).sum(1).mean())
    return total


@pytest.fixture(scope="module")
def weights():
    return make_weights(np.random.default_rng(3))


def test_lpips_matches_torch_oracle(weights):
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (64, 64, 3))
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1)
    ours = lpips_jax.lpips(a, b, weights=weights)
    oracle = torch_lpips(a, b, weights)
    assert ours == pytest.approx(oracle, rel=1e-4)


def test_lpips_zero_for_identical(weights):
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (64, 64, 3))
    assert lpips_jax.lpips(a, a, weights=weights) == pytest.approx(0.0, abs=1e-6)
    b = np.clip(a + 0.3, 0, 1)
    assert lpips_jax.lpips(a, b, weights=weights) > 1e-4


def test_lpips_gating_env(weights, tmp_path, monkeypatch):
    """frame_report/metrics pick up the JAX LPIPS through the env weights
    file; without it, lpips is absent (reference gates on torchmetrics)."""
    from activesplat_tpu.eval import metrics as M

    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (64, 64, 3))
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1)
    monkeypatch.delenv("ACTIVESPLAT_LPIPS_WEIGHTS", raising=False)
    assert M.lpips(a, b) is None or M.lpips(a, b) >= 0  # torchmetrics absent here
    path = str(tmp_path / "lpips_alex.npz")
    np.savez(path, **weights)
    monkeypatch.setenv("ACTIVESPLAT_LPIPS_WEIGHTS", path)
    value = M.lpips(a, b)
    assert value is not None and value > 0


def test_convert_torch_state_dict(weights):
    """Round-trip the lpips-package state_dict naming into the npz schema."""
    sd = {}
    for i in range(5):
        w = weights[f"conv{i}_w"].transpose(3, 2, 0, 1)  # back to OIHW
        sd[f"net.slice{i + 1}.0.weight"] = w
        sd[f"net.slice{i + 1}.0.bias"] = weights[f"conv{i}_b"]
        sd[f"lin{i}.model.1.weight"] = weights[f"lin{i}_w"].reshape(
            1, -1, 1, 1
        )
    out = lpips_jax.convert_torch_state_dict(sd)
    for i in range(5):
        np.testing.assert_allclose(out[f"conv{i}_w"], weights[f"conv{i}_w"])
        np.testing.assert_allclose(out[f"lin{i}_w"], weights[f"lin{i}_w"])
