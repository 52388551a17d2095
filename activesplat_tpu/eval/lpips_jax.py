"""LPIPS (alex) in JAX — code-complete, weights-gated.

The reference scores NVS quality with torchmetrics'
LearnedPerceptualImagePatchSimilarity(net_type='alex', normalize=True)
(eval_helpers.py:21-22, 485-487). Pretrained AlexNet/LPIPS weights cannot be
downloaded in this environment, so — like the Habitat adapter — the metric is
fully implemented and the only external ingredient is a weights file:

    ACTIVESPLAT_LPIPS_WEIGHTS=/path/to/lpips_alex.npz

`convert_torch_state_dict` maps a torchmetrics/lpips checkpoint into that
npz once, on any machine that has the weights.

Architecture (exactly the LPIPS 'alex' pipeline):
  input [0,1] -> x*2-1 -> (x - shift)/scale   (the LPIPS ScalingLayer)
  AlexNet features with ReLU taps after conv1..conv5,
  per-tap channel-unit-normalize, squared difference, non-negative 1x1
  linear head, spatial mean, sum over the 5 taps.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# (kernel, stride, pad, out_channels, maxpool_before)
ALEX_LAYERS = (
    (11, 4, 2, 64, False),
    (5, 1, 2, 192, True),
    (3, 1, 1, 384, True),
    (3, 1, 1, 256, False),
    (3, 1, 1, 256, False),
)
SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def weights_path() -> Optional[str]:
    path = os.environ.get("ACTIVESPLAT_LPIPS_WEIGHTS")
    return path if path and os.path.exists(path) else None


# device-resident weight cache: the ~10 MB AlexNet upload must not repeat
# per evaluated frame (host->device through the relay is the slow path here)
_CACHE: Dict[str, Dict[str, jnp.ndarray]] = {}


def available() -> bool:
    return weights_path() is not None


def load_weights(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _conv(x, w, b, stride, pad):
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out + b[None, None, None, :]


def _features(x, weights):
    """AlexNet ReLU taps. x: (N, H, W, 3) already scaled."""
    taps = []
    for i, (k, stride, pad, _, pool_before) in enumerate(ALEX_LAYERS):
        if pool_before:
            x = _maxpool(x)
        x = _conv(x, weights[f"conv{i}_w"], weights[f"conv{i}_b"], stride, pad)
        x = jax.nn.relu(x)
        taps.append(x)
    return taps


@functools.partial(jax.jit, static_argnames=())
def _lpips_pair(img_a, img_b, weights):
    """img_*: (H, W, 3) in [0, 1]."""

    def prep(img):
        x = img[None] * 2.0 - 1.0
        return (x - SHIFT[None, None, None, :]) / SCALE[None, None, None, :]

    taps_a = _features(prep(img_a), weights)
    taps_b = _features(prep(img_b), weights)
    total = 0.0
    for i, (fa, fb) in enumerate(zip(taps_a, taps_b)):
        # normalize_tensor semantics: x / (||x|| + eps), eps OUTSIDE the sqrt
        # (the lpips package's util; an in-sqrt eps under-weights small-norm
        # post-ReLU positions by orders of magnitude)
        na = fa / (jnp.sqrt(jnp.sum(fa * fa, axis=-1, keepdims=True)) + 1e-10)
        nb = fb / (jnp.sqrt(jnp.sum(fb * fb, axis=-1, keepdims=True)) + 1e-10)
        diff2 = (na - nb) ** 2
        lin = weights[f"lin{i}_w"]  # (C,) non-negative 1x1 head
        total = total + jnp.mean(jnp.sum(diff2 * lin[None, None, None, :], -1))
    return total


def lpips(
    img_a: np.ndarray, img_b: np.ndarray, weights: Optional[Dict] = None
) -> Optional[float]:
    """LPIPS(alex) of two (H, W, 3) [0,1] images, or None when no weights
    are configured."""
    if weights is None:
        path = weights_path()
        if path is None:
            return None
        if path not in _CACHE:
            _CACHE[path] = {
                k: jnp.asarray(v, jnp.float32)
                for k, v in load_weights(path).items()
            }
        w = _CACHE[path]
    else:
        w = {k: jnp.asarray(v, jnp.float32) for k, v in weights.items()}
    a = jnp.clip(jnp.asarray(img_a, jnp.float32), 0.0, 1.0)
    b = jnp.clip(jnp.asarray(img_b, jnp.float32), 0.0, 1.0)
    return float(_lpips_pair(a, b, w))


def convert_torch_state_dict(state_dict) -> Dict[str, np.ndarray]:
    """Map a torchmetrics / lpips 'alex' state_dict into the npz schema.

    Handles both naming families: the lpips package's
    `net.slice{1..5}.<idx>.weight` + `lin{0..4}.model.1.weight`, and
    torchmetrics' `net.*` re-export of the same. Conv kernels convert
    OIHW -> HWIO; linear heads flatten to (C,)."""
    out: Dict[str, np.ndarray] = {}
    convs = sorted(
        (k for k in state_dict if ".weight" in k and "slice" in k),
        key=lambda k: (int(k.split("slice")[1].split(".")[0]), k),
    )
    if convs:
        for i, wk in enumerate(convs):
            w = np.asarray(state_dict[wk], np.float32)
            b = np.asarray(state_dict[wk.replace(".weight", ".bias")], np.float32)
            out[f"conv{i}_w"] = w.transpose(2, 3, 1, 0)
            out[f"conv{i}_b"] = b
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in state_dict:
                out[f"lin{i}_w"] = np.asarray(
                    state_dict[key], np.float32
                ).reshape(-1)
    missing = {f"conv{i}_{s}" for i in range(5) for s in "wb"} | {
        f"lin{i}_w" for i in range(5)
    }
    missing -= set(out)
    if missing:
        raise ValueError(f"unrecognized LPIPS checkpoint; missing {sorted(missing)}")
    return out
