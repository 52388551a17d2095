"""Public render API: one fused multi-channel Gaussian render.

The reference issues two CUDA rasterizer calls per loss step — an RGB pass and
a depth/silhouette pass whose "colors" are (z, 1, z^2)
(splatam.py:208-212, slam_helpers.py:196-213). Here a single pass composites
the channels [r, g, b, z, z^2]; the silhouette equals the composited alpha
(the reference's all-ones channel), so one render yields everything:

    rgb        — color image (background-blended)
    depth      — alpha-composited camera-frame z of Gaussian centers
    depth_sq   — alpha-composited z^2 (depth uncertainty = depth_sq - depth^2)
    alpha      — total opacity / silhouette
    radii      — per-Gaussian screen radius (densification bookkeeping)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from activesplat_tpu.models.gaussians import Camera, GaussianBuffer
from activesplat_tpu.ops.projection import Projected, project_gaussians
from activesplat_tpu.ops.raster_xla import depth_sort, rasterize_sorted


class RenderOutput(NamedTuple):
    rgb: jnp.ndarray  # (H, W, 3)
    depth: jnp.ndarray  # (H, W)
    depth_sq: jnp.ndarray  # (H, W)
    alpha: jnp.ndarray  # (H, W)
    radii: jnp.ndarray  # (C,) in input (unsorted) order
    mean2d: jnp.ndarray  # (C, 2) in input order — the densification grad tap
    valid: jnp.ndarray  # (C,) bool in input order
    dropped: jnp.ndarray  # () int32 — tile memberships cut by the k_per_tile
    # cap (0 on the dense path). The CUDA reference has no such cap (dynamic
    # lists); sustained nonzero means k_per_tile must rise (the mapper
    # auto-escalates, mapper/splatam.py).


def forward_backend() -> str:
    """Blend backend for forward-only (no-gradient) renders: the fused Pallas
    kernel on TPU, the differentiable XLA blend elsewhere."""
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def render_projected(
    proj: Projected,
    rgb: jnp.ndarray,
    opacities: jnp.ndarray,
    cam: Camera,
    bg: Optional[jnp.ndarray] = None,
    chunk: int = 128,
    k_per_tile: int = 0,
    backend: str = "xla",
    exact: bool = False,
    exact_ladder: tuple = (0.5, 1.0, 2.0),
    grad_exact=False,  # False | True (full CSR) | "hybrid"
) -> RenderOutput:
    """Rasterize already-projected Gaussians (see `render` for the full path).

    Split out so callers can differentiate with respect to `proj.mean2d`
    (the means2D gradient accumulation the reference taps via retain_grad,
    splatam.py:207-209).

    k_per_tile > 0 selects the tile-binned rasterizer (ops/raster_tiled.py):
    each 16x16 tile composites only its nearest k overlapping Gaussians —
    the production path; 0 selects the dense chunked rasterizer.

    exact=True composites uncapped (multi-pass over k-windows until tiles
    saturate or exhaust — the CUDA reference's dynamic-list semantics) and is
    FORWARD-ONLY; use it for densify silhouettes, queries and eval.

    exact_ladder right-sizes the CSR entry budget per call: fractions of N
    offered as lax.switch rungs below the 4N exactness bound (see
    rasterize_tiled_exact). Small views (panoramas, frustum-culled
    perspectives) pick small rungs and skip most of the budget-sized sort/
    gather work; () pins the fixed 4N budget.

    grad_exact=True (requires k_per_tile > 0) composites exactly AND
    differentiably via the CSR blend's analytic backward (blend_csr) —
    the training path without k-truncation gradient bias, matching the
    CUDA reference's uncapped dynamic lists (reference splatam.py:208-212).
    If the view's memberships overflow the entry budget (>4N, essentially
    unreachable for frustum views), it falls back to the k-capped
    differentiable render; `dropped` then reports that path's harmful
    truncations, and stays 0 otherwise.

    grad_exact="hybrid" keeps the same exact-training semantics at a cost
    of capped + O(harmful memberships): the k-capped differentiable blend
    runs everywhere and only tiles whose truncation would actually bias the
    image/gradients are recomposited with the CSR blend
    (rasterize_tiled_hybrid). `dropped` reports the capped path's harmful
    truncations as TELEMETRY (k escalation shrinks the CSR workload) even
    though training is unbiased; on harmful-expansion budget overflow it
    falls back to the k-capped render like grad_exact=True does."""
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)

    depth_ch = proj.depth
    channels = jnp.concatenate(
        [rgb, depth_ch[:, None], (depth_ch * depth_ch)[:, None]], axis=-1
    )  # (C, 5)

    # a tile list can never exceed the gaussian count, so ceil(N/k) windows
    # make the multi-pass walk PROVABLY exact; the while_loop early-exits
    # once every overflowing tile saturates/exhausts, so the higher bound is
    # free at runtime (converged maps measured 150-220 live passes at k=256)
    exact_passes = -(-proj.mean2d.shape[0] // k_per_tile) if k_per_tile else 1

    # binning-only opacity-adaptive cull (lossless; see adaptive_cull_radius).
    # RenderOutput keeps the original 3-sigma radius/valid for densification
    # bookkeeping parity.
    if k_per_tile > 0:
        from activesplat_tpu.ops.projection import adaptive_cull_radius

        bin_radius, bin_valid = adaptive_cull_radius(
            proj.radius, proj.valid, opacities
        )
    else:
        bin_radius, bin_valid = proj.radius, proj.valid

    if k_per_tile > 0 and grad_exact == "hybrid":
        from activesplat_tpu.ops.raster_tiled import (
            rasterize_tiled,
            rasterize_tiled_hybrid,
        )

        accum0, log_t0, dropped0, csr_overflow = rasterize_tiled_hybrid(
            proj.mean2d,
            proj.conic,
            opacities,
            channels,
            bin_valid,
            bin_radius,
            proj.depth,
            width=cam.width,
            height=cam.height,
            k_per_tile=k_per_tile,
            backend=backend,
        )

        # harmful-expansion budget overflow: degrade to the k-capped
        # differentiable render (same policy as grad_exact=True)
        def _fallback_h(_):
            return rasterize_tiled(
                proj.mean2d,
                proj.conic,
                opacities,
                channels,
                bin_valid,
                bin_radius,
                proj.depth,
                width=cam.width,
                height=cam.height,
                k_per_tile=k_per_tile,
                backend=backend,
                max_passes=1,
            )

        accum, log_t, dropped = jax.lax.cond(
            csr_overflow > 0,
            _fallback_h,
            lambda _: (accum0, log_t0, dropped0),
            None,
        )
    elif k_per_tile > 0 and grad_exact:
        from activesplat_tpu.ops.raster_tiled import (
            rasterize_tiled,
            rasterize_tiled_exact,
        )

        accum0, log_t0, csr_dropped = rasterize_tiled_exact(
            proj.mean2d,
            proj.conic,
            opacities,
            channels,
            bin_valid,
            bin_radius,
            proj.depth,
            width=cam.width,
            height=cam.height,
            ladder=tuple(exact_ladder),
            interpret=jax.default_backend() != "tpu",
            differentiable=True,
        )

        # entry-budget overflow (>4N memberships — unreachable for normal
        # frustum views): degrade to the k-capped differentiable render
        # rather than training on silently truncated entries. Both branches
        # are differentiable, so AD flows through the cond.
        def _fallback(_):
            a, l, d = rasterize_tiled(
                proj.mean2d,
                proj.conic,
                opacities,
                channels,
                bin_valid,
                bin_radius,
                proj.depth,
                width=cam.width,
                height=cam.height,
                k_per_tile=k_per_tile,
                backend=backend,
                max_passes=1,
            )
            return a, l, d

        accum, log_t, dropped = jax.lax.cond(
            csr_dropped > 0,
            _fallback,
            lambda _: (accum0, log_t0, jnp.int32(0)),
            None,
        )
    elif k_per_tile > 0 and exact and backend == "pallas":
        # exact forward-only renders take the CSR single-walk path: cost is
        # O(total tile memberships) instead of the multi-pass dense walk
        # (T x k x passes), which degrades badly on converged maps whose
        # membership distribution is skewed (see rasterize_tiled_exact)
        from activesplat_tpu.ops.raster_tiled import (
            rasterize_tiled,
            rasterize_tiled_exact,
        )

        accum, log_t, dropped = rasterize_tiled_exact(
            proj.mean2d,
            proj.conic,
            opacities,
            channels,
            bin_valid,
            bin_radius,
            proj.depth,
            width=cam.width,
            height=cam.height,
            ladder=tuple(exact_ladder),
            interpret=jax.default_backend() != "tpu",
        )

        # The CSR entry budget (default 4N) is a static allocation, so a
        # view whose memberships exceed it would silently truncate the
        # deepest Gaussians. Guarantee exactness instead: when the budget
        # overflowed, discard the CSR result and run the (bounded-exact)
        # multi-pass walk. lax.cond executes the fallback only when needed,
        # so the common case stays one CSR walk.
        def _multipass(_):
            a, l, _ = rasterize_tiled(
                proj.mean2d,
                proj.conic,
                opacities,
                channels,
                bin_valid,
                bin_radius,
                proj.depth,
                width=cam.width,
                height=cam.height,
                k_per_tile=k_per_tile,
                backend=backend,
                max_passes=exact_passes,
            )
            return a, l

        accum, log_t = jax.lax.cond(
            dropped > 0, _multipass, lambda _: (accum, log_t), None
        )
        dropped = jnp.int32(0)  # both branches composite every membership
    elif k_per_tile > 0:
        from activesplat_tpu.ops.raster_tiled import rasterize_tiled

        accum, log_t, dropped = rasterize_tiled(
            proj.mean2d,
            proj.conic,
            opacities,
            channels,
            bin_valid,
            bin_radius,
            proj.depth,
            width=cam.width,
            height=cam.height,
            k_per_tile=k_per_tile,
            backend=backend,
            max_passes=exact_passes if exact else 1,
        )
    else:
        _, s_valid, s_mean2d, s_conic, s_opacity, s_channels = depth_sort(
            proj.depth, proj.valid, proj.mean2d, proj.conic, opacities, channels
        )
        accum, log_t = rasterize_sorted(
            s_mean2d,
            s_conic,
            s_opacity,
            s_channels,
            s_valid,
            width=cam.width,
            height=cam.height,
            chunk=chunk,
        )
        dropped = jnp.int32(0)  # dense path composites every Gaussian
    transmittance = jnp.exp(log_t)  # (P,)
    out_rgb = accum[:, :3] + transmittance[:, None] * bg[None, :]
    out_depth = accum[:, 3]
    out_depth_sq = accum[:, 4]
    out_alpha = 1.0 - transmittance

    hw = (cam.height, cam.width)
    return RenderOutput(
        rgb=out_rgb.reshape(hw + (3,)),
        depth=out_depth.reshape(hw),
        depth_sq=out_depth_sq.reshape(hw),
        alpha=out_alpha.reshape(hw),
        radii=proj.radius,
        mean2d=proj.mean2d,
        valid=proj.valid,
        dropped=dropped,
    )


def render(
    buf: GaussianBuffer,
    cam: Camera,
    bg: Optional[jnp.ndarray] = None,
    scale_modifier: float = 1.0,
    chunk: int = 128,
    active_override: Optional[jnp.ndarray] = None,
    k_per_tile: int = 0,
    backend: str = "xla",
    exact: bool = False,
    exact_ladder: tuple = (0.5, 1.0, 2.0),
    grad_exact=False,  # False | True (full CSR) | "hybrid"
) -> RenderOutput:
    """Render the Gaussian map into `cam`. Differentiable in all parameters.

    `active_override` lets queries render a subset (e.g. the reference's
    timestep filter, splatam.py:436-446, or height slicing,
    visualizer.py:2277-2286) without reshaping buffers.
    """
    params = buf.params
    active = buf.active if active_override is None else (buf.active & active_override)
    proj = project_gaussians(
        params.means3d,
        params.quats,
        params.log_scales,
        active,
        cam.w2c,
        cam.fx,
        cam.fy,
        cam.cx,
        cam.cy,
        cam.width,
        cam.height,
        near=cam.near,
        far=cam.far,
        scale_modifier=scale_modifier,
    )
    opacities = jax.nn.sigmoid(params.logit_opacities)
    return render_projected(
        proj,
        params.rgb,
        opacities,
        cam,
        bg=bg,
        chunk=chunk,
        k_per_tile=k_per_tile,
        backend=backend,
        exact=exact,
        exact_ladder=exact_ladder,
        grad_exact=grad_exact,
    )


# Compiled entry point: Camera's width/height are pytree metadata, so one
# compilation serves all poses/intrinsics at a given resolution.
from activesplat_tpu.utils.tracing import counted_jit as _counted_jit

render_jit = _counted_jit(
    jax.jit(
        render,
        static_argnames=(
            "chunk", "k_per_tile", "backend", "exact", "exact_ladder",
            "grad_exact",
        ),
    )
)
