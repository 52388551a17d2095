"""Jitted mapping computation: loss, the per-frame optimization phase, and
silhouette-driven densification.

TPU-first structure: one `mapping_phase` call runs the *entire* per-frame
optimization (keyframe selection, N Adam iterations with on-device keyframe
gathers, bookkeeping) as a single compiled program with a `lax.scan` over
iterations — where the reference loops in python dispatching CUDA kernels per
iteration (splatam/__init__.py:445-497).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from activesplat_tpu.mapper.adam import AdamState, adam_update, lr_pytree
from activesplat_tpu.mapper.config import MapperConfig
from activesplat_tpu.mapper.geometry import gaussians_from_rgbd
from activesplat_tpu.mapper.keyframes import KeyframeStore
from activesplat_tpu.models.gaussians import (
    Camera,
    GaussianBuffer,
    GaussianParams,
    insert_gaussians,
)
from activesplat_tpu.ops.render import render
from activesplat_tpu.ops.ssim import psnr, ssim


class LossAux(NamedTuple):
    rgb_l1: jnp.ndarray
    depth_l1: jnp.ndarray
    ssim: jnp.ndarray
    radii: jnp.ndarray
    psnr: jnp.ndarray
    dropped: jnp.ndarray  # tile memberships cut by the k_per_tile cap


def mapping_loss(
    params,
    buf: GaussianBuffer,
    cam: Camera,
    im_gt: jnp.ndarray,  # (H, W, 3)
    depth_gt: jnp.ndarray,  # (H, W)
    cfg: MapperConfig,
) -> Tuple[jnp.ndarray, LossAux]:
    """Mapping loss (get_loss semantics for mapping=True, splatam.py:172-301):
    masked mean depth L1 + (0.8 L1 + 0.2 (1-SSIM)) RGB, black background.

    One fused render supplies rgb/depth/silhouette (the reference issues two
    rasterizer passes, splatam.py:208-212).
    """
    from activesplat_tpu.ops.render import forward_backend

    # the Pallas blend has an analytic custom VJP, so the training render can
    # use it too (resolved at trace time; XLA blend on CPU). exact_training
    # "on" swaps in the differentiable CSR exact rasterizer — uncapped
    # compositing with zero k-truncation gradient bias (see MapperConfig).
    out = render(
        buf.replace(params=params),
        cam,
        chunk=cfg.chunk,
        k_per_tile=cfg.k_per_tile,
        backend=forward_backend() if cfg.k_per_tile else "xla",
        grad_exact=(
            "hybrid"
            if (cfg.k_per_tile and cfg.exact_training == "hybrid")
            else bool(cfg.k_per_tile) and cfg.exact_training == "on"
        ),
    )

    mask = depth_gt > 0
    if cfg.ignore_outlier_depth_loss:
        depth_error = jnp.abs(depth_gt - out.depth) * mask
        mask = mask & (depth_error < 10.0 * jnp.median(depth_error))
    if cfg.use_sil_for_loss:
        mask = mask & (out.alpha > cfg.sil_thres)
    mask = jax.lax.stop_gradient(mask)

    depth_l1 = jnp.sum(jnp.abs(depth_gt - out.depth) * mask) / jnp.maximum(
        jnp.sum(mask), 1.0
    )
    rgb_l1 = jnp.mean(jnp.abs(out.rgb - im_gt))
    ssim_val = ssim(out.rgb, im_gt)
    loss_im = 0.8 * rgb_l1 + 0.2 * (1.0 - ssim_val)
    loss = cfg.loss_w_im * loss_im + cfg.loss_w_depth * depth_l1
    aux = LossAux(
        rgb_l1=rgb_l1,
        depth_l1=depth_l1,
        ssim=ssim_val,
        radii=out.radii,
        psnr=psnr(out.rgb, im_gt),
        dropped=out.dropped,
    )
    return loss, aux


def mapping_loss_with_tap(
    params,
    tap: jnp.ndarray,  # (C, 2) zeros — gradient tap on projected means
    buf: GaussianBuffer,
    cam: Camera,
    im_gt: jnp.ndarray,
    depth_gt: jnp.ndarray,
    cfg: MapperConfig,
) -> Tuple[jnp.ndarray, LossAux]:
    """mapping_loss with an explicit mean2d gradient tap: differentiating
    with respect to `tap` yields dLoss/d(mean2d) — the densification signal
    the reference captures via rendervar['means2D'].retain_grad()
    (splatam.py:207-209, accumulated by slam_external.py:100-108)."""
    from activesplat_tpu.ops.projection import project_gaussians
    from activesplat_tpu.ops.render import render_projected

    p = params
    active = buf.active
    proj = project_gaussians(
        p.means3d, p.quats, p.log_scales, active,
        cam.w2c, cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
        near=cam.near, far=cam.far,
    )
    proj = proj._replace(mean2d=proj.mean2d + tap)
    out = render_projected(
        proj,
        p.rgb,
        jax.nn.sigmoid(p.logit_opacities),
        cam,
        chunk=cfg.chunk,
        k_per_tile=cfg.k_per_tile,
        grad_exact=(
            "hybrid"
            if (cfg.k_per_tile and cfg.exact_training == "hybrid")
            else bool(cfg.k_per_tile) and cfg.exact_training == "on"
        ),
    )
    mask = jax.lax.stop_gradient(depth_gt > 0)
    depth_l1 = jnp.sum(jnp.abs(depth_gt - out.depth) * mask) / jnp.maximum(
        jnp.sum(mask), 1.0
    )
    rgb_l1 = jnp.mean(jnp.abs(out.rgb - im_gt))
    ssim_val = ssim(out.rgb, im_gt)
    loss = cfg.loss_w_im * (0.8 * rgb_l1 + 0.2 * (1.0 - ssim_val)) + (
        cfg.loss_w_depth * depth_l1
    )
    aux = LossAux(
        rgb_l1, depth_l1, ssim_val, out.radii, psnr(out.rgb, im_gt), out.dropped
    )
    return loss, aux


@functools.partial(jax.jit, static_argnames=("cfg",))
def densify_gradient_phase(
    buf: GaussianBuffer,
    scene_radius: jnp.ndarray,
    frame_id: jnp.ndarray,
    key: jax.Array,
    cfg: MapperConfig,
):
    """Gradient-driven clone/split (densify, slam_external.py:195-247): small
    high-gradient Gaussians are cloned; big ones are split — a perturbed copy
    is inserted and the original's scale shrinks by 1.6 (net two children).
    Returns (buf, num_dropped, num_new)."""
    avg_grad = buf.grad_accum / jnp.maximum(buf.denom, 1.0)
    high = buf.active & (avg_grad > cfg.densify_grad_thresh)
    max_scale = jnp.max(jnp.exp(buf.params.log_scales), axis=-1)
    big = max_scale > cfg.densify_percent_dense * scene_radius
    clone_mask = high & ~big
    split_mask = high & big

    p = buf.params
    noise = (
        jax.random.normal(key, p.means3d.shape) * jnp.exp(p.log_scales)
    )
    cand = GaussianParams(
        means3d=jnp.where(split_mask[:, None], p.means3d + noise, p.means3d),
        rgb=p.rgb,
        quats=p.quats,
        logit_opacities=p.logit_opacities,
        log_scales=jnp.where(
            split_mask[:, None], p.log_scales - jnp.log(1.6), p.log_scales
        ),
    )
    before = buf.num_active()
    buf, dropped = insert_gaussians(buf, cand, clone_mask | split_mask, frame_id)
    # shrink the split originals (their inserted copies already are)
    buf = buf.replace(
        params=buf.params.replace(
            log_scales=jnp.where(
                split_mask[:, None],
                buf.params.log_scales - jnp.log(1.6),
                buf.params.log_scales,
            )
        )
    )
    return buf, dropped, buf.num_active() - before


def _build_window(
    store: KeyframeStore,
    selected_ids: jnp.ndarray,
    selected_valid: jnp.ndarray,
):
    """Selected overlap keyframes + last committed keyframe + current frame
    (scratch slot), compacted valid-first (splatam/__init__.py:426-436)."""
    last_id = jnp.maximum(store.count - 1, 0)
    has_last = store.count > 0
    window = jnp.concatenate(
        [
            selected_ids,
            jnp.array([0, store.scratch_slot], jnp.int32)
            .at[0]
            .set(last_id.astype(jnp.int32)),
        ]
    )
    wvalid = jnp.concatenate([selected_valid, jnp.array([False, True])])
    wvalid = wvalid.at[len(selected_ids)].set(has_last)
    order = jnp.argsort(~wvalid, stable=True)
    return window[order], jnp.sum(wvalid.astype(jnp.int32))


@functools.partial(
    jax.jit, static_argnames=("cfg", "num_iters", "mesh", "backend")
)
def mapping_phase(
    buf: GaussianBuffer,
    store: KeyframeStore,
    cur_rgb: jnp.ndarray,
    cur_depth: jnp.ndarray,
    cur_w2c: jnp.ndarray,
    cur_frame_id: jnp.ndarray,
    cam: Camera,
    key: jax.Array,
    cfg: MapperConfig,
    num_iters: int,
    mesh=None,
    backend: str = "xla",
):
    """One full per-frame mapping event. Returns
    (buf, store_with_scratch, metrics dict).

    `mesh` (a 1D jax.sharding.Mesh over axis 'px') runs the PRODUCTION
    multi-chip path: the same scan — keyframe selection, per-iteration
    on-device keyframe gathers, fresh Adam — with every render's per-pixel
    blend sharded over whole tile rows on the mesh
    (parallel/sharded.py render_sharded_tiled; SURVEY.md section 2.3's one
    real parallelism axis). Parameters and the keyframe store stay
    replicated; parameter grads combine via the all_gather transpose
    (reduce-scatter + replicate) XLA inserts. `backend` selects the blend
    kernel under shard_map (pallas on TPU)."""
    from activesplat_tpu.mapper.keyframes import select_keyframes_overlap

    store = store.with_scratch(cur_rgb, cur_depth, cur_w2c, cur_frame_id)

    key_sel, key_iters = jax.random.split(key)
    sel_ids, sel_valid = select_keyframes_overlap(
        store,
        cur_depth,
        cur_w2c,
        cam.fx,
        cam.fy,
        cam.cx,
        cam.cy,
        key_sel,
        num_select=cfg.mapping_window_size - 2,
        pixels=cfg.kf_select_pixels,
        edge=cfg.kf_select_edge,
    )
    window, n_valid = _build_window(store, sel_ids, sel_valid)

    # Fresh optimizer per mapping event (splatam/__init__.py:440).
    opt_state = AdamState.init(buf.params)
    lrs = lr_pytree(cfg)

    if mesh is not None:
        assert not cfg.use_gs_densification, (
            "gradient-densification tap is single-device only; disable "
            "use_gs_densification (reference default) to map on a mesh"
        )
        from activesplat_tpu.parallel.sharded import sharded_mapping_loss

        def sharded_loss(params, buf_c, cam_i, im, dep, cfg):
            loss, (radii, psnr_v, depth_l1, dropped, rgb_l1, ssim_v) = (
                sharded_mapping_loss(
                    params, buf_c, cam_i, im, dep, cfg, mesh, backend
                )
            )
            aux = LossAux(
                rgb_l1=rgb_l1, depth_l1=depth_l1,
                ssim=ssim_v, radii=radii, psnr=psnr_v,
                dropped=dropped,
            )
            return loss, aux

        grad_fn = jax.value_and_grad(sharded_loss, has_aux=True)
    else:
        grad_fn = jax.value_and_grad(mapping_loss, has_aux=True)
    grad_fn_tap = jax.value_and_grad(mapping_loss_with_tap, argnums=(0, 1), has_aux=True)

    def body(carry, it_key):
        buf_c, opt_c = carry
        idx = window[jax.random.randint(it_key, (), 0, jnp.maximum(n_valid, 1))]
        im = store.rgb[idx]
        dep = store.depth[idx]
        cam_i = dataclasses.replace(cam, w2c=store.w2c[idx])
        if cfg.use_gs_densification:
            tap = jnp.zeros_like(buf_c.params.means3d[:, :2])
            (loss, aux), (grads, g_tap) = grad_fn_tap(
                buf_c.params, tap, buf_c, cam_i, im, dep, cfg
            )
        else:
            (loss, aux), grads = grad_fn(buf_c.params, buf_c, cam_i, im, dep, cfg)
        new_params, opt_n = adam_update(
            buf_c.params, grads, opt_c, lrs, cfg.adam_b1, cfg.adam_b2, cfg.adam_eps
        )
        seen = aux.radii > 0
        buf_n = buf_c.replace(
            params=new_params,
            max_radius=jnp.where(
                seen, jnp.maximum(buf_c.max_radius, aux.radii), buf_c.max_radius
            ),
        )
        if cfg.use_gs_densification:
            # accumulate_mean2d_gradient (slam_external.py:100-108)
            buf_n = buf_n.replace(
                grad_accum=buf_n.grad_accum
                + jnp.where(seen, jnp.linalg.norm(g_tap, axis=-1), 0.0),
                denom=buf_n.denom + seen.astype(jnp.float32),
            )
        return (buf_n, opt_n), (
            loss, aux.psnr, aux.depth_l1, aux.dropped, aux.rgb_l1, aux.ssim
        )

    keys = jax.random.split(key_iters, num_iters)
    (buf, _), (losses, psnrs, depth_l1s, droppeds, rgb_l1s, ssims) = (
        jax.lax.scan(body, (buf, opt_state), keys)
    )
    metrics = {
        "loss": losses,
        "psnr": psnrs,
        "depth_l1": depth_l1s,
        "dropped": droppeds,
        "rgb_l1": rgb_l1s,
        "ssim": ssims,
        "num_window": n_valid,
        # last-iter scalars + max dropped packed into ONE array: the mapper's
        # per-frame bookkeeping fetches this single leaf instead of paying
        # one ~1 ms relay roundtrip per metric
        "packed": jnp.stack(
            [
                losses[-1],
                psnrs[-1],
                depth_l1s[-1],
                jnp.max(droppeds).astype(jnp.float32),
                rgb_l1s[-1],
                ssims[-1],
            ]
        ),
    }
    return buf, store, metrics


@functools.partial(jax.jit, static_argnames=("cfg",))
def mapping_iteration(
    buf: GaussianBuffer,
    opt_state: AdamState,
    cam: Camera,
    im_gt: jnp.ndarray,
    depth_gt: jnp.ndarray,
    cfg: MapperConfig,
):
    """One standalone optimization iteration (render + loss + backward +
    Adam) — the unit the reference times as 'Average Mapping/Iteration Time'
    (splatam/__init__.py:545-552). Used by bench.py and ad-hoc fitting."""
    grad_fn = jax.value_and_grad(mapping_loss, has_aux=True)
    (loss, aux), grads = grad_fn(buf.params, buf, cam, im_gt, depth_gt, cfg)
    new_params, opt_state = adam_update(
        buf.params, grads, opt_state, lr_pytree(cfg), cfg.adam_b1, cfg.adam_b2, cfg.adam_eps
    )
    seen = aux.radii > 0
    buf = buf.replace(
        params=new_params,
        max_radius=jnp.where(
            seen, jnp.maximum(buf.max_radius, aux.radii), buf.max_radius
        ),
    )
    return buf, opt_state, {
        "loss": loss,
        "psnr": aux.psnr,
        "depth_l1": aux.depth_l1,
        "dropped": aux.dropped,
    }


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "backend"))
def densify_phase(
    buf: GaussianBuffer,
    cam: Camera,  # w2c = current frame
    rgb: jnp.ndarray,
    depth_gt: jnp.ndarray,
    frame_id: jnp.ndarray,
    cfg: MapperConfig,
    mesh=None,
    backend: Optional[str] = None,
):
    """Silhouette/depth-error densification (add_new_gaussians semantics,
    splatam.py:332-379): pixels the map does not yet explain become new
    Gaussians, written into free buffer slots. Runs at the densification
    resolution (cfg.densify_downscale_factor, the reference's
    densification_image_width/height, splatam/__init__.py:135-136,361-375),
    which also bounds Gaussian-count growth. With `mesh`, the silhouette
    render's blend shards over the mesh like mapping_phase (candidate
    backprojection + masked insertion are O(pixels)/O(capacity) elementwise
    and stay replicated). `backend` selects the tiled blend in BOTH branches
    (None = the platform default, forward_backend()).
    Returns (buf, num_dropped, num_inserted)."""
    from activesplat_tpu.ops.render import forward_backend

    if backend is None:
        backend = forward_backend()

    f = max(int(cfg.densify_downscale_factor), 1)
    if f > 1:
        cam = dataclasses.replace(
            cam,
            width=cam.width // f,
            height=cam.height // f,
            fx=cam.fx / f,
            fy=cam.fy / f,
            cx=cam.cx / f,
            cy=cam.cy / f,
        )
        rgb = rgb[:: f, :: f][: cam.height, : cam.width]
        depth_gt = depth_gt[:: f, :: f][: cam.height, : cam.width]

    # exact (uncapped multi-pass) compositing: a k-truncated silhouette reads
    # falsely low on dense unconverged tiles, which makes this very function
    # re-add already-present surfaces every map frame — runaway densification
    if mesh is not None and cfg.k_per_tile > 0:
        from activesplat_tpu.parallel.sharded import render_sharded_tiled

        _, out_depth, sil, _, _ = render_sharded_tiled(
            buf, cam, mesh, k_per_tile=cfg.k_per_tile, backend=backend,
            exact=True,
        )
    else:
        out = render(
            buf,
            cam,
            chunk=cfg.chunk,
            k_per_tile=cfg.k_per_tile,
            backend=backend if cfg.k_per_tile else "xla",
            exact=cfg.k_per_tile > 0,
        )
        sil = out.alpha
        out_depth = out.depth
    depth_error = jnp.abs(depth_gt - out_depth) * (depth_gt > 0)
    med = jnp.median(depth_error)
    non_presence_depth = (
        (out_depth > depth_gt)
        & (depth_error > 2.0 * med)
        & (sil > cfg.sil_thres)
        & (depth_gt < cfg.new_gaussian_depth_limit)
    )
    non_presence = (sil < cfg.sil_thres) | non_presence_depth
    valid = non_presence.reshape(-1) & (depth_gt.reshape(-1) > 0)

    c2w = jnp.linalg.inv(cam.w2c)
    cand, cand_valid = gaussians_from_rgbd(
        rgb,
        depth_gt,
        cam.fx,
        cam.fy,
        cam.cx,
        cam.cy,
        c2w,
        isotropic=cfg.gaussian_distribution == "isotropic",
    )
    valid = valid & cand_valid
    before = buf.num_active()
    buf, dropped = insert_gaussians(buf, cand, valid, frame_id)
    return buf, dropped, buf.num_active() - before


@functools.partial(jax.jit, static_argnames=("cfg",))
def first_frame_phase(
    buf: GaussianBuffer,
    cam: Camera,
    rgb: jnp.ndarray,
    depth_gt: jnp.ndarray,
    cfg: MapperConfig,
):
    """Initialize the map from frame 0: one Gaussian per valid-depth pixel
    (initialize_first_timestep semantics, splatam.py:127-169)."""
    c2w = jnp.linalg.inv(cam.w2c)
    cand, valid = gaussians_from_rgbd(
        rgb,
        depth_gt,
        cam.fx,
        cam.fy,
        cam.cx,
        cam.cy,
        c2w,
        isotropic=cfg.gaussian_distribution == "isotropic",
    )
    buf, dropped = insert_gaussians(buf, cand, valid, jnp.float32(0.0))
    scene_radius = jnp.max(depth_gt) / cfg.scene_radius_depth_ratio
    return buf, dropped, scene_radius


@functools.partial(
    jax.jit, static_argnames=("opacity_threshold", "remove_big")
)
def _prune_removal(
    buf: GaussianBuffer,
    scene_radius: jnp.ndarray,
    opacity_threshold: float,
    remove_big: bool,
):
    from activesplat_tpu.models.gaussians import prune_mask

    opac = jax.nn.sigmoid(buf.params.logit_opacities)
    remove = buf.active & (opac < opacity_threshold)
    if remove_big:
        big = (
            jnp.max(jnp.exp(buf.params.log_scales), axis=-1)
            > 0.1 * scene_radius
        )
        remove = remove | (buf.active & big)
    return prune_mask(buf, remove), jnp.sum(remove.astype(jnp.int32))


@jax.jit
def _reset_opacities(buf: GaussianBuffer) -> GaussianBuffer:
    """Reset every active Gaussian's opacity to 0.01 (inverse-sigmoid logit;
    slam_external.py:188-190). Adam moments for the opacity group are fresh
    at the next mapping event (per-event optimizer, splatam/__init__.py:440),
    mirroring the reference's zeroed optimizer state on param swap."""
    new_logit = jnp.log(0.01 / (1.0 - 0.01))
    p = buf.params
    return buf.replace(
        params=p.replace(
            logit_opacities=jnp.where(
                buf.active, jnp.full_like(p.logit_opacities, new_logit),
                p.logit_opacities,
            )
        )
    )


def prune_phase(
    buf: GaussianBuffer,
    cfg: MapperConfig,
    iteration: int = 0,
    scene_radius: float = float("inf"),
):
    """Full prune_gaussians parity (slam_external.py:171-192): schedule-gated
    low-opacity removal (final threshold at stop_after), too-big-vs-scene-
    radius removal after remove_big_after, and periodic opacity reset.
    `iteration` is the per-mapping-event iteration index (the reference's
    `iter` loop variable, splatam/__init__.py:473-477).

    Deviation from the reference: removal fires *between* optimization
    iterations (the reference removes mid-iteration, after backward and
    before the Adam step) — the set of removed Gaussians at each fire point
    is identical."""
    pd = cfg.prune
    n_removed = jnp.int32(0)
    if pd.removal_fires(iteration):
        thresh = (
            pd.final_removal_opacity_threshold
            if iteration == pd.stop_after
            else pd.removal_opacity_threshold
        )
        buf, n_removed = _prune_removal(
            buf,
            jnp.float32(scene_radius),
            float(thresh),
            iteration >= pd.remove_big_after,
        )
    if pd.reset_fires(iteration):
        buf = _reset_opacities(buf)
    return buf, n_removed


# Count each dispatch of the per-frame phases against the active tracing
# stage (utils/tracing.py IO counters): the axon relay charges ~1 ms per
# dispatch, so a stage's wall clock decomposes as jit + eager + fetch counts.
from activesplat_tpu.utils.tracing import counted_jit as _counted_jit

mapping_phase = _counted_jit(mapping_phase)
densify_phase = _counted_jit(densify_phase)
first_frame_phase = _counted_jit(first_frame_phase)
densify_gradient_phase = _counted_jit(densify_gradient_phase)
mapping_iteration = _counted_jit(mapping_iteration)
