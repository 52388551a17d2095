"""ActiveSplat-TPU: a TPU-native active-mapping framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of ActiveSplat
(Li-Yuetao/ActiveSplat, IEEE RA-L 2025): an agent explores an indoor scene
while building an online 3D Gaussian-splat map (SplaTAM-style, GT poses) and
a Voronoi-graph planner chooses exploration targets by querying rendered
opacity / top-down occupancy.

Layering (bottom-up), mirroring the reference's layer map (SURVEY.md section 1)
but re-designed TPU-first:

  ops/        differentiable Gaussian rasterization (chunked XLA renderer +
              Pallas TPU kernels), projection, SSIM      [replaces CUDA L0]
  models/     Gaussian map pytrees: fixed-capacity buffers + active masks
  mapper/     jitted SplaTAM-style mapping step, keyframes, densify/prune
  queries/    top-down occupancy & panorama invisibility map queries  [L3]
  planner/    host-side Voronoi planning, navigation, exploration FSM [L6]
  runtime/    in-process service/topic bus, simulator backends        [L5/L1]
  io/         params.npz / transforms.json / actions.txt writers
  eval/       action-replay coverage judge, PSNR/SSIM/depth judges    [L7]
  parallel/   device-mesh sharding of the render/step hot path
  utils/      pose/quaternion math, logging, timing
"""

__version__ = "0.1.0"


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache, on by default for TPU platforms.

    This host compiles on one CPU core: a 1M-capacity mapping program takes
    30-120 s, and an exploration episode recompiles its whole program set at
    every buffer-capacity growth and k_per_tile escalation (measured: a
    trivial jit costs 187 s cold through the TPU relay, 4.9 s with a warm
    cache). The cache amortizes those within a run (re-entering a bucket)
    and across runs/benches. Opt out with ACTIVESPLAT_NO_COMPILE_CACHE=1
    or point ACTIVESPLAT_COMPILE_CACHE at a different directory.

    CPU is deliberately NOT cached: XLA:CPU persists AOT executables whose
    recorded machine features don't round-trip on this host (the loader
    warns "could lead to execution errors such as SIGILL"), and a cached
    cross-process reload segfaulted the CPU test suite once. TPU programs
    are serialized HLO-level and don't have that hazard.
    """
    import os

    if os.environ.get("ACTIVESPLAT_NO_COMPILE_CACHE"):
        return
    # Enable only when JAX is explicitly pointed at a TPU-ish platform
    # (this environment tunnels a TPU via JAX_PLATFORMS=axon).
    platforms = os.environ.get("JAX_PLATFORMS", "").lower()
    if not any(p in platforms for p in ("tpu", "axon")):
        return
    path = os.environ.get(
        "ACTIVESPLAT_COMPILE_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "activesplat_tpu", "jax"
        ),
    )
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compile_cache()
