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
