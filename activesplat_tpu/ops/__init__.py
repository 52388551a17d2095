"""Compute kernels: Gaussian projection + rasterization (XLA and Pallas)."""

from activesplat_tpu.ops.render import RenderOutput, render  # noqa: F401
