"""Model pytrees: the Gaussian map and its cameras."""

from activesplat_tpu.models.gaussians import (  # noqa: F401
    Camera,
    GaussianBuffer,
    GaussianParams,
    make_camera,
)
