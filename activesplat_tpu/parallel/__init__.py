"""Multi-chip scaling of the render/optimize hot path."""

from activesplat_tpu.parallel.sharded import (  # noqa: F401
    make_render_mesh,
    render_sharded,
    sharded_mapping_step,
)
