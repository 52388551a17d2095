"""Opacity pruning (off by default in the reference config, but part of the
mapper surface — slam_external.py:171-192)."""

import jax.numpy as jnp
import numpy as np

from activesplat_tpu.mapper.config import MapperConfig
from activesplat_tpu.mapper.step import prune_phase
from activesplat_tpu.models.gaussians import GaussianBuffer


def test_prune_low_opacity():
    buf = GaussianBuffer.empty(32)
    logits = np.full(32, 3.0, np.float32)
    logits[:5] = -8.0  # sigmoid ~ 3e-4 < 0.005 threshold
    buf = buf.replace(
        params=buf.params.replace(logit_opacities=jnp.asarray(logits)),
        active=buf.active.at[:20].set(True),
    )
    cfg = MapperConfig()
    buf2, removed = prune_phase(buf, cfg)
    assert int(removed) == 5
    assert int(buf2.num_active()) == 15
    # inactive slots (20+) must not be counted even though their logit is high
    assert not bool(buf2.active[25])
