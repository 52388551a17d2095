"""Per-parameter-group Adam on the Gaussian buffer.

Matches the reference's optimizer semantics (initialize_optimizer,
splatam.py:118-124: torch.optim.Adam with one LR per param group,
eps=1e-15, bias-corrected). The optimizer is re-created fresh at each
mapping event (splatam/__init__.py:440), which on TPU means: zero state —
no optimizer-state surgery is ever needed when Gaussians are added/removed
(contrast slam_external.py:111-164).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from activesplat_tpu.models.gaussians import GaussianParams


class AdamState(struct.PyTreeNode):
    count: jnp.ndarray  # () int32
    mu: GaussianParams
    nu: GaussianParams

    @staticmethod
    def init(params: GaussianParams) -> "AdamState":
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdamState(count=jnp.zeros((), jnp.int32), mu=zeros, nu=zeros)


def adam_update(
    params: GaussianParams,
    grads: GaussianParams,
    state: AdamState,
    lrs: GaussianParams,  # scalar leaves: per-group learning rates
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
):
    count = state.count + 1
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)

    mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1.0 - b2) * g * g, state.nu, grads)

    def step(p, m, v, lr):
        m_hat = m / c1
        v_hat = v / c2
        return p - lr * m_hat / (jnp.sqrt(v_hat) + eps)

    new_params = jax.tree.map(step, params, mu, nu, lrs)
    return new_params, AdamState(count=count, mu=mu, nu=nu)


def lr_pytree(cfg) -> GaussianParams:
    """Per-group LR pytree from a MapperConfig."""
    m, r, q, o, s = cfg.lr_tuple()
    return GaussianParams(
        means3d=jnp.float32(m),
        rgb=jnp.float32(r),
        quats=jnp.float32(q),
        logit_opacities=jnp.float32(o),
        log_scales=jnp.float32(s),
    )
