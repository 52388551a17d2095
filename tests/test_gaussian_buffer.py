"""GaussianBuffer slot-insertion / pruning semantics."""

import jax.numpy as jnp
import numpy as np

from activesplat_tpu.models.gaussians import (
    GaussianBuffer,
    GaussianParams,
    insert_gaussians,
    prune_mask,
)


def make_candidates(n, offset=0.0):
    return GaussianParams(
        means3d=jnp.arange(n * 3, dtype=jnp.float32).reshape(n, 3) + offset,
        rgb=jnp.full((n, 3), 0.5),
        quats=jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
        logit_opacities=jnp.zeros(n),
        log_scales=jnp.full((n, 3), -2.0),
    )


def test_insert_into_empty():
    buf = GaussianBuffer.empty(16)
    cand = make_candidates(8)
    valid = jnp.array([1, 0, 1, 1, 0, 0, 1, 1], bool)
    buf2, dropped = insert_gaussians(buf, cand, valid, 3.0)
    assert int(dropped) == 0
    assert int(buf2.num_active()) == 5
    got = np.asarray(buf2.params.means3d[np.asarray(buf2.active)])
    want = np.asarray(cand.means3d)[np.asarray(valid)]
    np.testing.assert_array_equal(np.sort(got, axis=0), np.sort(want, axis=0))
    assert np.all(np.asarray(buf2.timestep)[np.asarray(buf2.active)] == 3.0)


def test_insert_fills_free_slots_after_prune():
    buf = GaussianBuffer.empty(8)
    buf, _ = insert_gaussians(buf, make_candidates(6), jnp.ones(6, bool), 0.0)
    assert int(buf.num_active()) == 6
    # prune slots 1 and 3
    remove = jnp.zeros(8, bool).at[1].set(True).at[3].set(True)
    buf = prune_mask(buf, remove)
    assert int(buf.num_active()) == 4
    buf, dropped = insert_gaussians(buf, make_candidates(3, offset=100.0), jnp.ones(3, bool), 1.0)
    assert int(dropped) == 0
    assert int(buf.num_active()) == 7
    # freed slots 1, 3 were reused before tail slots
    assert np.asarray(buf.active)[[1, 3]].all()


def test_insert_overflow_drops():
    buf = GaussianBuffer.empty(4)
    buf, dropped = insert_gaussians(buf, make_candidates(6), jnp.ones(6, bool), 0.0)
    assert int(dropped) == 2
    assert int(buf.num_active()) == 4


def test_grow_preserves_content():
    buf = GaussianBuffer.empty(4)
    buf, _ = insert_gaussians(buf, make_candidates(4), jnp.ones(4, bool), 0.0)
    big = buf.grown(16)
    assert big.capacity == 16
    assert int(big.num_active()) == 4
    np.testing.assert_array_equal(
        np.asarray(big.params.means3d[:4]), np.asarray(buf.params.means3d)
    )
    buf2, dropped = insert_gaussians(big, make_candidates(10, offset=50.0), jnp.ones(10, bool), 1.0)
    assert int(dropped) == 0
    assert int(buf2.num_active()) == 14
