"""Pallas fused tile-blend kernel vs the XLA blend (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from activesplat_tpu.ops.raster_pallas import N_ATTR, PX, TILE, blend_tiles_pallas
from activesplat_tpu.ops.raster_tiled import _blend_tile


def make_tile_data(rng, t, k, w=64, h=48):
    data = np.zeros((t, k, N_ATTR), np.float32)
    data[:, :, 0] = rng.uniform(0, w, (t, k))
    data[:, :, 1] = rng.uniform(0, h, (t, k))
    data[:, :, 2] = rng.uniform(0.05, 0.6, (t, k))
    data[:, :, 3] = rng.uniform(-0.05, 0.05, (t, k))
    data[:, :, 4] = rng.uniform(0.05, 0.6, (t, k))
    data[:, :, 5] = rng.uniform(0.1, 0.95, (t, k))
    data[:, :, 6:11] = rng.uniform(0, 1, (t, k, 5))
    return data


def xla_reference(data, u0, v0):
    t, k, _ = data.shape
    n = t * k
    pad = lambda x: jnp.concatenate(
        [jnp.asarray(x.reshape(n, -1)), jnp.zeros((1, x.shape[-1]), jnp.float32)], 0
    )
    pm = pad(data[:, :, 0:2])
    pc = pad(data[:, :, 2:5])
    pop = pad(data[:, :, 5:6])[:, 0]
    pcol = pad(data[:, :, 6:11])
    ids = jnp.arange(n, dtype=jnp.int32).reshape(t, k)
    local = jnp.arange(PX, dtype=jnp.float32)
    accums, logts = [], []
    for i in range(t):
        px = u0[i] + local % TILE
        py = v0[i] + local // TILE
        a, lt = _blend_tile(ids[i], pm, pc, pop, pcol, px, py)
        accums.append(np.asarray(a))
        logts.append(np.asarray(lt))
    return np.stack(accums), np.stack(logts)


def test_pallas_blend_matches_xla(rng):
    t, k = 6, 128
    data = make_tile_data(rng, t, k)
    u0 = (np.arange(t) % 3 * TILE).astype(np.int32)
    v0 = (np.arange(t) // 3 * TILE).astype(np.int32)
    accum, logt = blend_tiles_pallas(
        jnp.asarray(data), jnp.asarray(u0), jnp.asarray(v0), interpret=True
    )
    ref_accum, ref_logt = xla_reference(data, u0, v0)
    # early termination truncates contributions below transmittance 1/256
    np.testing.assert_allclose(np.asarray(accum), ref_accum, atol=5e-3)
    np.testing.assert_allclose(np.asarray(logt), ref_logt, atol=0.05)
    # where tiles are NOT saturated, agreement is exact
    unsat = ref_logt > -5.0
    if unsat.any():
        np.testing.assert_allclose(
            np.asarray(logt)[unsat], ref_logt[unsat], atol=1e-5
        )


def test_pallas_empty_tiles(rng):
    t, k = 2, 64
    data = np.zeros((t, k, N_ATTR), np.float32)  # opacity 0 => nothing renders
    u0 = np.zeros(t, np.int32)
    v0 = np.zeros(t, np.int32)
    accum, logt = blend_tiles_pallas(
        jnp.asarray(data), jnp.asarray(u0), jnp.asarray(v0), interpret=True
    )
    assert np.all(np.asarray(accum) == 0)
    assert np.all(np.asarray(logt) == 0)
