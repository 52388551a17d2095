"""Hardware smoke test + A/B timing for the Pallas bin-slots kernel.

CLAUDE.md gate: ACTIVESPLAT_BIN_KERNEL=1 is bit-exact vs the XLA hierarchy
in CPU/interpret tests, but was never run on a real TPU. This script runs
bin_gaussians with use_kernel=False/True on the live device at mapping-bench
shapes, asserts exact index/count/overflow equality, and times both chained
(value-fetch sync per CLAUDE.md axon-relay rules).

Run on the TPU (ambient JAX_PLATFORMS=axon): python scripts/perf/smoke_bin_tpu.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

from activesplat_tpu.ops.raster_tiled import bin_gaussians


def synth(n, n_valid, seed=0, res=256):
    rng = np.random.default_rng(seed)
    mean2d = rng.uniform(0, res, size=(n, 2)).astype(np.float32)
    radius = np.exp(rng.normal(1.0, 0.7, size=n)).astype(np.float32)
    valid = np.zeros(n, bool)
    valid[:n_valid] = True
    return jnp.asarray(mean2d), jnp.asarray(radius), jnp.asarray(valid)


def timeit(fn, *args, n=30, label=""):
    @jax.jit
    def run(*a):
        def step(_, carry):
            # perturb the (float) first arg with a zero derived from the
            # carry so the body depends on it — otherwise XLA loop-invariant
            # code motion could hoist the whole bin out of the loop and the
            # reported ms/call would measure one call plus n adds
            eps = (
                jax.tree.leaves(carry)[0].reshape(-1)[0].astype(jnp.float32)
                * 0.0
            )
            out = fn(a[0] + eps, *a[1:])
            return jax.tree.map(lambda c, o: c + o.astype(c.dtype), carry, out)

        z = jax.tree.map(
            lambda o: jnp.zeros(o.shape, jnp.int32 if o.dtype != jnp.float32 else o.dtype),
            jax.eval_shape(fn, *a),
        )
        return jax.lax.fori_loop(0, n, step, z)

    out = run(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    out = run(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label:48s} {dt:8.3f} ms", flush=True)
    return dt


def case(n, n_valid, k, res, label):
    mean2d, radius, valid = synth(n, n_valid, res=res)
    print(f"== {label}: N={n} valid={n_valid} k={k} res={res}", flush=True)

    # mirror the kernel's static gate (raster_tiled.py bin_gaussians): when
    # it doesn't hold, use_kernel=True silently falls back to XLA and the
    # 'pallas' row below times XLA against itself — flag that loudly
    nb = -(-n // 128)
    if nb > 4096 or k % 128 != 0:
        print(
            f"  NOTE: kernel gate fails (nb={nb} > 4096 or k % 128 != 0) — "
            "'pallas' rows below actually run the XLA fallback",
            flush=True,
        )

    xla = jax.jit(
        lambda m, r, v: bin_gaussians(m, r, v, res, res, k, backend="xla")
    )
    pal = jax.jit(
        lambda m, r, v: bin_gaussians(
            m, r, v, res, res, k, backend="pallas", use_kernel=True
        )
    )
    a = jax.tree.map(np.asarray, xla(mean2d, radius, valid))
    b = jax.tree.map(np.asarray, pal(mean2d, radius, valid))
    ok_idx = np.array_equal(a.indices, b.indices)
    ok_cnt = np.array_equal(a.count, b.count)
    ok_ovf = np.array_equal(a.overflow, b.overflow)
    print(f"  exact: indices={ok_idx} count={ok_cnt} overflow={ok_ovf}", flush=True)
    if not (ok_idx and ok_cnt and ok_ovf):
        bad = np.nonzero(a.indices != b.indices)
        print(f"  FIRST MISMATCHES: {bad[0][:5]}, {bad[1][:5]}")
        print(f"  a={a.indices[bad][:5]} b={b.indices[bad][:5]}")
        return None
    t_x = timeit(lambda m, r, v: bin_gaussians(m, r, v, res, res, k, backend="xla"),
                 mean2d, radius, valid, label=f"  xla   bin {label}")
    t_p = timeit(lambda m, r, v: bin_gaussians(
        m, r, v, res, res, k, backend="pallas", use_kernel=True),
        mean2d, radius, valid, label=f"  pallas bin {label}")
    return t_x, t_p


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}", flush=True)
    case(262144, 200000, 256, 256, "mapping-200k")
    case(1 << 20, 1000000, 256, 256, "render-1M")
    case(1 << 20, 877000, 1024, 360, "topdown-877k")
