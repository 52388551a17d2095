"""Hardware cost of exact CSR training vs the k-capped tile blend.

Times one chained mapping-iteration program (the bench_mapping harness) with
exact_training "off" (k-capped Pallas blend fwd + analytic bwd) and "on"
(differentiable CSR exact raster, blend_csr fwd/bwd) at the benchmark shape.
The "on" path is what the mapper auto-switches to when harmful truncations
persist at the k ceiling (mapper/splatam.py _check_tile_overflow) — this
script prices that switch.

Env knobs: PROF_GAUSSIANS (200000), PROF_RES (256), PROF_K (256),
PROF_ITERS (30), PROF_REPS (3).
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from activesplat_tpu.mapper.adam import AdamState
    from activesplat_tpu.mapper.step import mapping_iteration

    n = int(os.environ.get("PROF_GAUSSIANS", 200_000))
    res = int(os.environ.get("PROF_RES", 256))
    k = int(os.environ.get("PROF_K", 256))
    iters = int(os.environ.get("PROF_ITERS", 30))
    reps = int(os.environ.get("PROF_REPS", 3))

    buf, cam, rgb, depth, cfg = bench.build_map(n, res, res)
    opt = AdamState.init(buf.params)

    def timed(mode):
        c = dataclasses.replace(cfg, k_per_tile=k, exact_training=mode)

        @jax.jit
        def run_iters(buf, opt):
            def body(i, carry):
                b, o, acc = carry
                b, o, m = mapping_iteration(b, o, cam, rgb, depth, c)
                acc = acc + m["loss"] + m["dropped"].astype(jnp.float32) * 1e-20
                return (b, o, acc)

            return jax.lax.fori_loop(0, iters, body, (buf, opt, jnp.float32(0.0)))

        out = run_iters(buf, opt)
        float(np.asarray(out[2]))  # compile + sync (relay needs a value fetch)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run_iters(buf, opt)
            float(np.asarray(out[2]))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best * 1e3

    modes = os.environ.get("PROF_MODES", "off,on,hybrid").split(",")
    times = {m: timed(m) for m in modes}
    print(f"n={n} res={res} k={k} iters={iters}")
    label = {"off": "k-capped", "on": "exact CSR", "hybrid": "hybrid"}
    for m in modes:
        print(
            f"{label.get(m, m):11s}: {times[m]:8.3f} ms/iter  "
            f"({1e3/times[m]:6.1f} it/s)"
        )
    if "off" in times:
        for m in modes:
            if m != "off":
                print(f"ratio {m}/off: {times[m]/times['off']:.3f}x")


if __name__ == "__main__":
    main()
