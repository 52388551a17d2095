"""Time the full mapping_iteration chained in-program (production-like)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import build_map
from activesplat_tpu.mapper.adam import AdamState
from activesplat_tpu.mapper.step import mapping_iteration


def main():
    n_g = int(os.environ.get("BENCH_GAUSSIANS", 200_000))
    width = height = int(os.environ.get("BENCH_RES", 256))
    n = int(os.environ.get("N_ITERS", 30))
    buf, cam, rgb, depth, cfg = build_map(n_g, width, height)
    opt = AdamState.init(buf.params)

    @jax.jit
    def run(buf, opt):
        def body(i, carry):
            b, o, acc = carry
            b, o, m = mapping_iteration(b, o, cam, rgb, depth, cfg)
            # keep the metrics live so the measured program matches production
            acc = acc + m["loss"] + m["psnr"] * 1e-20 + m["depth_l1"] * 1e-20
            return (b, o, acc)

        return jax.lax.fori_loop(0, n, body, (buf, opt, jnp.float32(0.0)))

    out = run(buf, opt)
    float(np.asarray(out[2]))
    t0 = time.perf_counter()
    out = run(buf, opt)
    float(np.asarray(out[2]))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"device={jax.devices()[0].platform} n={n_g} res={width}: "
          f"mapping_iteration {dt:.3f} ms/iter ({1000/dt:.1f} it/s)")


if __name__ == "__main__":
    main()
