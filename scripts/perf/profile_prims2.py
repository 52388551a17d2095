"""Second round of primitive microbenchmarks: gather-table-size sweep,
wide multi-operand sorts, and the fused-concat gather the real pipeline
compiles (see profile_prims.py for methodology)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit_chained(make_step, init, n=30, label=""):
    @jax.jit
    def run(init):
        return jax.lax.fori_loop(0, n, make_step, init)

    out = run(init)
    float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    out = run(init)
    float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label:56s} {dt:8.3f} ms")
    return dt


def main():
    print(f"device={jax.devices()[0].platform}")
    rng = np.random.default_rng(0)
    T, K, A = 256, 256, 16
    M = T * K

    # gather table-size sweep: same output (65536 x 16), varying table rows
    for nt in (16_384, 32_768, 65_536, 131_072, 262_144):
        table = jnp.asarray(rng.normal(size=(nt, A)), jnp.float32)
        ids = jnp.asarray(rng.integers(0, nt, size=(T, K)), jnp.int32)

        def g_step(i, carry, table=table, ids=ids, nt=nt):
            tb, acc = carry
            out = tb[(ids + i) % nt]
            return tb, acc + out[0, 0, 0]

        timeit_chained(g_step, (table, jnp.float32(0)),
                       label=f"gather {M}x{A} f32 from table rows={nt}")

    # bf16 from 65536-row table
    nt = 65_536
    table_bf = jnp.asarray(rng.normal(size=(nt, A)), jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, nt, size=(T, K)), jnp.int32)

    def gb_step(i, carry):
        tb, acc = carry
        out = tb[(ids + i) % nt]
        return tb, acc + out[0, 0, 0].astype(jnp.float32)

    timeit_chained(gb_step, (table_bf, jnp.float32(0)),
                   label=f"gather {M}x{A} bf16 from table rows={nt}")

    # gather where indices span only a 16k range of a 262k table (locality
    # without shrinking the table)
    ntb = 262_144
    table_big = jnp.asarray(rng.normal(size=(ntb, A)), jnp.float32)
    ids_local = jnp.asarray(rng.integers(0, 16_384, size=(T, K)), jnp.int32)

    def gl_step(i, carry):
        tb, acc = carry
        out = tb[ids_local + (i % 2)]
        return tb, acc + out[0, 0, 0]

    timeit_chained(gl_step, (table_big, jnp.float32(0)),
                   label="gather 65536x16 f32, 16k-local ids, 262k table")

    # the real pipeline's gather: table built by concat(pad...) then indexed
    # (does XLA fuse the concat into the gather / what does it cost end to end)
    N = 262_144
    mean2d = jnp.asarray(rng.normal(size=(N, 2)), jnp.float32)
    conic = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    opac = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    colors = jnp.asarray(rng.normal(size=(N, 5)), jnp.float32)
    gids = jnp.asarray(rng.integers(0, N, size=(T, K)), jnp.int32)

    def gc_step(i, carry):
        m, acc = carry
        data = jnp.concatenate(
            [m, conic, opac[:, None], colors, jnp.zeros((N, 5), jnp.float32)], -1
        )
        out = data[(gids + i) % N]
        return m, acc + out[0, 0, 0]

    timeit_chained(gc_step, (mean2d, jnp.float32(0)),
                   label="concat(16 attrs) + gather 65536 rows, 262k table")

    # 17-operand sort over 262k (carry the whole payload through the sort)
    ops17 = tuple(
        jnp.asarray(rng.normal(size=(N,)), jnp.float32) for _ in range(16)
    ) + (jnp.arange(N, dtype=jnp.int32),)

    def s17_step(i, carry):
        key = carry[0] + 1e-9 * i
        return jax.lax.sort((key,) + carry[1:], dimension=0, num_keys=1)

    timeit_chained(s17_step, ops17, label=f"lax.sort 17 operands x {N}")

    # scatter-add into a SMALL table (backward when grads target the prefix)
    g = jnp.asarray(rng.normal(size=(T, K, A)), jnp.float32)
    for nt2 in (65_536, 262_144):
        ids2 = jnp.asarray(rng.integers(0, nt2, size=(T, K)), jnp.int32)

        def sc_step(i, carry, ids2=ids2, nt2=nt2):
            acc, s = carry
            out = jnp.zeros((nt2, A), jnp.float32).at[(ids2 + i) % nt2].add(g)
            return acc + out[0, 0], s

        timeit_chained(sc_step, (jnp.float32(0), jnp.float32(0)),
                       label=f"scatter-add 65536x16 into rows={nt2}")

    # one-column gathers (building the small table column-wise)
    col = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    pidx = jnp.asarray(rng.integers(0, N, size=(65_536,)), jnp.int32)

    def c16_step(i, carry):
        c, acc = carry
        outs = [c[(pidx + i + j) % N] for j in range(16)]
        return c, acc + sum(o[0] for o in outs)

    timeit_chained(c16_step, (col, jnp.float32(0)),
                   label="16 scalar-column gathers of 65536 from 262k")


if __name__ == "__main__":
    main()
