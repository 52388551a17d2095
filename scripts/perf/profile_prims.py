"""Microbenchmark of the primitives that dominate the tiled rasterizer's
remaining cost (gather / multi-operand sort / scatter-add), on the live
device. Times reps chained inside ONE jitted program (fori_loop with a data
dependency) so the axon relay's ~1 ms dispatch overhead doesn't swamp the
numbers; syncs with a value fetch (CLAUDE.md)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit_chained(make_step, init, n=30, label=""):
    """make_step(i, carry) -> carry; times n chained steps in one program."""

    @jax.jit
    def run(init):
        return jax.lax.fori_loop(0, n, make_step, init)

    out = run(init)
    float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    out = run(init)
    float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label:52s} {dt:8.3f} ms")
    return dt


def main():
    print(f"device={jax.devices()[0].platform}")
    rng = np.random.default_rng(0)

    N = 262_144  # table rows (200k capacity rounded)
    T, K, A = 256, 256, 16  # tiles, per-tile list, attrs
    M = T * K  # gathered rows

    table = jnp.asarray(rng.normal(size=(N + 1, A)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, N, size=(T, K)), jnp.int32)
    ids_sorted = jnp.sort(ids, axis=1)

    # 1. row gather (what tile_data = data[global_ids] costs today)
    def g_step(i, carry):
        tb, acc = carry
        out = tb[(ids + i) % N]  # (T, K, A)
        return tb, acc + out[0, 0, 0]

    timeit_chained(g_step, (table, jnp.float32(0)), label=f"gather ({M}x{A} f32 rows from {N})")

    # 1b. per-tile-ascending ids (what binning actually produces)
    def gs_step(i, carry):
        tb, acc = carry
        out = tb[(ids_sorted + i) % N]
        return tb, acc + out[0, 0, 0]

    timeit_chained(gs_step, (table, jnp.float32(0)), label="gather, per-row ascending ids")

    # 1c. bf16 table
    table_bf = table.astype(jnp.bfloat16)

    def gb_step(i, carry):
        tb, acc = carry
        out = tb[(ids + i) % N]
        return tb, acc + out[0, 0, 0].astype(jnp.float32)

    timeit_chained(gb_step, (table_bf, jnp.float32(0)), label=f"gather bf16 ({M}x{A})")

    # 1d. small table (visible prefix bucket 16k)
    Ns = 16_384
    table_s = table[:Ns]
    ids_s = ids % Ns

    def gsm_step(i, carry):
        tb, acc = carry
        out = tb[(ids_s + i) % Ns]
        return tb, acc + out[0, 0, 0]

    timeit_chained(gsm_step, (table_s, jnp.float32(0)), label=f"gather from small table ({Ns})")

    # 1e. gather 1 column only (index cost vs byte cost)
    col = table[:, 0]

    def g1_step(i, carry):
        tb, acc = carry
        out = tb[(ids + i) % N]
        return tb, acc + out[0, 0]

    timeit_chained(g1_step, (col, jnp.float32(0)), label=f"gather ({M}) f32 scalars")

    # 2. multi-operand sort, 6 operands (today's cost), N rows
    ops6 = tuple(jnp.asarray(rng.normal(size=(N,)), jnp.float32) for _ in range(5)) + (
        jnp.arange(N, dtype=jnp.int32),
    )

    def s6_step(i, carry):
        key = carry[0] + 1e-9 * i
        out = jax.lax.sort((key,) + carry[1:], dimension=0, num_keys=1)
        return out

    timeit_chained(s6_step, ops6, label=f"lax.sort 6 operands x {N}")

    # 2b. 17 operands (duplicate-and-sort design), 4x16k = 64k rows
    Nd = 65_536
    ops17 = tuple(
        jnp.asarray(rng.normal(size=(Nd,)), jnp.float32) for _ in range(16)
    ) + (jnp.arange(Nd, dtype=jnp.int32),)

    def s17_step(i, carry):
        key = carry[0] + 1e-9 * i
        return jax.lax.sort((key,) + carry[1:], dimension=0, num_keys=1)

    timeit_chained(s17_step, ops17, label=f"lax.sort 17 operands x {Nd}")

    # 2c. 2 operands (key + id) x 64k — CUDA-style key/id sort
    ops2 = (jnp.asarray(rng.normal(size=(Nd,)), jnp.float32), jnp.arange(Nd, dtype=jnp.int32))

    def s2_step(i, carry):
        key = carry[0] + 1e-9 * i
        return jax.lax.sort((key,) + carry[1:], dimension=0, num_keys=1)

    timeit_chained(s2_step, ops2, label=f"lax.sort 2 operands x {Nd}")

    # 3. scatter-add rows (backward of the gather)
    g = jnp.asarray(rng.normal(size=(T, K, A)), jnp.float32)

    def sc_step(i, carry):
        acc, s = carry
        out = jnp.zeros((N + 1, A), jnp.float32).at[(ids + i) % N].add(g)
        return acc + out[0, 0], s

    timeit_chained(sc_step, (jnp.float32(0), jnp.float32(0)), label=f"scatter-add ({M}x{A} rows into {N})")

    # 4. segment-sum alternative: sort ids then segment-sum is what XLA may do
    flat_ids = ids.reshape(-1)

    def ss_step(i, carry):
        acc, s = carry
        out = jax.ops.segment_sum(g.reshape(M, A), (flat_ids + i) % N, num_segments=N + 1)
        return acc + out[0, 0], s

    timeit_chained(ss_step, (jnp.float32(0), jnp.float32(0)), label="segment_sum same rows")

    # 5. contiguous dynamic-slice reads for comparison: T slices of K rows
    starts = jnp.asarray(rng.integers(0, N - K, size=(T,)), jnp.int32)

    def dsl_step(i, carry):
        tb, acc = carry
        def body(t, a):
            blk = jax.lax.dynamic_slice(tb, (starts[t] , 0), (K, A))
            return a + blk[0, 0]
        return tb, acc + jax.lax.fori_loop(0, T, body, jnp.float32(0))

    timeit_chained(dsl_step, (table, jnp.float32(0)), label=f"{T} contiguous dyn-slices of {K}x{A}")


if __name__ == "__main__":
    main()
