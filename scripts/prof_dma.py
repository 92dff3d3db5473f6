"""Microbenchmark: in-kernel DMA gather vs XLA row gather on the real TPU.

Questions (design_round3.md §2 / round-3 plan):
  1. Per-DMA issue/latency cost when D DMAs per program run concurrently.
  2. Throughput of "run" DMAs: (R rows of [16,128]) from random oct offsets
     of an HBM-resident pool -> VMEM (the z-run group gather).
  3. Same payload via the XLA row gather (the round-2 15-30 GB/s wall).

Timing: K-iteration on-device fori_loop in ONE dispatch (the axon tunnel
costs ~30 ms/dispatch), best of 3.
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, reps=3, iters=10):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        # 4-byte sync fetch
        leaf = jax.tree.leaves(out)[0]
        float(np.asarray(leaf.ravel()[0]))
        dt = (time.perf_counter() - t0) / iters
        best = min(best, dt)
    return best * 1e3  # ms per iter


def dma_gather_bench(O, G, D, R, double_buffer=False):
    """Each of G programs DMAs D runs of R rows [16,128] from random octs."""
    pool = jnp.arange(O * 16 * 128, dtype=jnp.float32).reshape(O, 16, 128)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, O - R, size=(G * D,)), jnp.int32)

    def kernel(idx_ref, pool_ref, out_ref, scratch, sems):
        g = pl.program_id(0)

        def start(slot, prog):
            for d in range(D):
                pltpu.make_async_copy(
                    pool_ref.at[pl.ds(idx_ref[prog * D + d], R)],
                    scratch.at[slot, d],
                    sems.at[slot, d],
                ).start()

        def wait(slot):
            for d in range(D):
                pltpu.make_async_copy(
                    pool_ref.at[pl.ds(0, R)], scratch.at[slot, d],
                    sems.at[slot, d],
                ).wait()

        if double_buffer:
            slot = g % 2

            @pl.when(g == 0)
            def _():
                start(0, 0)

            @pl.when(g + 1 < G)
            def _():
                start((g + 1) % 2, g + 1)

            wait(slot)
            acc = jnp.zeros((16, 128), jnp.float32)
            for d in range(D):
                acc = acc + jnp.sum(scratch[slot, d], axis=0)
            out_ref[0] = acc
        else:
            start(0, g)
            wait(0)
            acc = jnp.zeros((16, 128), jnp.float32)
            for d in range(D):
                acc = acc + jnp.sum(scratch[0, d], axis=0)
            out_ref[0] = acc

    nbuf = 2 if double_buffer else 1
    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, 16, 128), lambda g, *p: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((nbuf, D, R, 16, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((nbuf, D)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((G, 16, 128), jnp.float32),
    )

    def run(pool):
        def body(i, acc):
            return acc + f(idx, pool)[0, 0, 0]
        return jax.lax.fori_loop(0, 10, body, 0.0)

    run_j = jax.jit(run)
    ms = timeit(run_j, pool)
    payload = G * D * R * 16 * 128 * 4
    return ms, payload / (ms * 1e-3) / 1e9


def xla_gather_bench(O, G, D, R):
    """Same payload as a window row-gather: pool[start + arange(R)]."""
    pool = jnp.arange(O * 16 * 128, dtype=jnp.float32).reshape(O, 16, 128)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, O - R, size=(G * D,)), jnp.int32)

    def run(pool):
        def body(i, acc):
            rows = pool[(idx[:, None] + jnp.arange(R)[None, :]).reshape(-1)]
            return acc + jnp.sum(rows[:, 0, 0])
        return jax.lax.fori_loop(0, 10, body, 0.0)

    run_j = jax.jit(run)
    ms = timeit(run_j, pool)
    payload = G * D * R * 16 * 128 * 4
    return ms, payload / (ms * 1e-3) / 1e9


def xla_scatter_bench(O, G, D, R, dup=True):
    """Scatter-add of R-row windows into the pool (the P2G output side).

    dup=True draws random window starts (overlaps -> duplicate rows, the
    realistic case); dup=False uses disjoint strided windows (XLA may use
    the unique-indices fast path only if told, which .add can't be)."""
    pool = jnp.zeros((O, 16, 128), jnp.float32)
    rng = np.random.default_rng(0)
    if dup:
        starts = rng.integers(0, O - R, size=(G * D,))
    else:
        n = min(G * D, O // R - 1)
        starts = rng.permutation(O // R - 1)[:n] * R
        starts = np.resize(starts, G * D)  # repeats are window-aligned dups
    idx = jnp.asarray(starts, jnp.int32)
    upd = jnp.ones((G * D * R, 16, 128), jnp.float32)

    def run(pool, upd):
        def body(i, p):
            rows = (idx[:, None] + jnp.arange(R)[None, :]).reshape(-1)
            return p.at[rows].add(upd)
        return jax.lax.fori_loop(0, 10, body, pool)

    run_j = jax.jit(run)
    ms = timeit(run_j, pool, upd)
    payload = G * D * R * 16 * 128 * 4
    return ms, payload / (ms * 1e-3) / 1e9


def xla_scatter_sorted_bench(O, G, S=8, dups=0.1):
    """The per-(col, w) scatter decomposition: S separate scatter-adds,
    each with SORTED near-unique row indices (groups are key-sorted, so
    widx[:, col, w] is non-decreasing; dups only from multi-group octs)."""
    pool = jnp.zeros((O, 16, 128), jnp.float32)
    rng = np.random.default_rng(0)
    base = np.sort(rng.choice(O, size=G, replace=False))
    dup_at = rng.random(G) < dups
    base[dup_at] = np.minimum(base[dup_at] + 0, O - 1)     # keep sorted
    idxs = [jnp.asarray(np.sort(base), jnp.int32) for _ in range(S)]
    upd = jnp.ones((G, 16, 128), jnp.float32)

    def run(pool, upd):
        def body(i, p):
            for s in range(S):
                p = p.at[idxs[s]].add(upd, indices_are_sorted=True,
                                      unique_indices=False)
            return p
        return jax.lax.fori_loop(0, 10, body, pool)

    run_j = jax.jit(run)
    ms = timeit(run_j, pool, upd)
    payload = S * G * 16 * 128 * 4
    return ms, payload / (ms * 1e-3) / 1e9


def rmw_bench(O, G, D, R):
    """Per-program read->add->write(wait) cycle into HBM (the scatter RMW)."""
    pool = jnp.zeros((O, 16, 128), jnp.float32)
    rng = np.random.default_rng(0)
    # disjoint strided octs so RMW correctness doesn't matter for timing
    idx = jnp.asarray(rng.permutation(O - R)[: G * D], jnp.int32)

    def kernel(idx_ref, pool_in, pool_out, out_ref, scratch, sems):
        g = pl.program_id(0)
        for d in range(D):
            pltpu.make_async_copy(
                pool_out.at[pl.ds(idx_ref[g * D + d], R)],
                scratch.at[d], sems.at[d],
            ).start()
        for d in range(D):
            pltpu.make_async_copy(
                pool_out.at[pl.ds(0, R)], scratch.at[d], sems.at[d],
            ).wait()
        for d in range(D):
            scratch[d] = scratch[d] + 1.0
        for d in range(D):
            pltpu.make_async_copy(
                scratch.at[d],
                pool_out.at[pl.ds(idx_ref[g * D + d], R)],
                sems.at[d],
            ).start()
        for d in range(D):
            pltpu.make_async_copy(
                scratch.at[d], pool_out.at[pl.ds(0, R)], sems.at[d],
            ).wait()
        out_ref[0, 0] = jnp.float32(g)

    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                       pl.BlockSpec((1, 128), lambda g, *p: (g, 0),
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=[
                pltpu.VMEM((D, R, 16, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((D,)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((O, 16, 128), jnp.float32),
                   jax.ShapeDtypeStruct((G, 128), jnp.float32)],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    def run(pool):
        def body(i, carry):
            p, acc = carry
            p2, o = f(idx, p)
            return p2, acc + o[0, 0]
        return jax.lax.fori_loop(0, 10, body, (pool, 0.0))

    run_j = jax.jit(run)
    ms = timeit(run_j, pool)
    payload = 2 * G * D * R * 16 * 128 * 4
    return ms, payload / (ms * 1e-3) / 1e9


if __name__ == "__main__":
    O = 65536  # 0.5 GB pool
    print(f"pool [{O},16,128] = {O*16*128*4/2**30:.2f} GiB; all BW = payload GB/s")
    print("== XLA window row-gather baseline ==")
    for (G, D, R) in [(8192, 4, 9), (8192, 8, 1)]:
        ms, bw = xla_gather_bench(O, G, D, R)
        print(f"  G={G} D={D} R={R}: {ms:7.3f} ms  {bw:7.1f} GB/s")
    print("== XLA window scatter-add ==")
    for (G, D, R, dup) in [(8192, 4, 9, True), (4096, 4, 9, False),
                           (8192, 8, 1, True), (8192, 4, 3, True)]:
        ms, bw = xla_scatter_bench(O, G, D, R, dup)
        print(f"  G={G} D={D} R={R} dup={dup}: {ms:7.3f} ms  {bw:7.1f} GB/s")
    print("== in-kernel DMA gather (no double buffer) ==")
    for (G, D, R) in [(8192, 4, 9), (8192, 8, 1), (2048, 4, 9), (8192, 4, 3)]:
        ms, bw = dma_gather_bench(O, G, D, R)
        per_dma_us = ms * 1e3 / (G * D)
        print(f"  G={G} D={D} R={R}: {ms:7.3f} ms  {bw:7.1f} GB/s  "
              f"{per_dma_us:.3f} us/DMA")
    print("== in-kernel DMA gather (double buffered) ==")
    for (G, D, R) in [(8192, 4, 9), (8192, 8, 1), (8192, 4, 3),
                      (5120, 16, 1)]:   # g2p2g shape: chunk=16 -> 2 groups x 8 rows
        ms, bw = dma_gather_bench(O, G, D, R, double_buffer=True)
        per_dma_us = ms * 1e3 / (G * D)
        print(f"  G={G} D={D} R={R}: {ms:7.3f} ms  {bw:7.1f} GB/s  "
              f"{per_dma_us:.3f} us/DMA")
    print("== XLA scatter-add, sorted near-unique per-slot indices ==")
    for (G, S) in [(10240, 8), (10240, 1)]:
        ms, bw = xla_scatter_sorted_bench(O, G, S)
        print(f"  G={G} S={S}: {ms:7.3f} ms  {bw:7.1f} GB/s")
    print("== RMW read+add+write ==")
    for (G, D, R) in [(4096, 4, 9), (4096, 4, 3)]:
        ms, bw = rmw_bench(O, G, D, R)
        print(f"  G={G} D={D} R={R}: {ms:7.3f} ms  {bw:7.1f} GB/s (r+w)")
