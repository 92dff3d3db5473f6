"""Rebuild-chain sub-stage timings on the real chip (1M cube config).

The rebuild is amortized by drift-triggered rebucketing on a single chip,
but multi-chip engines rebuild the partition every substep — this is the
breakdown that justifies (or indicts) that cost.
"""
import os
import sys
import time
import json

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
import claymore_tpu as cmt
from claymore_tpu.core import partition as part


def timeit(f, state, iters=10, reps=3):
    g = jax.jit(lambda s: jax.lax.fori_loop(0, iters, lambda i, x: f(x), s))
    o = g(state)
    jax.block_until_ready(o)
    float(np.asarray(jax.tree.leaves(o)[0].ravel()[0]))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        o = g(state)
        float(np.asarray(jax.tree.leaves(o)[0].ravel()[0]))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    cfg, mats, parts, v0s = bench.build("cube", False)
    eng = cmt.MPMEngine(cfg, mats, tile_chunk=64, use_pallas=True)
    state = eng.init_state(parts, v0s)
    m = state.models[0]
    nt = m.tiles.block.shape[0]

    def sort_only(s):
        mm = s.models[0]
        key = part.flatten_key(cfg, part.home_block(cfg, mm.pos))
        key = jnp.where(mm.active, key, cfg.grid_size ** 3).astype(jnp.int32)
        iota = jnp.arange(mm.pos.shape[1], dtype=jnp.int32)
        k2, o2 = jax.lax.sort((key, iota), num_keys=1, is_stable=True)
        return s._replace(dt=s.dt + 0.0 * k2[0].astype(jnp.float32))

    def plan_permute(s):
        pm, tk, dr = part.sort_permute(cfg, s.models[0], nt)
        return s._replace(models=(pm._replace(tiles=s.models[0].tiles),))

    def table_rebuild(s):
        mm = s.models[0]
        tk = jnp.where(mm.tiles.tvalid,
                       part.flatten_key(cfg, mm.tiles.bcoord),
                       cfg.grid_size ** 3).astype(jnp.int32)
        p2, pool = part.rebuild(cfg, s.grid, s.partition, (tk,))
        return s._replace(grid=pool, partition=p2)

    out = {}
    for name, f in [("sort", sort_only),
                    ("sort_permute", plan_permute),
                    ("table_rebuild+remap", table_rebuild)]:
        out[name] = round(timeit(f, state), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
