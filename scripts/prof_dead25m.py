"""Dead-stream ablation at 25M: transfer stage with every tile invalid
(kernel skips compute, streams still flow) vs the live stage — splits the
g2p2g stage into data-movement floor vs live kernel compute."""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import claymore_tpu as cmt
from claymore_tpu.utils.cache import enable_compilation_cache
from claymore_tpu.io.sampler import sample_sphere
from claymore_tpu.core.engine import exact_tiles
from claymore_tpu.ops.pallas_g2p2g import g2p2g_pallas

enable_compilation_cache()

arena = "bfloat16" if "--arena=bf16" in sys.argv else "float32"
macro = 65536
for a in sys.argv[1:]:
    if a.startswith("--macro="):
        macro = int(a.split("=", 1)[1])
cfg = cmt.SimConfig(domain_bits=8, max_active_blocks=65536, default_dt=1e-4,
                    rebucket_auto=True, pallas_chunk=16, particle_tile=512,
                    g2p_arena_dtype=arena, pallas_macro_tiles=macro)
pos = sample_sphere(cfg.dx, (0.5, 0.55, 0.5), 0.3547, cfg.ppc)
cfg = dataclasses.replace(cfg, max_tiles=exact_tiles(cfg, [pos], slack=1.25))
mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=5e3, nu=0.4)
eng = cmt.MPMEngine(cfg, [mat], tile_chunk=64, use_pallas=True)
state = eng.init_state([pos], [(0.0, -0.5, 0.0)])
state = eng.substep(state, jnp.float32(1e9))
float(np.asarray(state.t))


def timeloop(f, state, iters=6, reps=2):
    g = jax.jit(lambda s: jax.lax.fori_loop(0, iters, lambda i, s2: f(s2), s),
                donate_argnums=0)
    o = g(jax.tree.map(jnp.copy, state)); float(np.asarray(o.dt))
    del o
    best = 1e30
    for _ in range(reps):
        s_in = jax.tree.map(jnp.copy, state); jax.block_until_ready(s_in)
        t0 = time.perf_counter(); o = g(s_in); float(np.asarray(o.dt))
        best = min(best, time.perf_counter() - t0)
        del o
    return best / iters * 1e3


def full(s):
    nxt = jnp.zeros_like(s.grid)
    m, nxt = g2p2g_pallas(cfg, mat, s.grid, s.partition.table,
                          s.models[0], s.dt, s.dt, nxt)
    return s._replace(grid=nxt, models=(m,))


def dead(s):
    nxt = jnp.zeros_like(s.grid)
    m0 = s.models[0]
    md = m0._replace(tiles=m0.tiles._replace(
        tvalid=jnp.zeros_like(m0.tiles.tvalid)))
    m, nxt = g2p2g_pallas(cfg, mat, s.grid, s.partition.table,
                          md, s.dt, s.dt, nxt)
    m = m._replace(tiles=m0.tiles)
    return s._replace(grid=nxt, models=(m,))


print("DEAD25M", json.dumps({
    "arena": arena,
    "macro": macro,
    "full_ms": round(timeloop(full, state), 2),
    "dead_stream_ms": round(timeloop(dead, state), 2),
}), flush=True)
