"""Round-5 kernel lever sweep at 12M: times the transfer stage under the
A/B env knobs (ops/pallas_g2p2g.py) and tile/chunk geometry variants.
Each variant runs in a subprocess (env-keyed traces are never shared).

Unlike prof_kernel_ablate's child, the pool is pre-cast to the config's
arena dtype so the kernel takes the PRODUCTION in-kernel DMA window path
(an f32 pool under bf16 arenas silently falls back to the XLA gather —
that fallback is what ABLATE_KERNEL.json r4 actually timed).

Writes PROF_LEVERS.json.
"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import dataclasses, json, os, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np, jax, jax.numpy as jnp
import claymore_tpu as cmt
from claymore_tpu.utils.cache import enable_compilation_cache
from claymore_tpu.io.sampler import sample_sphere
from claymore_tpu.core.engine import exact_tiles
from claymore_tpu.ops.pallas_g2p2g import g2p2g_pallas
enable_compilation_cache()
tile = int(os.environ.get("LEVER_TILE", "512"))
chunk = int(os.environ.get("LEVER_CHUNK", "16"))
cfg = cmt.SimConfig(domain_bits=8, max_active_blocks=65536, default_dt=1e-4,
                    rebucket_auto=True, pallas_chunk=chunk,
                    particle_tile=tile)
pos = sample_sphere(cfg.dx, (0.5, 0.55, 0.5), 0.28, cfg.ppc)
cfg = dataclasses.replace(cfg, max_tiles=exact_tiles(cfg, [pos], slack=1.25))
mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=5e3, nu=0.4)
eng = cmt.MPMEngine(cfg, [mat], tile_chunk=64, use_pallas=True)
state = eng.init_state([pos], [(0.0, -0.5, 0.0)])
state = eng.substep(state, jnp.float32(1e9))
float(np.asarray(state.t))
n = int(np.asarray(state.models[0].active).sum())

adt = jnp.bfloat16 if cfg.g2p_arena_dtype == "bfloat16" else jnp.float32

def full(s):
    nxt = jnp.zeros_like(s.grid)
    m, nxt = g2p2g_pallas(cfg, mat, s.grid.astype(adt), s.partition.table,
                          s.models[0], s.dt, s.dt, nxt)
    return s._replace(grid=nxt, models=(m,))

g = jax.jit(lambda s: jax.lax.fori_loop(0, 6, lambda i, s2: full(s2), s),
            donate_argnums=0)
o = g(jax.tree.map(jnp.copy, state)); float(np.asarray(o.dt)); del o
best = 1e30
for _ in range(3):
    s_in = jax.tree.map(jnp.copy, state); jax.block_until_ready(s_in)
    t0 = time.perf_counter(); o = g(s_in); float(np.asarray(o.dt))
    best = min(best, time.perf_counter() - t0); del o
print("RESULT", json.dumps({"ms": round(best / 6 * 1e3, 2), "n": n}),
      flush=True)
"""

VARIANTS = [
    ("base", {}),
    ("p2g_dg", {"CLAYMORE_P2G_DG": "1"}),
    ("p2g_13ch", {"CLAYMORE_P2G_CHANS": "13"}),
    ("p2g_dg_13ch", {"CLAYMORE_P2G_DG": "1", "CLAYMORE_P2G_CHANS": "13"}),
    ("g2p_default_dot", {"CLAYMORE_G2P_DOT": "default"}),
    ("all", {"CLAYMORE_P2G_DG": "1", "CLAYMORE_P2G_CHANS": "13",
             "CLAYMORE_G2P_DOT": "default"}),
    ("tile256", {"LEVER_TILE": "256"}),
    ("tile1024", {"LEVER_TILE": "1024"}),
    ("chunk8", {"LEVER_CHUNK": "8"}),
    ("chunk32", {"LEVER_CHUNK": "32"}),
    # round 2 of the sweep: the 8be8ddb per-tile liveness cond's cost on
    # a live-dominated scene (it saves dead-tile compute but may stall
    # Mosaic's software pipeline), and the exact-mass side dot's mode
    ("tile_noskip", {"CLAYMORE_TILE_SKIP": "0"}),
    ("win_noskip", {"CLAYMORE_P2G_DG": "1", "CLAYMORE_P2G_CHANS": "13",
                    "CLAYMORE_TILE_SKIP": "0"}),
    ("mass_high", {"CLAYMORE_MASS_DOT": "high"}),
    ("win_mass_high", {"CLAYMORE_P2G_DG": "1", "CLAYMORE_P2G_CHANS": "13",
                       "CLAYMORE_MASS_DOT": "high"}),
    ("win_all_noskip", {"CLAYMORE_P2G_DG": "1", "CLAYMORE_P2G_CHANS": "13",
                        "CLAYMORE_G2P_DOT": "default",
                        "CLAYMORE_TILE_SKIP": "0"}),
]


def main():
    names = sys.argv[1].split(";") if len(sys.argv) > 1 else None
    path = os.path.join(os.path.dirname(HERE), "PROF_LEVERS.json")
    out = {}
    if os.path.exists(path):            # merge across partial invocations
        with open(path) as f:
            out = json.load(f)
    for name, envd in VARIANTS:
        if names and name not in names:
            continue
        env = dict(os.environ, **envd)
        try:
            r = subprocess.run([sys.executable, "-c",
                                CHILD % {"repo": os.path.dirname(HERE)}],
                               capture_output=True, text=True, env=env,
                               timeout=1800)
        except subprocess.TimeoutExpired:
            print(f"variant {name!r} TIMED OUT (1800s)", flush=True)
            out[name] = None
            continue
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")]
        if not line:
            print(f"variant {name!r} FAILED:", r.stderr[-800:], flush=True)
            out[name] = None
            continue
        res = json.loads(line[0][7:])
        out[name] = res["ms"]
        print(f"{name:>16}: {res['ms']:7.2f} ms  (n={res['n']})", flush=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
