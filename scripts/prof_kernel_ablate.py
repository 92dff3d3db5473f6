"""In-kernel compute map at 12M: re-times the transfer stage with one
kernel piece DCE'd per run (CLAYMORE_ABLATE, ops/pallas_g2p2g.py) —
full_ms minus the ablated time bounds that piece's cost (coarse: DCE also
removes exclusive producers).  Each variant runs in a subprocess so the
env-keyed kernel trace is never shared.

Pieces: arena (window rolls/merges), g2pw (G2P weight one-hots),
g2pdot (G2P MXU pass), material (stress/F update incl. polar3),
p2gw (P2G weight one-hots), p2gdot (P2G MXU pass), p2gscatter
(output rolls + window accumulate).
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
cfg = cmt.SimConfig(domain_bits=8, max_active_blocks=65536, default_dt=1e-4,
                    rebucket_auto=True, pallas_chunk=16, particle_tile=512)
pos = sample_sphere(cfg.dx, (0.5, 0.55, 0.5), 0.28, cfg.ppc)
cfg = dataclasses.replace(cfg, max_tiles=exact_tiles(cfg, [pos], slack=1.25))
mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=5e3, nu=0.4)
eng = cmt.MPMEngine(cfg, [mat], tile_chunk=64, use_pallas=True)
state = eng.init_state([pos], [(0.0, -0.5, 0.0)])
state = eng.substep(state, jnp.float32(1e9))
float(np.asarray(state.t))

def full(s):
    nxt = jnp.zeros_like(s.grid)
    m, nxt = g2p2g_pallas(cfg, mat, s.grid, s.partition.table,
                          s.models[0], s.dt, s.dt, nxt)
    return s._replace(grid=nxt, models=(m,))

g = jax.jit(lambda s: jax.lax.fori_loop(0, 6, lambda i, s2: full(s2), s),
            donate_argnums=0)
o = g(jax.tree.map(jnp.copy, state)); float(np.asarray(o.dt)); del o
best = 1e30
for _ in range(2):
    s_in = jax.tree.map(jnp.copy, state); jax.block_until_ready(s_in)
    t0 = time.perf_counter(); o = g(s_in); float(np.asarray(o.dt))
    best = min(best, time.perf_counter() - t0); del o
print("RESULT", json.dumps({"ablate": os.environ.get("CLAYMORE_ABLATE", ""),
                            "ms": round(best / 6 * 1e3, 2)}), flush=True)
"""


def main():
    variants = ["", "arena", "g2pw", "g2pdot", "material", "p2gw",
                "p2gdot", "p2gscatter", "g2pdot,p2gdot"]
    if len(sys.argv) > 1:
        variants = sys.argv[1].split(";")
    out = {}
    for v in variants:
        env = dict(os.environ, CLAYMORE_ABLATE=v)
        r = subprocess.run([sys.executable, "-c",
                            CHILD % {"repo": os.path.dirname(HERE)}],
                           capture_output=True, text=True, env=env,
                           timeout=1800)
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")]
        if not line:
            print(f"variant {v!r} FAILED:", r.stderr[-800:], flush=True)
            continue
        ms = json.loads(line[0][7:])["ms"]
        out[v or "full"] = ms
        print(f"{v or 'full':>16}: {ms:7.2f} ms", flush=True)
    full_ms = out.get("full")
    if full_ms:
        for k, v in out.items():
            if k != "full":
                print(f"{k:>16}: piece <= {full_ms - v:6.2f} ms", flush=True)
    with open(os.path.join(os.path.dirname(HERE), "ABLATE_KERNEL.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
