"""Chip probe for the bf16-arena freeze (round 5).

SOAK_PRECISION.json exposed a TPU-only bug: under bf16 G2P arenas the
simulation FREEZES at its initial state (momentum pinned at n*m*v0, mass
perfect — so every conservation gate stays green) for the soak's config
(db=7, particle_tile=512, pallas_chunk=16) when the G2P dot runs at
"highest" or the manual bf16x3 split, while the same scene moves
correctly at g2p dot "default", with f32 arenas, or at the VALIDATE
gate's config (db=6, tile=256, chunk=8).

This probes one axis at a time and prints max|dpos| after 6 substeps
(expected ~|v0|*6*dt if the body moves; ~0 if frozen).
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import claymore_tpu as cmt
from claymore_tpu.utils.cache import enable_compilation_cache
from claymore_tpu.core.engine import exact_tiles
from claymore_tpu.io.sampler import sample_sphere

enable_compilation_cache()

BASE = dict(domain_bits=7, max_active_blocks=8192, default_dt=2e-4,
            rebucket_auto=True, pallas_chunk=16, particle_tile=512,
            g2p_arena_dtype="bfloat16", mxu_precision="high")

VARIANTS = [
    ("soak_cfg", {}),                       # expect FROZEN (soak repro)
    ("g2p_default", {"g2p_dot_precision": "default"}),   # expect moves
    ("g2p_highest", {"g2p_dot_precision": "highest"}),   # isolate dot mode
    ("tile256", {"particle_tile": 256}),
    ("chunk8", {"pallas_chunk": 8}),
    ("no_dma", {"g2p_window_dma": False}),  # XLA gather path, bf16 arenas
    ("f32_arena", {"g2p_arena_dtype": "float32", "mxu_precision": "highest"}),
    ("no_auto", {"rebucket_auto": False}),
    ("db6", {"domain_bits": 6, "max_active_blocks": 2048}),
]


def run(name, over):
    cfg = cmt.SimConfig(**{**BASE, **over})
    radius = 0.06 if cfg.domain_bits == 6 else 0.08
    pos = sample_sphere(cfg.dx, (0.5, 0.6, 0.5), radius, cfg.ppc)
    cfg = dataclasses.replace(cfg, max_tiles=exact_tiles(cfg, [pos], slack=1.4))
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=4e4, nu=0.35)
    eng = cmt.MPMEngine(cfg, [mat], tile_chunk=64, use_pallas=True)
    st = eng.init_state([pos], [(0.0, -1.2, 0.0)])
    p0 = eng.get_positions(st)
    fe = jnp.float32(1e9)
    for _ in range(6):
        st = eng.substep(st, fe)
    p1 = eng.get_positions(st)
    moved = float(np.max(np.abs(p1 - p0)))
    d = eng.diagnostics(st)
    expected = 1.2 * 6 * float(np.asarray(st.dt))
    verdict = "MOVES" if moved > expected * 0.5 else "FROZEN"
    print(f"{name:>14}: max|dpos|={moved:.3e} (expect ~{expected:.1e}) "
          f"dropped={d['model0_dropped_tiles']} -> {verdict}", flush=True)
    return {"moved": moved, "expected": expected, "verdict": verdict}


def main():
    names = sys.argv[1].split(";") if len(sys.argv) > 1 else None
    out = {}
    for name, over in VARIANTS:
        if names and name not in names:
            continue
        try:
            out[name] = run(name, over)
        except Exception as e:
            print(f"{name:>14}: ERROR {e!r}"[:300], flush=True)
            out[name] = {"error": repr(e)[:200]}
    with open("/tmp/probe_freeze.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
