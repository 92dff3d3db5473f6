"""VERDICT r3 item 7: measure whether drift-auto + span-2 (the Pallas
kernel's config space) strictly dominates rebucket_every>2 + span-4 (which
exists only on the XLA backend) — the measured justification for NOT
teaching the oct-window kernel span-4 arenas (a 4^3 arena needs 27 window
rows per group vs 8, i.e. 3.4x the window traffic, before any win).

Runs the 1M elastic cube (settling, low churn) and the 4.3M dam break
(high churn) under:
  - pallas + rebucket_auto        (the shipped default)
  - pallas + rebucket_every=2     (densest static cadence the kernel allows)
  - xla    + rebucket_every=4     (the span-4 config the kernel lacks)
Writes K4_JUSTIFY.json.
"""
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
from claymore_tpu.core.engine import exact_tiles
from claymore_tpu.io.sampler import sample_uniform_box_world

enable_compilation_cache()


def measure(cfg, mats, parts, v0s, use_pallas, steps=40, reps=3):
    eng = cmt.MPMEngine(cfg, mats, tile_chunk=64, use_pallas=use_pallas)
    state = eng.init_state(parts, v0s)
    fe = jnp.float32(1e9)
    state = eng.substep(state, fe)
    float(np.asarray(state.t))
    state = eng.run_steps(state, steps, fe)
    float(np.asarray(state.t))
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        state = eng.run_steps(state, steps, fe)
        float(np.asarray(state.grid[0, 0, 0]))
        best = min(best, time.perf_counter() - t0)
    n = sum(p.shape[0] for p in parts)
    d = eng.diagnostics(state)
    return {
        "ms_per_step": round(best / steps * 1e3, 3),
        "mpps": round(n * steps / best / 1e6, 2),
        "particles": n,
        "dropped_tiles": int(d.get("model0_dropped_tiles", 0)),
        "block_overflow": int(d.get("block_overflow", 0)),
    }


def scenes():
    base = dict(domain_bits=8, default_dt=1e-4, pallas_chunk=16,
                particle_tile=512)
    cfg = cmt.SimConfig(max_active_blocks=8192, **base)
    vol = cfg.default_volume()
    cube = ([cmt.FixedCorotated(volume=vol, e=5e3, nu=0.4)],
            [sample_uniform_box_world(cfg.dx, [0.3, 0.5, 0.3],
                                      [0.5, 0.7, 0.5], cfg.ppc)],
            [(0.0, -0.5, 0.0)], cfg)
    cfgd = cmt.SimConfig(max_active_blocks=24576, **base)
    dam = ([cmt.JFluid(volume=vol)],
           [sample_uniform_box_world(cfgd.dx, [0.1, 0.1, 0.1],
                                     [0.3, 0.5, 0.5], cfgd.ppc)],
           [(2.0, -2.0, 0.0)], cfgd)
    return {"cube1m": cube, "dambreak4m": dam}


def _flush(out):
    with open("K4_JUSTIFY.json", "w") as f:
        json.dump(out, f, indent=1)


def main():
    out = {"device": str(jax.devices()[0])}
    # each row flushes immediately: the 2026-08-20 run lost a whole scene
    # when the XLA span-4 dambreak config CRASHED the remote TPU worker
    # ("kernel fault") at readback — the pallas rows measured before it
    # must survive, and the crash itself is evidence for the rejection
    for name, (mats, parts, v0s, cfg) in scenes().items():
        cfg = dataclasses.replace(
            cfg, max_tiles=exact_tiles(cfg, parts, slack=1.5))
        rows = {}
        out[name] = rows
        for key, over, pallas in (
            ("pallas_auto", dict(rebucket_auto=True), True),
            ("pallas_k2", dict(rebucket_every=2), True),
            ("xla_k4", dict(rebucket_every=4), False),   # crash-prone: last
        ):
            try:
                rows[key] = measure(dataclasses.replace(cfg, **over),
                                    mats, parts, v0s, use_pallas=pallas)
            except Exception as e:  # noqa: BLE001 — record, keep the rest
                rows[key] = {"error": repr(e)[:200]}
            _flush(out)
            print(name, key, json.dumps(rows[key]), flush=True)


if __name__ == "__main__":
    main()
