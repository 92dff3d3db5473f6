"""Benchmark harness — single chip, flagship elastic scene.

Reproduces BASELINE.md config 1 (GMPM elastic cube, ~1M particles, 256^3
sparse grid) and reports throughput in million particle-steps per second per
chip.  ``vs_baseline`` is measured against the reference's single-GPU fused
G2P2G pipeline at an estimated 250 M particle-steps/s on its Quadro P6000
(the repo publishes claims in prose, not tables — see BASELINE.md).

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np

CLAYMORE_BASELINE_MPPS = 250.0


def main(quick: bool = False):
    import jax
    import jax.numpy as jnp

    import claymore_tpu as cmt
    from claymore_tpu.io.sampler import sample_uniform_box_world

    cfg = cmt.SimConfig(
        domain_bits=8, max_active_blocks=8192, default_dt=1e-4,
    )
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=5e3, nu=0.4)
    eng = cmt.MPMEngine(cfg, [mat], tile_chunk=64)

    span = 0.12 if quick else 0.2  # 0.2 -> ~1.07M particles at 8 ppc
    lo, hi = 0.4 - span / 2, 0.4 + span / 2
    pos = sample_uniform_box_world(cfg.dx, [lo, 0.5, lo], [hi, 0.5 + span, hi],
                                   cfg.ppc)
    n = pos.shape[0]

    state = eng.init_state([pos], [(0.0, -0.5, 0.0)])
    frame_end = jnp.float32(1e9)

    # compile + warm up
    state = eng.substep(state, frame_end)
    jax.block_until_ready(state)
    float(np.asarray(state.t))  # force a real device sync (block_until_ready
    # does not reliably block on the axon remote backend)

    steps = 5 if quick else 20
    t0 = time.perf_counter()
    for _ in range(steps):
        state = eng.substep(state, frame_end)
    jax.block_until_ready(state)
    float(np.asarray(state.grid[0, 0, 0]))
    elapsed = time.perf_counter() - t0

    mpps = n * steps / elapsed / 1e6
    ms_per_step = elapsed / steps * 1e3
    print(json.dumps({
        "metric": "M particle-steps/sec/chip (elastic cube, fixed corotated)",
        "value": round(mpps, 3),
        "unit": "Mpps",
        "vs_baseline": round(mpps / CLAYMORE_BASELINE_MPPS, 4),
        "particles": n,
        "ms_per_step": round(ms_per_step, 3),
        "steps": steps,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    import sys

    main(quick="--quick" in sys.argv)
