"""Multi-frame conservation soak for the precision levers (real chip).

VERDICT r3 item 2(b): promote bf16 G2P arenas to default only after a
multi-frame conservation soak.  This runs the SAME scene (2M elastic
sphere drop, 24 fps, impact + bounce inside the window) through variant
engines and records per-frame:

  * grid mass relative drift vs the analytic total particle mass
    (must stay at f32 roundoff -- the P2G mass rows never touch the
    quantized arenas in any variant);
  * grid momentum;
  * particle-cloud max divergence vs the f32/HIGHEST baseline
    (bounded by storage quantization x trajectory Lyapunov growth --
    reported, not asserted);
  * loss counters (dropped tiles / overflow: must be 0).

Variants: f32/HIGHEST baseline, bf16 arenas, mxu "high" (bf16x3), and
the composed bf16+high.  Writes SOAK_PRECISION.json at the repo root.

Run:  python scripts/soak_precision.py [--frames=N] [--quick]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from claymore_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import claymore_tpu as cmt  # noqa: E402
from claymore_tpu.core.engine import exact_tiles  # noqa: E402
from claymore_tpu.io.sampler import sample_sphere  # noqa: E402


def build(arena: str, mxu: str, quick: bool, g2p_dot: str | None = None):
    cfg = cmt.SimConfig(domain_bits=7, max_active_blocks=8192,
                        default_dt=2e-4, rebucket_auto=True,
                        pallas_chunk=16, particle_tile=512,
                        g2p_arena_dtype=arena, mxu_precision=mxu,
                        g2p_dot_precision=g2p_dot)
    radius = 0.08 if quick else 0.145
    pos = sample_sphere(cfg.dx, (0.5, 0.6, 0.5), radius, cfg.ppc)
    cfg = dataclasses.replace(cfg, max_tiles=exact_tiles(cfg, [pos], slack=1.4))
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=4e4, nu=0.35)
    eng = cmt.MPMEngine(cfg, [mat], tile_chunk=64, use_pallas=True)
    state = eng.init_state([pos], [(0.0, -1.2, 0.0)])
    return eng, state, pos.shape[0], mat


def cloud_err(a: np.ndarray, b: np.ndarray) -> float:
    if a.shape != b.shape:
        return float("inf")
    ka = np.lexsort((a[:, 2], a[:, 1], a[:, 0]))
    kb = np.lexsort((b[:, 2], b[:, 1], b[:, 0]))
    return float(np.max(np.abs(a[ka] - b[kb])))


def soak(arena: str, mxu: str, frames: int, quick: bool, baseline=None,
         g2p_dot: str | None = None):
    eng, state, n, mat = build(arena, mxu, quick, g2p_dot)
    total_mass = n * mat.mass
    p_init = eng.get_positions(state)
    rows = []
    clouds = [] if baseline is None else None
    t0 = time.perf_counter()
    for f in range(frames):
        state = eng.run_frame(
            state, jnp.float32((f + 1) * eng.cfg.frame_dt()))
        d = eng.diagnostics(state)
        eng.check_health(state, strict=True)
        row = {
            "frame": f,
            "mass_rel_err": abs(d["grid_mass"] - total_mass) / total_mass,
            "momentum_y": float(d["grid_momentum"][1]),
            "steps": d["step"],
            "dropped": d["model0_dropped_tiles"],
            "overflow": d["block_overflow"],
        }
        if baseline is not None:
            row["cloud_err_vs_f32"] = cloud_err(
                eng.get_positions(state), baseline[f])
        else:
            clouds.append(eng.get_positions(state))
        rows.append(row)
        print(f"  [{arena}/{mxu}] frame {f}: mass_rel "
              f"{row['mass_rel_err']:.3e} steps {d['step']}"
              + (f" cloud {row['cloud_err_vs_f32']:.3e}"
                 if baseline is not None else ""), flush=True)
    wall = time.perf_counter() - t0
    # MOVEMENT assert: this soak is what caught the round-5 transfer
    # freeze (a Mosaic cond miscompile at the flagship geometry left
    # momentum pinned at n*m*v0 with perfect mass — every conservation
    # check green on a simulation that never moved).  The dropped body
    # must have fallen a macroscopic distance by the last frame.
    displacement = float(np.max(np.abs(eng.get_positions(state) - p_init)))
    assert displacement > 0.05, (
        f"[{arena}/{mxu}/{g2p_dot}] FROZEN: max displacement "
        f"{displacement:.2e} after {frames} frames of free fall"
    )
    return {
        "variant": f"arena={arena},mxu={mxu},g2p_dot={g2p_dot}",
        "particles": n,
        "frames": rows,
        "max_mass_rel_err": max(r["mass_rel_err"] for r in rows),
        "displacement": displacement,
        "wall_s": round(wall, 2),
    }, clouds


def main():
    frames = 8
    quick = "--quick" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--frames="):
            frames = int(a.split("=", 1)[1])

    out = {"backend": jax.default_backend(), "frames": frames}
    base, clouds = soak("float32", "highest", frames, quick)
    out["f32_highest"] = base
    for arena, mxu, g2p_dot, key in (
        ("bfloat16", "highest", None, "bf16_highest"),
        ("float32", "high", None, "f32_high"),
        ("bfloat16", "high", None, "bf16_high"),
        # the round-5 candidate default: P2G stays bf16x3 + exact mass,
        # G2P drops to a 1-pass DEFAULT dot (its value operand is already
        # bf16 storage, so only the weight operand loses 2^-8)
        ("bfloat16", "high", "default", "bf16_high_g2pdflt"),
        # 1-pass bf16 dots + exact mass channel: the transfer error
        # (~2^-9) matches the bf16 arena storage quantization order —
        # candidate fast default if momentum/divergence track the others
        ("bfloat16", "default", None, "bf16_default"),
    ):
        res, _ = soak(arena, mxu, frames, quick, baseline=clouds,
                      g2p_dot=g2p_dot)
        res["max_cloud_err_vs_f32"] = max(
            r["cloud_err_vs_f32"] for r in res["frames"])
        out[key] = res

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "SOAK_PRECISION.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: (v if not isinstance(v, dict) else
                          {kk: v[kk] for kk in v
                           if kk in ("max_mass_rel_err",
                                     "max_cloud_err_vs_f32", "wall_s")})
                      for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
