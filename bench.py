"""Benchmark harness — single chip.

Default: the BASELINE.md flagship — the ~25M-particle elastic sphere on a
256^3 sparse grid (the reference demonstrates 5-40M particles on one GPU,
/root/reference/README.md:32); reports M particle-steps/sec/chip and
ms/step.  ``vs_baseline`` compares against the reference's single-GPU
fused G2P2G pipeline at an estimated 250 M particle-steps/s on its Quadro
P6000 (the repo publishes claims in prose, not tables — see BASELINE.md).

Other BASELINE configs: --scene=cube (1M elastic cube) | dambreak | sand |
nacc | multimat | sphere.  Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

CLAYMORE_BASELINE_MPPS = 250.0


def _tight_tiles(cfg, parts, slack: float = 1.25) -> int:
    """Tile capacity sized from the sampled models (incl. the tile plan's
    oct-group padding) instead of the generic tiles_for heuristic, which
    over-allocates ~35% dead tiles — at bench scale that is real HBM and
    real window traffic (dead groups still fetch their 64 KB windows)."""
    from claymore_tpu.core.engine import exact_tiles

    return exact_tiles(cfg, parts, slack=slack)


def build(scene: str, quick: bool):
    import claymore_tpu as cmt
    from claymore_tpu.io.sampler import sample_uniform_box_world, sample_sphere

    # particle_tile=512 ~= one tile per occupied block (~8 ppc * 64 cells):
    # arena traffic per tile is fixed, so fewer tiles = less HBM glue
    # (measured 70 -> 75 Mpps at 1M on v5e, round 2).
    # precision rides the SimConfig defaults (bf16x3 dots + exact mass
    # channel, bf16 arenas): at 1M the manual bf16x3 split measured 0.9
    # ms/step slower than HIGHEST (latency-bound regime, round-3 trace),
    # but at 12-25M the two dots are 61% of the substep
    # (ABLATE_KERNEL.json) and the 3-pass transfer wins outright;
    # conservation evidence in SOAK_PRECISION.json.
    cfg = cmt.SimConfig(domain_bits=8, max_active_blocks=8192, default_dt=1e-4,
                        rebucket_auto=True, pallas_chunk=16, particle_tile=512)
    vol = cfg.default_volume()
    span = 0.12 if quick else 0.2
    lo, hi = 0.4 - span / 2, 0.4 + span / 2
    colliders = ()

    if scene == "cube":
        mats = [cmt.FixedCorotated(volume=vol, e=5e3, nu=0.4)]
        parts = [sample_uniform_box_world(
            cfg.dx, [lo, 0.5, lo], [hi, 0.5 + span, hi], cfg.ppc)]
        v0s = [(0.0, -0.5, 0.0)]
    elif scene == "sphere25m":
        # BASELINE.md flagship: ~25M-particle elastic sphere, 256^3 grid
        # (the reference demonstrates 5-40M on one GPU, README.md:32).
        # Capacities are sized from the sampled model: the generic tiles_for
        # heuristic would allocate ~35% dead tiles, and at 25M that is GBs
        # of HBM and tens of ms of arena traffic per step.
        cfg = cmt.SimConfig(domain_bits=8, max_active_blocks=65536,
                            default_dt=1e-4, rebucket_auto=True,
                            pallas_chunk=16, particle_tile=512)
        pos = sample_sphere(cfg.dx, (0.5, 0.55, 0.5), 0.3547, cfg.ppc)
        vol = cfg.default_volume()
        mats = [cmt.FixedCorotated(volume=vol, e=5e3, nu=0.4)]
        parts = [pos]
        v0s = [(0.0, -0.5, 0.0)]
    elif scene == "sphere":
        mats = [cmt.FixedCorotated(volume=vol, e=5e3, nu=0.4)]
        parts = [sample_sphere(cfg.dx, (0.4, 0.6, 0.4), span / 2 * 1.24, cfg.ppc)]
        v0s = [(0.0, -0.5, 0.0)]
    elif scene == "dambreak12m":
        # VERDICT r3 item 8: high-churn flagship — a 12M-particle water
        # column collapse.  Unlike the settling sphere (which flatters the
        # amortized drift-triggered rebucket: low sustained velocities,
        # rebuilds every ~40-80 substeps), the collapsing column keeps a
        # large particle fraction at the CFL bound so rebuilds fire every
        # few substeps and the sort chain's true cost is inside the number.
        import dataclasses as _dc
        cfg = _dc.replace(cfg, max_active_blocks=65536)
        mats = [cmt.JFluid(volume=vol)]
        parts = [sample_uniform_box_world(
            cfg.dx, [0.1, 0.1, 0.1], [0.4, 0.7, 0.6], cfg.ppc)]
        # launched, not at rest: ~0.08 cells/substep of drift from step 0
        # makes the drift-triggered rebuild fire every ~5-10 substeps inside
        # the measured window (the sphere rebuilds every ~40-80)
        v0s = [(2.0, -2.0, 0.0)]
        import dataclasses as _dc2
        # slack 2.5, not the usual 1.25-1.5: the launched column SPREADS —
        # at 1.5 the 2026-08-20 run dropped 765 tiles (1.36M particles,
        # 11% of the mass) by the end of the measured window.  Occupancy
        # grows with the collapse, so the capacity must cover the end
        # state, not the init state; dropped_tiles stays the loud guard.
        cfg = _dc2.replace(cfg, max_tiles=_tight_tiles(cfg, parts, slack=2.5))
        return cfg, mats, parts, v0s, colliders
    elif scene in ("dambreak", "dambreak_hs"):
        # 4.3M-particle fluid spreads over far more blocks than the solids
        # (bench JSON block_overflow caught 8192 being short)
        import dataclasses as _dc
        cfg = _dc.replace(cfg, max_active_blocks=24576)
        mats = [cmt.JFluid(volume=vol)]
        parts = [sample_uniform_box_world(
            cfg.dx, [0.1, 0.1, 0.1], [0.1 + span, 0.1 + 2 * span, 0.1 + 2 * span],
            cfg.ppc)]
        v0s = [(0.0, 0.0, 0.0)]
        if scene == "dambreak_hs":
            # tilted frictional ramp resolved INSIDE the Pallas grid kernel
            # (VERDICT r3 item 5: collider scenes must keep the fast path)
            from claymore_tpu.models.boundary import HalfSpace
            colliders = (HalfSpace((0.0, 0.12, 0.0), (0.25, 1.0, 0.0),
                                   kind="slip", friction=0.2),)
    elif scene == "dambreak_sdf":
        # the reference's flagship demos are SDF-collider scenes
        # (dragon/bathtub, MGSP/mgmpm_kernels.cuh:363); this is the
        # fast-grid-path proof for grid-sampled SDF colliders (VERDICT r4
        # item 7): a 4.3M dam break against a procedural 128^3 SDF dome,
        # resolved from the static per-cell oct cache inside the Pallas
        # grid kernel (models/boundary.py build_oct_cache).
        import dataclasses as _dc
        cfg = _dc.replace(cfg, max_active_blocks=24576)
        mats = [cmt.JFluid(volume=vol)]
        parts = [sample_uniform_box_world(
            cfg.dx, [0.1, 0.1, 0.1], [0.1 + span, 0.1 + 2 * span, 0.1 + 2 * span],
            cfg.ppc)]
        v0s = [(1.0, 0.0, 0.0)]
        from claymore_tpu.models.boundary import SignedDistanceCollider
        res, sdx = 128, 1.0 / 128
        ax = (np.arange(res, dtype=np.float32) + 0.5) * sdx
        X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
        # solid dome (sphere cap) sitting on the floor in the flow's path
        sdf = np.sqrt((X - 0.55) ** 2 + (Y - 0.02) ** 2
                      + (Z - 0.35) ** 2) - 0.12
        colliders = (SignedDistanceCollider(sdf, sdx, kind="slip",
                                            friction=0.1),)
    elif scene == "sand":
        mats = [cmt.Sand(volume=vol, e=1e4, rho=1500.0)]
        parts = [sample_uniform_box_world(
            cfg.dx, [0.4, 0.1, 0.4], [0.4 + span, 0.1 + 2 * span, 0.4 + span],
            cfg.ppc)]
        v0s = [(0.0, 0.0, 0.0)]
    elif scene == "nacc":
        mats = [cmt.NACC(volume=vol, e=1e4)]
        parts = [sample_uniform_box_world(
            cfg.dx, [0.4, 0.1, 0.4], [0.4 + span, 0.1 + 2 * span, 0.4 + span],
            cfg.ppc)]
        v0s = [(0.0, 0.0, 0.0)]
    elif scene == "multimat":
        # ~1M particles per material: small boxes only measure the fixed
        # per-material pass cost, not throughput
        import dataclasses as _dc
        cfg = _dc.replace(cfg, max_active_blocks=16384)
        h = span
        mats = [
            cmt.FixedCorotated(volume=vol, e=5e3, nu=0.4),
            cmt.JFluid(volume=vol),
            cmt.Sand(volume=vol, e=1e4, rho=1500.0),
        ]
        parts = [
            sample_uniform_box_world(cfg.dx, [0.2, 0.5, 0.2],
                                     [0.2 + h, 0.5 + h, 0.2 + h], cfg.ppc),
            sample_uniform_box_world(cfg.dx, [0.5, 0.1, 0.5],
                                     [0.5 + h, 0.1 + h, 0.5 + h], cfg.ppc),
            sample_uniform_box_world(cfg.dx, [0.6, 0.5, 0.2],
                                     [0.6 + h, 0.5 + h, 0.2 + h], cfg.ppc),
        ]
        v0s = [(0.0, -0.5, 0.0)] * 3
    else:
        raise SystemExit(f"unknown scene {scene}")
    import dataclasses
    cfg = dataclasses.replace(cfg, max_tiles=_tight_tiles(cfg, parts))
    return cfg, mats, parts, v0s, colliders


def _write_validate_artifact(path="VALIDATE.json"):
    """Compiled-kernel-vs-oracle check recorded next to the bench numbers
    (scripts/validate_tpu.py is the long-form version; this is the always-on
    regression guard — a Mosaic lowering regression must not ship inside a
    good-looking bench JSON)."""
    import jax
    import jax.numpy as jnp

    import claymore_tpu as cmt
    from claymore_tpu.io.sampler import sample_uniform_box_world

    import dataclasses as _dc

    def run_pair(cfg, mat=None):
        # the ORACLE engine is always pinned to f32 arenas + exact dots —
        # comparing a quantized kernel against a quantized oracle can't
        # certify conservation (the r4 bf16 default flip shipped exactly
        # that bug: the oracle's own mass drifted at "high" and the gate
        # went permanently red, VERDICT r4 weak #1)
        ocfg = _dc.replace(cfg, g2p_arena_dtype="float32",
                           mxu_precision="highest",
                           g2p_dot_precision="highest")
        if mat is None:
            mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4,
                                     nu=0.3)
        pos = sample_uniform_box_world(cfg.dx, [0.4] * 3, [0.6] * 3, cfg.ppc)
        ref = cmt.MPMEngine(ocfg, [mat], tile_chunk=8)
        pal = cmt.MPMEngine(cfg, [mat], tile_chunk=8, use_pallas=True)
        v0 = [(0.2, -0.4, 0.1)]
        sr, sp = ref.init_state([pos], v0), pal.init_state([pos], v0)
        pi_r, pi_p = ref.get_positions(sr), pal.get_positions(sp)
        fe = jnp.float32(1.0)
        for _ in range(4):
            sr = ref.substep(sr, fe)
            sp = pal.substep(sp, fe)
        gr, gp = np.asarray(sr.grid), np.asarray(sp.grid)
        pr, pp = ref.get_positions(sr), pal.get_positions(sp)
        kr = np.lexsort((pr[:, 2], pr[:, 1], pr[:, 0]))
        kp = np.lexsort((pp[:, 2], pp[:, 1], pp[:, 0]))
        cloud = float(np.max(np.abs(pr[kr] - pp[kp]))) \
            if pr.shape == pp.shape else float("inf")
        expected = pos.shape[0] * mat.mass
        # MOVEMENT invariant: a frozen kernel (every conservation number
        # perfect, positions never advected) passed this gate for a full
        # round — the r5 soak caught the transfer kernel freezing at the
        # flagship geometry under a Mosaic cond miscompile while mass and
        # momentum stayed bit-perfect (SOAK_PRECISION.json, round-5
        # postmortem in docs/benchmarks.md).  The kernel's own
        # displacement must track the oracle's, not just sit within the
        # cloud tolerance.
        disp_o = float(np.max(np.abs(pr - pi_r)))
        disp_k = float(np.max(np.abs(pp - pi_p)))
        return {
            "grid_err": float(np.max(np.abs(gr - gp))),
            "grid_mass_rel": float(
                abs(gr[:-1, 0:4].sum() - gp[:-1, 0:4].sum())
                / max(gr[:-1, 0:4].sum(), 1e-30)),
            "mass_vs_analytic": float(
                abs(gp[:-1, 0:4].sum() - expected) / expected),
            "cloud_err": cloud,
            "displacement": disp_k,
            "displacement_oracle": disp_o,
            "moves": bool(disp_k > 0.5 * disp_o > 0.0),
            "particles": int(pos.shape[0]),
        }

    base = cmt.SimConfig(domain_bits=6, max_active_blocks=512,
                         default_dt=2e-4)
    # "exact" means EVERY reduced-precision knob pinned off: when the
    # G2P dot default flipped to the 1-pass bf16 mode (6f13dc4) this pair
    # silently kept quantizing and sat at 4.3e-5 against its own 1e-5
    # bound — the second default-flip-breaks-the-gate incident in two
    # rounds (bisect: scripts/bisect_cloud.py, /tmp/bisect_cloud.json)
    exact_cfg = _dc.replace(base, g2p_arena_dtype="float32",
                            mxu_precision="highest",
                            g2p_dot_precision="highest")
    # (1) bit-tight Mosaic lowering regression: f32 arenas + exact dots —
    # the kernel must match the oracle to f32 roundoff accumulation
    exact = run_pair(exact_cfg)
    # (2) the SHIPPING defaults (bf16 arenas + bf16x3 dots + exact mass)
    # vs the f32 oracle: mass at f32 roundoff (the exact-mass side dot),
    # trajectories within the storage-quantization budget (~2^-9 velocity
    # per gather over 4 substeps)
    dflt = run_pair(base)
    # (3) in-kernel SVD materials through the compiled (Mosaic) kernel —
    # the Jacobi/Givens lowering is the risk surface the elastic check
    # can't see (reference constitutive_models.cuh:78-335)
    vol = exact_cfg.default_volume()
    sand = run_pair(exact_cfg, cmt.Sand(volume=vol, e=1e4, rho=1500.0))
    nacc = run_pair(exact_cfg, cmt.NACC(volume=vol, e=1e4))
    svd_ok = all(r["cloud_err"] < 1e-5 and r["grid_err"] < 1e-4
                 and r["moves"] for r in (sand, nacc))
    # (4) the FLAGSHIP kernel geometry (tile=512, chunk=16, db=7) under
    # the shipping defaults.  The r5 freeze was geometry-dependent: the
    # db=6/tile=256 pairs above compiled correctly while the flagship
    # shape froze — a gate that never runs the shipping geometry
    # certifies the wrong program.
    flag_cfg = cmt.SimConfig(domain_bits=7, max_active_blocks=2048,
                             default_dt=2e-4, particle_tile=512,
                             pallas_chunk=16)
    flag = run_pair(flag_cfg)
    art = {
        "check": "mosaic kernel vs f32 XLA oracle, 4 substeps, "
                 "db=6 + flagship geometry (db=7 tile=512 chunk=16)",
        "exact": exact,
        "default": dflt,
        "sand": sand,
        "nacc": nacc,
        "flagship_geom": flag,
        "ok": bool(exact["cloud_err"] < 1e-5 and exact["grid_err"] < 1e-4
                   and exact["moves"]
                   and dflt["grid_mass_rel"] < 1e-6
                   and dflt["mass_vs_analytic"] < 1e-6
                   and dflt["cloud_err"] < 1e-3 and dflt["moves"]
                   and flag["grid_mass_rel"] < 1e-6
                   and flag["mass_vs_analytic"] < 1e-6
                   and flag["cloud_err"] < 1e-3 and flag["moves"]
                   and svd_ok),
    }
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
    return art["ok"]


def main():
    quick = "--quick" in sys.argv
    xla_only = "--xla" in sys.argv
    # scene-matrix runs skip the gate (it runs with the flagship; a dozen
    # last-write-wins rewrites of VALIDATE.json under a possibly-degraded
    # remote worker add risk, not signal — see the 2026-08-20 postmortem)
    nogate = "--nogate" in sys.argv
    scene = "sphere25m"
    precision = None
    arena = None
    for a in sys.argv[1:]:
        if a.startswith("--scene="):
            scene = a.split("=", 1)[1]
        # ablation knobs (perf/accuracy tradeoff study, docs/benchmarks.md):
        # --precision=highest|high|default, --arena=bf16
        if a.startswith("--precision="):
            precision = a.split("=", 1)[1]
        if a.startswith("--arena="):
            arena = a.split("=", 1)[1]

    import jax
    import jax.numpy as jnp

    import claymore_tpu as cmt
    from claymore_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg, mats, parts, v0s, colliders = build(scene, quick)
    if precision or arena:
        import dataclasses as _dc
        kw = {}
        if precision:
            kw["mxu_precision"] = precision
        if arena:
            kw["g2p_arena_dtype"] = {"bf16": "bfloat16"}.get(arena, arena)
        cfg = _dc.replace(cfg, **kw)
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and not quick and not xla_only and not nogate:
        try:
            _write_validate_artifact()
        except Exception as e:          # never block the bench number
            with open("VALIDATE.json", "w") as f:
                json.dump({"ok": False, "error": repr(e)[:500]}, f)
    eng = cmt.MPMEngine(cfg, mats, colliders, tile_chunk=64,
                        use_pallas=(on_tpu and not xla_only))
    # the real fast-path predicate (in-kernel analytic colliders AND
    # oct-cached static SDF colliders both keep the Pallas grid kernel)
    from claymore_tpu.ops.pallas_grid import kernel_colliders_ok
    grid_backend = (
        "pallas" if eng.use_pallas and kernel_colliders_ok(cfg, colliders)
        else "xla"
    )
    n = sum(p.shape[0] for p in parts)

    state = eng.init_state(parts, v0s)
    frame_end = jnp.float32(1e9)
    # movement probe: sample the first 4096 particle positions now and
    # after the measured window.  The r5 freeze postmortem
    # (docs/benchmarks.md): a Mosaic miscompile can freeze advection while
    # every conservation counter stays perfect, and a frozen sim performs
    # the same per-step compute — i.e. a plausible-looking Mpps on dead
    # physics.  The headline must carry its own liveness evidence.
    probe0 = np.asarray(eng.get_positions(state))[:4096]

    # compile + warm up; force a REAL device sync (block_until_ready does not
    # reliably block on the axon remote backend)
    state = eng.substep(state, frame_end)
    jax.block_until_ready(state)
    float(np.asarray(state.t))

    # big scenes use a long window so the drift-triggered rebucket's
    # amortized cost is inside the measurement (short windows dodge it)
    steps = 5 if quick else (60 if n > 10_000_000 else 20)
    state = eng.run_steps(state, steps, frame_end)  # compile the loop
    jax.block_until_ready(state)
    float(np.asarray(state.t))
    # best of 3 reps — the remote-TPU tunnel occasionally hiccups
    elapsed = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state = eng.run_steps(state, steps, frame_end)
        jax.block_until_ready(state)
        float(np.asarray(state.grid[0, 0, 0]))
        elapsed = min(elapsed, time.perf_counter() - t0)

    mpps = n * steps / elapsed / 1e6

    # --- roofline model: explain the number, don't just assert it ---
    # FLOPs/particle/substep (span-2 arenas, one tile = 512 particles):
    # G2P matmul [24,64]@[64,3t] = 9216/p; P2G [32,4t]@[4t,64] = 16384/p;
    # weight one-hots + APIC/material/SVD ~4k (VPU).  HBM bytes/particle:
    # particle state in+out (~104 B for F-materials), window gather+scatter
    # paths ~130 B (oct windows, docs/design_octpool.md), grid update ~20 B.
    flop_pp = 9216 + 16384 + 4000
    bytes_pp = 104 + 130 + 20
    model_tflops = n * steps * flop_pp / elapsed / 1e12
    model_gbs = n * steps * bytes_pp / elapsed / 1e9
    # loud loss accounting in the recorded artifact: dropped particles or
    # block overflow would silently inflate throughput otherwise
    # liveness: frozen physics keeps particle slots (and hence the probe
    # slice) bit-stable, so max|dp|==0 exactly; any real simulation shows
    # per-substep CFL-scale drift here.  (A rebucket permuting the slice
    # only makes the displacement read larger — safe direction.)
    probe1 = np.asarray(eng.get_positions(state))[:4096]
    displacement = float(np.max(np.abs(probe1 - probe0)))
    alive = sum(int(np.asarray(m.active).sum()) for m in state.models)
    expected_mass = sum(p.shape[0] * m.mass for p, m in zip(parts, mats))
    grid_mass = float(np.asarray(state.grid)[:-1, 0:4].sum())
    mass_rel_err = abs(grid_mass - expected_mass) / expected_mass
    dropped_tiles = sum(int(np.asarray(m.tiles.dropped)[0])
                        for m in state.models)
    print(json.dumps({
        "metric": "M particle-steps/sec/chip (elastic cube, fixed corotated)"
        if scene == "cube" else f"M particle-steps/sec/chip ({scene})",
        "value": round(mpps, 3),
        "unit": "Mpps",
        "vs_baseline": round(mpps / CLAYMORE_BASELINE_MPPS, 4),
        "particles": n,
        "ms_per_step": round(elapsed / steps * 1e3, 3),
        "steps": steps,
        "backend": "pallas" if (on_tpu and not xla_only) else "xla",
        "grid_backend": grid_backend,
        "device": str(jax.devices()[0]),
        "active_particles": alive,
        "dropped_tiles": dropped_tiles,
        "block_overflow": int(np.asarray(state.partition.overflow)[0]),
        "model_tflops": round(model_tflops, 3),
        "model_hbm_gbs": round(model_gbs, 1),
        "mass_rel_err": float(f"{mass_rel_err:.3e}"),
        "displacement": float(f"{displacement:.4e}"),
        "moves": bool(displacement > 0.0),
        "mxu_precision": cfg.mxu_precision,
        "g2p_arena_dtype": cfg.g2p_arena_dtype,
    }))


if __name__ == "__main__":
    main()
