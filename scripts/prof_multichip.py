"""Multi-chip performance story on ONE real chip (VERDICT r2 item 3d).

Multi-chip hardware is not reachable from this box, but the two costs that
decide the 4->8-chip weak-scaling story are measurable without it:

1. SPMD overhead: MultiChipEngine on a mesh(1) runs the FULL sharded
   program — shard_map, halo pack/mask (ppermute degenerates to a no-op
   with an empty perm), migration predicates, extra masking — on one chip.
   Its step time vs MPMEngine bounds the fixed cost the sharded program
   adds on top of the single-chip pipeline.
2. Exchanged bytes/substep: the packed halo protocol's payload is
   halo_capacity octs x (8 B metadata + 8 KB pool row) per direction plus
   the migration buffer — static shapes, so exact by construction.
   Reported for the BASELINE config-5 (100M on a 4x2 mesh) capacities and
   compared against v5e ICI (~400 GB/s/link) for a per-substep budget.

Writes MULTICHIP_PERF.json and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bytes_per_substep(comm) -> dict:
    """Exact exchanged bytes per substep of the packed halo protocol."""
    h = comm.halo_capacity
    ndir = len(comm._directions())
    row_b = 16 * 128 * 4
    meta_b = 8
    mig_b = 0
    # migration: per model, per direction, mig_cap slots x (pos3 + fields)
    halo = ndir * h * (row_b + meta_b)
    return {
        "directions": ndir,
        "halo_capacity_octs": h,
        "halo_bytes": int(halo),
        "migration_capacity": comm.mig_cap,
        "note": "migration adds mig_cap x (12B pos + field bytes) per "
                "model per direction only on rebucket substeps",
        "ici_budget_ms_at_400GBs": halo / 400e9 * 1e3,
    }


def main():
    import sys

    import jax
    import jax.numpy as jnp

    import claymore_tpu as cmt
    from claymore_tpu.utils.cache import enable_compilation_cache
    from claymore_tpu.io.sampler import sample_uniform_box_world
    from claymore_tpu.parallel.multi import MultiChipEngine

    tiny = "--tiny" in sys.argv                  # CPU smoke of the harness
    if tiny:
        # env vars alone do not displace the ambient axon plugin
        jax.config.update("jax_platforms", "cpu")
    enable_compilation_cache()
    on_tpu = jax.default_backend() == "tpu"

    if tiny:
        cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=256,
                            default_dt=5e-4, rebucket_auto=True)
        span = 0.15
    else:
        cfg = cmt.SimConfig(domain_bits=8, max_active_blocks=8192,
                            default_dt=1e-4, rebucket_auto=True,
                            pallas_chunk=16, particle_tile=512)
        span = 0.2
    lo, hi = 0.4 - span / 2, 0.4 + span / 2
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=5e3, nu=0.4)
    pos = sample_uniform_box_world(
        cfg.dx, [lo, 0.5, lo], [hi, 0.5 + span, hi], cfg.ppc)
    n = pos.shape[0]

    def timed_steps(run_steps, state, n_steps, reps=3):
        best = 1e30
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run_steps(state, n_steps, 1e9)
            # forced readback: block_until_ready does not reliably block
            # through the axon tunnel
            float(np.asarray(out.t))
            best = min(best, time.perf_counter() - t0)
        return best, out

    results = {"particles": n, "backend": jax.default_backend()}
    # merge over a prior artifact so sections can be re-measured
    # independently (e.g. mesh1 after a comm fix, keeping config5)
    if not tiny and os.path.exists("MULTICHIP_PERF.json"):
        try:
            with open("MULTICHIP_PERF.json") as f:
                prior = json.load(f)
            if prior.get("backend") == results["backend"]:
                prior.update(results)
                results = prior
        except Exception:
            pass

    def flush():
        # write after every section: a late OOM/compile failure must not
        # lose the measurements already taken
        with open("MULTICHIP_PERF.json", "w") as f:
            json.dump(results, f, indent=1)

    # --- single-chip engine -------------------------------------------
    eng1 = cmt.MPMEngine(cfg, [mat], tile_chunk=64, use_pallas=on_tpu)
    s1 = eng1.init_state([pos], [(0.0, -0.5, 0.0)])
    s1 = eng1.run_steps(s1, 2, 1e9)          # warm + compile
    float(np.asarray(s1.t))
    dt1, s1 = timed_steps(eng1.run_steps, s1, 20)
    results["single_ms_per_step"] = dt1 / 20 * 1e3
    flush()

    # --- mesh(1) sharded engine ----------------------------------------
    engm = MultiChipEngine(cfg, [mat], n_devices=1, tile_chunk=64,
                           use_pallas=on_tpu)
    sm = engm.init_state([pos], [(0.0, -0.5, 0.0)])
    sm = engm.run_steps(sm, 2, 1e9)
    float(np.asarray(sm.t))
    dtm, sm = timed_steps(engm.run_steps, sm, 20)
    results["mesh1_ms_per_step"] = dtm / 20 * 1e3
    results["spmd_overhead_pct"] = (dtm / dt1 - 1.0) * 100.0
    engm.check_health(sm, strict=False)
    results["mesh1_halo_bytes_per_substep"] = bytes_per_substep(engm.comm)
    flush()

    # --- config-5 single-shard unit cost (VERDICT r3 item 3) -----------
    # One 4x2-mesh shard of the 100M scene: domain_bits=10 geometry with
    # ~12.5M particles on one chip — the weak-scaling unit the 8-chip run
    # would replicate (reference: near-perfect 4-GPU scaling,
    # docs/benchmark.rst:40-55).
    if "--config5shard" in sys.argv:
        import dataclasses
        from claymore_tpu.core.engine import exact_tiles
        from claymore_tpu.io.sampler import sample_sphere

        cfgs = cmt.SimConfig(domain_bits=10, max_active_blocks=40960,
                             default_dt=5e-5, rebucket_auto=True,
                             pallas_chunk=16, particle_tile=512)
        # sphere sized to one shard's share of the 100M scene: 12.5M
        # particles = (4/3) pi r^3 * 1024^3 cells * 8 ppc  =>  r ~ 0.0703
        post = sample_sphere(cfgs.dx, (0.5, 0.55, 0.5), 0.0703, cfgs.ppc)
        cfgs = dataclasses.replace(
            cfgs, max_tiles=exact_tiles(cfgs, [post], slack=1.25))
        mats = cmt.FixedCorotated(volume=cfgs.default_volume(), e=5e3, nu=0.4)
        engs = cmt.MPMEngine(cfgs, [mats], tile_chunk=64, use_pallas=on_tpu)
        ss = engs.init_state([post], [(0.0, -0.5, 0.0)])
        ss = engs.run_steps(ss, 2, 1e9)
        float(np.asarray(ss.t))
        dts, ss = timed_steps(engs.run_steps, ss, 20)
        results["config5_shard_particles"] = int(post.shape[0])
        results["config5_shard_ms_per_step"] = dts / 20 * 1e3
        d = engs.diagnostics(ss)
        results["config5_shard_dropped"] = int(
            d.get("model0_dropped_tiles", 0))
        flush()

    # --- BASELINE config-5 exchange accounting (4x2 mesh, 1024^3) ------
    # capacities from scenes/sphere_100m_8dev.json
    cfg5 = cmt.SimConfig(domain_bits=10, max_active_blocks=65536,
                         default_dt=1e-4, rebucket_auto=True,
                         particle_tile=512)
    reach = max(cfg5.arena_lo + cfg5.arena_span - 1, -cfg5.arena_lo, 1)
    from claymore_tpu.parallel.multi import HaloComm
    comm5 = HaloComm(cfg5, (("x", 0), ("z", 2)), (4, 2),
                     margin=reach, mig_cap=262144, halo_capacity=8192)
    results["config5_4x2_halo"] = bytes_per_substep(comm5)
    # and with the DERIVED default capacity (what a user gets hands-off)
    comm5d = HaloComm(cfg5, (("x", 0), ("z", 2)), (4, 2),
                      margin=reach, mig_cap=262144)
    results["config5_4x2_halo_derived_default"] = bytes_per_substep(comm5d)

    with open("MULTICHIP_PERF.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
