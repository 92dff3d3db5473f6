"""Bisect the round-5 gate regression (red VALIDATE cloud_err ~0.195).

The gate's db=6 "exact" pair (f32 arenas, HIGHEST dots) diverged from the
XLA oracle after the kernel lever flips in 1d8ba5f/6f13dc4.  CPU interpret
tests stay green, so this is a Mosaic lowering issue in one of the levers:

  CLAYMORE_P2G_DG=1     dot_general a@b.T P2G     (new default)
  CLAYMORE_P2G_CHANS=13 13 live P2G channel rows  (new default)
  CLAYMORE_TILE_SKIP=0  no per-tile liveness cond (new default)
  g2p_dot_precision=default  1-pass bf16 G2P dot  (new default)

Each variant runs in a SUBPROCESS (env is read at trace time) and reports
cloud_err + a corrupted-particle census.  Run on the chip.
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = [
    ("current", {}),
    ("old_all", {"CLAYMORE_P2G_DG": "0", "CLAYMORE_P2G_CHANS": "16",
                 "CLAYMORE_TILE_SKIP": "1", "CLAYMORE_G2P_DOT": "highest"}),
    ("p2g_einsum", {"CLAYMORE_P2G_DG": "0"}),
    ("chans16", {"CLAYMORE_P2G_CHANS": "16"}),
    ("tileskip", {"CLAYMORE_TILE_SKIP": "1"}),
    ("g2p_highest", {"CLAYMORE_G2P_DOT": "highest"}),
]


def child():
    import numpy as np
    import jax.numpy as jnp
    import claymore_tpu as cmt
    from claymore_tpu.io.sampler import sample_uniform_box_world
    from claymore_tpu.utils.cache import enable_compilation_cache
    import dataclasses as _dc

    enable_compilation_cache()
    import jax
    dev = jax.devices()[0]
    assert dev.platform != "cpu", (
        f"child fell back to CPU ({dev}); the axon tunnel was busy — "
        "re-run when the chip is free")
    base = cmt.SimConfig(domain_bits=6, max_active_blocks=512,
                         default_dt=2e-4)
    cfg = _dc.replace(base, g2p_arena_dtype="float32",
                      mxu_precision="highest")
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4, nu=0.3)
    pos = sample_uniform_box_world(cfg.dx, [0.4] * 3, [0.6] * 3, cfg.ppc)
    ref = cmt.MPMEngine(cfg, [mat], tile_chunk=8)
    pal = cmt.MPMEngine(cfg, [mat], tile_chunk=8, use_pallas=True)
    v0 = [(0.2, -0.4, 0.1)]
    sr, sp = ref.init_state([pos], v0), pal.init_state([pos], v0)
    fe = jnp.float32(1.0)
    for _ in range(4):
        sr = ref.substep(sr, fe)
        sp = pal.substep(sp, fe)
    gr, gp = np.asarray(sr.grid), np.asarray(sp.grid)
    pr, pp = ref.get_positions(sr), pal.get_positions(sp)
    out = {"particles": int(pr.shape[0]), "pal_particles": int(pp.shape[0])}
    if pr.shape == pp.shape:
        # unsorted: valid while no rebucket fired in 4 substeps (order is
        # init order in both engines) — localizes corrupted slots exactly
        d = np.abs(pr - pp).max(axis=1)
        out["unsorted_max"] = float(d.max())
        out["unsorted_bad_gt1e4"] = int((d > 1e-4).sum())
        out["unsorted_bad_gt1e2"] = int((d > 1e-2).sum())
        bad = np.argsort(d)[-8:][::-1]
        out["worst_idx"] = [int(i) for i in bad]
        out["worst_err"] = [float(d[i]) for i in bad]
        kr = np.lexsort((pr[:, 2], pr[:, 1], pr[:, 0]))
        kp = np.lexsort((pp[:, 2], pp[:, 1], pp[:, 0]))
        out["cloud_err"] = float(np.max(np.abs(pr[kr] - pp[kp])))
    out["grid_err"] = float(np.max(np.abs(gr - gp)))
    out["grid_mass_rel"] = float(
        abs(gr[:-1, 0:4].sum() - gp[:-1, 0:4].sum())
        / max(gr[:-1, 0:4].sum(), 1e-30))
    print("RESULT " + json.dumps(out), flush=True)


def main():
    names = sys.argv[1].split(";") if len(sys.argv) > 1 else None
    results = {}
    for name, env in VARIANTS:
        if names and name not in names:
            continue
        e = {**os.environ, **env}
        p = subprocess.run(
            [sys.executable, __file__, "--child"], env=e,
            capture_output=True, text=True, timeout=1200)
        line = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
        results[name] = json.loads(line[0][7:]) if line else {
            "error": (p.stdout + p.stderr)[-400:]}
        print(f"{name:>12}: {json.dumps(results[name])[:220]}", flush=True)
    with open("/tmp/bisect_cloud.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        main()
