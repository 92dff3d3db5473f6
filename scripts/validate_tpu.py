"""On-hardware validation of the compiled (Mosaic) Pallas G2P2G path.

The pytest suite exercises the kernel only in interpret mode on CPU
(tests/test_pallas.py); this script runs in the bench environment on the
real chip and checks that the Mosaic-compiled kernel's trajectory matches
the XLA scan oracle (core/transfer.py) — the check the reference cannot
even express, since it has a single CUDA implementation.

Also smoke-tests a domain_bits=10 (1024^3 cell) config: the full-domain
index table is i32[256^3+1] = 64 MB and the rebuild mask 16 MB — this
verifies table/mask memory behaves at the BASELINE config-5 resolution.

Run:  python scripts/validate_tpu.py        (exits nonzero on mismatch)
"""

from __future__ import annotations

import os
import sys

# resolve the package from the repo root without PYTHONPATH (any PYTHONPATH
# value breaks the axon PJRT plugin discovery in this environment)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def cloud_err(a: np.ndarray, b: np.ndarray) -> float:
    ka = np.lexsort((a[:, 2], a[:, 1], a[:, 0]))
    kb = np.lexsort((b[:, 2], b[:, 1], b[:, 0]))
    return float(np.max(np.abs(a[ka] - b[kb])))


def validate_pallas_vs_xla() -> None:
    import jax
    from claymore_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    import claymore_tpu as cmt
    from claymore_tpu.io.sampler import sample_uniform_box_world

    assert jax.default_backend() == "tpu", (
        f"this script validates the Mosaic-compiled kernel; backend is "
        f"{jax.default_backend()} (run it in the bench environment)"
    )

    # bit-tight equivalence pins f32 arenas + exact dots; the shipping
    # bf16 defaults are bounded separately (validate_default_quantized)
    cfg = cmt.SimConfig(domain_bits=7, max_active_blocks=2048,
                        default_dt=2e-4, g2p_arena_dtype="float32",
                        mxu_precision="highest",
                        g2p_dot_precision="highest")
    mats = [
        cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4, nu=0.3),
        cmt.JFluid(volume=cfg.default_volume()),
    ]
    pos = [
        sample_uniform_box_world(cfg.dx, [0.4, 0.5, 0.4], [0.55, 0.65, 0.55],
                                 cfg.ppc),
        sample_uniform_box_world(cfg.dx, [0.3, 0.2, 0.3], [0.45, 0.3, 0.45],
                                 cfg.ppc),
    ]
    v0 = [(0.2, -0.4, 0.0), (0.0, 0.0, 0.0)]

    eng_p = cmt.MPMEngine(cfg, mats, tile_chunk=8, use_pallas=True)
    eng_x = cmt.MPMEngine(cfg, mats, tile_chunk=8, use_pallas=False)
    fe = jnp.float32(1e9)

    s_p = eng_p.init_state(pos, v0)
    s_x = eng_x.init_state(pos, v0)
    for _ in range(3):
        s_p = eng_p.run_steps(s_p, 5, fe)
        s_x = eng_x.run_steps(s_x, 5, fe)
    jax.block_until_ready((s_p, s_x))

    n_total = sum(p.shape[0] for p in pos)
    for i in range(len(mats)):
        pp = eng_p.get_positions(s_p, i)
        px = eng_x.get_positions(s_x, i)
        assert pp.shape == px.shape, (
            f"model {i}: particle count differs: pallas {pp.shape} vs "
            f"xla {px.shape}"
        )
        err = cloud_err(pp, px)
        # 15 substeps of f32 arithmetic with different op orders; the
        # trajectories agree to float roundoff accumulation
        assert err < 5e-5, f"model {i}: cloud divergence {err:.2e}"
        print(f"model {i}: {pp.shape[0]} particles, cloud err {err:.2e}")

    dp, dx_ = eng_p.diagnostics(s_p), eng_x.diagnostics(s_x)
    rel = abs(dp["grid_mass"] - dx_["grid_mass"]) / max(dx_["grid_mass"], 1e-30)
    assert rel < 1e-5, f"grid mass differs: {dp['grid_mass']} vs {dx_['grid_mass']}"
    print(f"grid mass rel diff {rel:.2e}; dt {float(s_p.dt):.3e} vs "
          f"{float(s_x.dt):.3e}; particles {n_total}")
    assert abs(float(s_p.dt) - float(s_x.dt)) < 1e-9


def validate_macro_chunked() -> None:
    """Force several macro chunks (pallas_macro_tiles << tiles) and check
    the lax.scan-chunked pipeline matches the XLA oracle — the path 25M+
    models take (interpret mode compiles this too slowly for the CPU CI
    box, so the check lives here on real hardware)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    import claymore_tpu as cmt
    from claymore_tpu.io.sampler import sample_uniform_box_world

    cfg = cmt.SimConfig(domain_bits=7, max_active_blocks=2048,
                        default_dt=2e-4, g2p_arena_dtype="float32",
                        mxu_precision="highest",
                        g2p_dot_precision="highest")
    cfg_scan = dataclasses.replace(cfg, pallas_macro_tiles=64,
                                   pallas_chunk=16)
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4, nu=0.3)
    pos = sample_uniform_box_world(cfg.dx, [0.4, 0.5, 0.4],
                                   [0.55, 0.65, 0.55], cfg.ppc)
    e1 = cmt.MPMEngine(cfg_scan, [mat], tile_chunk=8, use_pallas=True)
    e2 = cmt.MPMEngine(cfg, [mat], tile_chunk=8, use_pallas=False)
    s1 = e1.init_state([pos], [(0.2, -0.4, 0.0)])
    s2 = e2.init_state([pos], [(0.2, -0.4, 0.0)])
    assert s1.models[0].tiles.block.shape[0] > cfg_scan.pallas_macro_tiles
    fe = jnp.float32(1e9)
    for _ in range(6):
        s1 = e1.substep(s1, fe)
        s2 = e2.substep(s2, fe)
    jax.block_until_ready((s1, s2))
    c1, c2 = e1.get_positions(s1), e2.get_positions(s2)
    assert c1.shape == c2.shape
    err = cloud_err(c1, c2)
    assert err < 5e-5, f"macro-chunked cloud divergence {err:.2e}"
    print(f"macro-chunked pipeline: cloud err {err:.2e}")


def validate_default_quantized() -> None:
    """The SHIPPING defaults (bf16 G2P arenas + bf16x3 dots + exact mass
    channel) vs the f32 oracle: mass must stay at f32 roundoff (the mass
    rows never run quantized), trajectories within the storage-quantization
    budget.  This is the bound the default flagship bench runs under.

    The oracle engine is PINNED to f32 arenas + exact dots: an oracle built
    from the default config would itself run quantized on TPU and the mass
    comparison would certify nothing (the r4 regression, ADVICE r4)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    import claymore_tpu as cmt
    from claymore_tpu.io.sampler import sample_uniform_box_world

    cfg = cmt.SimConfig(domain_bits=7, max_active_blocks=2048,
                        default_dt=2e-4)
    ocfg = dataclasses.replace(cfg, g2p_arena_dtype="float32",
                               mxu_precision="highest",
                        g2p_dot_precision="highest")
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4, nu=0.3)
    pos = sample_uniform_box_world(cfg.dx, [0.4, 0.5, 0.4],
                                   [0.55, 0.65, 0.55], cfg.ppc)
    e_p = cmt.MPMEngine(cfg, [mat], tile_chunk=8, use_pallas=True)
    e_x = cmt.MPMEngine(ocfg, [mat], tile_chunk=8, use_pallas=False)
    s_p = e_p.init_state([pos], [(0.2, -0.4, 0.0)])
    s_x = e_x.init_state([pos], [(0.2, -0.4, 0.0)])
    fe = jnp.float32(1e9)
    s_p = e_p.run_steps(s_p, 8, fe)
    s_x = e_x.run_steps(s_x, 8, fe)
    jax.block_until_ready((s_p, s_x))
    dp, dx_ = e_p.diagnostics(s_p), e_x.diagnostics(s_x)
    rel = abs(dp["grid_mass"] - dx_["grid_mass"]) / max(dx_["grid_mass"],
                                                        1e-30)
    assert rel < 1e-6, f"default-config mass drift vs oracle: {rel:.2e}"
    err = cloud_err(e_p.get_positions(s_p), e_x.get_positions(s_x))
    assert err < 1e-3, f"default-config cloud divergence {err:.2e}"
    print(f"default (bf16 arenas + bf16x3): mass rel {rel:.2e}, "
          f"cloud err {err:.2e} over 8 substeps")


def validate_svd_materials() -> None:
    """Sand + NACC through the COMPILED (Mosaic) kernel vs the XLA oracle:
    the in-kernel Jacobi/Givens SVD path (models/materials.py) is the
    lowering risk surface the elastic check can't see (reference
    constitutive_models.cuh:78-335).  Exact config (f32 arenas + exact
    dots) so any divergence is the kernel, not quantization."""
    import jax
    import jax.numpy as jnp

    import claymore_tpu as cmt
    from claymore_tpu.io.sampler import sample_uniform_box_world

    cfg = cmt.SimConfig(domain_bits=7, max_active_blocks=2048,
                        default_dt=2e-4, g2p_arena_dtype="float32",
                        mxu_precision="highest",
                        g2p_dot_precision="highest")
    vol = cfg.default_volume()
    for name, mat in (
        ("sand", cmt.Sand(volume=vol, e=1e4, rho=1500.0)),
        ("nacc", cmt.NACC(volume=vol, e=1e4)),
    ):
        pos = sample_uniform_box_world(cfg.dx, [0.4, 0.3, 0.4],
                                       [0.55, 0.45, 0.55], cfg.ppc)
        e_p = cmt.MPMEngine(cfg, [mat], tile_chunk=8, use_pallas=True)
        e_x = cmt.MPMEngine(cfg, [mat], tile_chunk=8, use_pallas=False)
        s_p = e_p.init_state([pos], [(0.1, -0.5, 0.0)])
        s_x = e_x.init_state([pos], [(0.1, -0.5, 0.0)])
        fe = jnp.float32(1e9)
        s_p = e_p.run_steps(s_p, 10, fe)
        s_x = e_x.run_steps(s_x, 10, fe)
        jax.block_until_ready((s_p, s_x))
        pp, px = e_p.get_positions(s_p), e_x.get_positions(s_x)
        assert pp.shape == px.shape, (name, pp.shape, px.shape)
        err = cloud_err(pp, px)
        assert err < 5e-5, f"{name}: compiled-SVD cloud divergence {err:.2e}"
        dp, dx_ = e_p.diagnostics(s_p), e_x.diagnostics(s_x)
        rel = abs(dp["grid_mass"] - dx_["grid_mass"]) / max(
            dx_["grid_mass"], 1e-30)
        assert rel < 1e-5, f"{name}: grid mass differs {rel:.2e}"
        print(f"{name}: {pp.shape[0]} particles, cloud err {err:.2e}, "
              f"mass rel {rel:.2e} over 10 substeps")


def smoke_domain10() -> None:
    """1024^3-cell domain (BASELINE config 5 resolution): table + rebuild
    memory smoke test with the compiled kernel."""
    import jax
    import jax.numpy as jnp

    import claymore_tpu as cmt
    from claymore_tpu.io.sampler import sample_uniform_box_world

    cfg = cmt.SimConfig(domain_bits=10, max_active_blocks=4096,
                        default_dt=1e-4)
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=5e3, nu=0.4)
    pos = sample_uniform_box_world(cfg.dx, [0.48, 0.5, 0.48],
                                   [0.52, 0.54, 0.52], cfg.ppc)
    eng = cmt.MPMEngine(cfg, [mat], tile_chunk=8, use_pallas=True)
    s = eng.init_state([pos], [(0.0, -0.5, 0.0)])
    s = eng.run_steps(s, 5, jnp.float32(1e9))
    jax.block_until_ready(s)
    d = eng.diagnostics(s)
    expected = pos.shape[0] * mat.mass
    assert abs(d["grid_mass"] - expected) < 1e-3 * expected, (
        d["grid_mass"], expected)
    assert d["block_overflow"] == 0
    print(f"domain_bits=10: {pos.shape[0]} particles, "
          f"{d['active_octs']} octs, mass ok, t={d['t']:.5f}")


if __name__ == "__main__":
    validate_pallas_vs_xla()
    validate_macro_chunked()
    validate_default_quantized()
    validate_svd_materials()
    smoke_domain10()
    print("TPU validation: OK")
    sys.exit(0)
