"""Pallas G2P2G kernel equivalence vs the XLA scan path (interpret mode on
CPU; the real kernel runs on TPU via MPMEngine(use_pallas=True))."""

import numpy as np
import jax.numpy as jnp
import pytest

import claymore_tpu as cmt
from claymore_tpu.io.sampler import sample_uniform_box_world


@pytest.mark.parametrize("mat_name,k", [
    ("jfluid", 1),
    # interpret-mode Mosaic emulation is minutes per config on CPU: the
    # F-material and lazy-rebucket variants are opt-in (-m slow); the
    # compiled-path equivalents run on hardware via bench.py's
    # VALIDATE.json and scripts/validate_tpu.py
    pytest.param("fixed_corotated", 1, marks=pytest.mark.slow),
    pytest.param("fixed_corotated", 2, marks=pytest.mark.slow),
])
def test_pallas_matches_xla(mat_name, k):
    # exact equivalence pins f32 arenas: the XLA oracle never quantizes its
    # G2P input (the default bf16 arena bound has its own test below)
    cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=256, default_dt=5e-4,
                        rebucket_every=k, g2p_arena_dtype="float32")
    if mat_name == "fixed_corotated":
        mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4, nu=0.3)
    else:
        mat = cmt.JFluid(volume=cfg.default_volume())
    pos = sample_uniform_box_world(cfg.dx, [0.45] * 3, [0.55] * 3, cfg.ppc)

    ref_eng = cmt.MPMEngine(cfg, [mat], tile_chunk=4)
    pal_eng = cmt.MPMEngine(cfg, [mat], tile_chunk=4, use_pallas="interpret")

    s_ref = ref_eng.init_state([pos], [(0.2, -0.3, 0.1)])
    s_pal = pal_eng.init_state([pos], [(0.2, -0.3, 0.1)])

    fe = jnp.float32(1.0)
    for _ in range(2):
        s_ref = ref_eng.substep(s_ref, fe)
        s_pal = pal_eng.substep(s_pal, fe)

    assert np.allclose(np.asarray(s_ref.grid), np.asarray(s_pal.grid),
                       atol=1e-5, rtol=1e-4)
    # same particle clouds
    pr = ref_eng.get_positions(s_ref)
    pp = pal_eng.get_positions(s_pal)
    kr = np.lexsort((pr[:, 2], pr[:, 1], pr[:, 0]))
    kp = np.lexsort((pp[:, 2], pp[:, 1], pp[:, 0]))
    assert pr.shape == pp.shape
    assert np.max(np.abs(pr[kr] - pp[kp])) < 1e-6
    assert abs(float(s_ref.dt) - float(s_pal.dt)) < 1e-10


def test_pallas_rejects_wide_arena():
    """Span-4 arenas (rebucket_every > 2) have no oct-window kernel path;
    the engine must refuse rather than mis-gather (docs/design_octpool.md)."""
    cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=256,
                        rebucket_every=4)
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4, nu=0.3)
    with pytest.raises(ValueError, match="span-2"):
        cmt.MPMEngine(cfg, [mat], use_pallas=True)


@pytest.mark.slow
def test_bf16_arena_close_and_mass_exact():
    """g2p_arena_dtype="bfloat16" (docs/design_round3.md §3): mass must be
    bit-identical to the f32-arena path (P2G/mass rows untouched); particle
    velocities may differ by the bf16 storage quantization (~2^-9 rel)."""
    base = dict(domain_bits=5, max_active_blocks=256, default_dt=5e-4)
    cfg32 = cmt.SimConfig(**base, g2p_arena_dtype="float32")
    cfg16 = cmt.SimConfig(**base, g2p_arena_dtype="bfloat16")
    mat = cmt.JFluid(volume=cfg32.default_volume())
    pos = sample_uniform_box_world(cfg32.dx, [0.45] * 3, [0.58] * 3,
                                   cfg32.ppc)
    e32 = cmt.MPMEngine(cfg32, [mat], tile_chunk=4, use_pallas="interpret")
    e16 = cmt.MPMEngine(cfg16, [mat], tile_chunk=4, use_pallas="interpret")
    s32 = e32.init_state([pos], [(0.2, -0.3, 0.1)])
    s16 = e16.init_state([pos], [(0.2, -0.3, 0.1)])
    fe = jnp.float32(1.0)
    for _ in range(2):
        s32 = e32.substep(s32, fe)
        s16 = e16.substep(s16, fe)
    g32, g16 = np.asarray(s32.grid), np.asarray(s16.grid)
    # total mass: conserved identically (P2G weights still sum to 1 per
    # particle; only the per-cell distribution shifts with the advected
    # positions)
    np.testing.assert_allclose(g32[:-1, 0:4].sum(), g16[:-1, 0:4].sum(),
                               rtol=1e-6)
    # velocity-derived state: within storage quantization over 2 steps
    p32, p16 = e32.get_positions(s32), e16.get_positions(s16)
    assert p32.shape == p16.shape
    assert np.max(np.abs(p32 - p16)) < 5e-5


def test_forced_bf16x3_split_mass_exact():
    """The SHIPPING arithmetic (bf16x3 split dots + exact-mass side dot +
    bf16 arenas) exercised OFF-hardware via force_mxu_split (VERDICT r4
    weak #5: without this knob the only coverage of the split/exact-mass
    interplay was the on-hardware gate, and the r4 default flip shipped
    with that gate red).  Mass must match the analytic total at f32
    roundoff on BOTH the kernel and the XLA-oracle path (both now carry
    the exact-mass side contraction); trajectories stay within the
    quantization budget vs a pinned f32 oracle."""
    base = dict(domain_bits=5, max_active_blocks=256, default_dt=5e-4)
    # shipping defaults + the forced split (the exact arithmetic the chip
    # runs under mxu_precision="high")
    cfg_d = cmt.SimConfig(**base, force_mxu_split=True)
    assert cfg_d.mxu_precision == "high"           # the shipping default
    assert cfg_d.g2p_arena_dtype == "bfloat16"
    cfg_o = cmt.SimConfig(**base, g2p_arena_dtype="float32",
                          mxu_precision="highest")
    mat = cmt.JFluid(volume=cfg_d.default_volume())
    pos = sample_uniform_box_world(cfg_d.dx, [0.45] * 3, [0.58] * 3,
                                   cfg_d.ppc)
    e_d = cmt.MPMEngine(cfg_d, [mat], tile_chunk=4, use_pallas="interpret")
    e_o = cmt.MPMEngine(cfg_o, [mat], tile_chunk=4)
    s_d = e_d.init_state([pos], [(0.2, -0.3, 0.1)])
    s_o = e_o.init_state([pos], [(0.2, -0.3, 0.1)])
    fe = jnp.float32(1.0)
    for _ in range(2):
        s_d = e_d.substep(s_d, fe)
        s_o = e_o.substep(s_o, fe)
    expected = pos.shape[0] * mat.mass
    for name, s in (("kernel", s_d), ("oracle", s_o)):
        g = np.asarray(s.grid, np.float64)
        rel = abs(g[:-1, 0:4].sum() - expected) / expected
        assert rel < 1e-6, (name, rel)
    p_d, p_o = e_d.get_positions(s_d), e_o.get_positions(s_o)
    assert p_d.shape == p_o.shape
    assert np.max(np.abs(p_d - p_o)) < 1e-3


def test_g2p_default_dot_mass_exact():
    """g2p_dot_precision="default" (1-pass bf16 G2P dot, the round-5 perf
    lever) exercised OFF-hardware via force_mxu_split: G2P carries no
    conservation invariant, so total mass must stay at f32 roundoff (the
    P2G exact-mass side dot is untouched) and trajectories within the
    combined bf16 storage + weight-truncation budget vs the f32 oracle."""
    base = dict(domain_bits=5, max_active_blocks=256, default_dt=5e-4)
    cfg_d = cmt.SimConfig(**base, force_mxu_split=True,
                          g2p_dot_precision="default")
    cfg_o = cmt.SimConfig(**base, g2p_arena_dtype="float32",
                          mxu_precision="highest")
    mat = cmt.JFluid(volume=cfg_d.default_volume())
    pos = sample_uniform_box_world(cfg_d.dx, [0.45] * 3, [0.58] * 3,
                                   cfg_d.ppc)
    e_d = cmt.MPMEngine(cfg_d, [mat], tile_chunk=4, use_pallas="interpret")
    e_o = cmt.MPMEngine(cfg_o, [mat], tile_chunk=4)
    s_d = e_d.init_state([pos], [(0.2, -0.3, 0.1)])
    s_o = e_o.init_state([pos], [(0.2, -0.3, 0.1)])
    fe = jnp.float32(1.0)
    for _ in range(2):
        s_d = e_d.substep(s_d, fe)
        s_o = e_o.substep(s_o, fe)
    expected = pos.shape[0] * mat.mass
    g = np.asarray(s_d.grid, np.float64)
    rel = abs(g[:-1, 0:4].sum() - expected) / expected
    assert rel < 1e-6, rel
    p_d, p_o = e_d.get_positions(s_d), e_o.get_positions(s_o)
    assert p_d.shape == p_o.shape
    assert np.max(np.abs(p_d - p_o)) < 3e-3


def test_xla_oracle_exact_mass_at_reduced_precision():
    """The XLA fallback path (SDF colliders / use_pallas=False) must keep
    the conservation invariant under the default reduced transfer
    precision: its P2G einsum now carries the same exact-mass side
    contraction as the kernel (ADVICE r4 medium).  On CPU the einsum is
    exact either way, so this checks the rewiring, and the TPU gate
    (bench.py VALIDATE) checks the arithmetic."""
    cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=256,
                        default_dt=5e-4)
    assert cfg.mxu_precision == "high"
    mat = cmt.JFluid(volume=cfg.default_volume())
    pos = sample_uniform_box_world(cfg.dx, [0.45] * 3, [0.55] * 3, cfg.ppc)
    eng = cmt.MPMEngine(cfg, [mat], tile_chunk=4)
    s = eng.init_state([pos], [(0.2, -0.3, 0.1)])
    fe = jnp.float32(1.0)
    for _ in range(3):
        s = eng.substep(s, fe)
    expected = pos.shape[0] * mat.mass
    g = np.asarray(s.grid, np.float64)
    rel = abs(g[:-1, 0:4].sum() - expected) / expected
    assert rel < 1e-6
