"""Multi-chip engine tests on the 8-virtual-CPU-device mesh: halo-reduced
grids must match the single-chip engine bit-for-tolerance, migration must
hand particles across slab boundaries, and conservation must hold globally
(the reference could only validate multi-GPU on real hardware —
SURVEY.md section 4; here it runs in CI)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import claymore_tpu as cmt
from claymore_tpu.parallel.multi import MultiChipEngine
from claymore_tpu.io.sampler import sample_uniform_box_world


def make_scene(cfg, lo=0.35, hi=0.65, v0=(0.4, -0.2, 0.1)):
    pos = sample_uniform_box_world(cfg.dx, [lo] * 3, [hi] * 3, cfg.ppc)
    return pos, v0


@pytest.mark.parametrize("n_dev,rebucket_every", [
    (2, 1),
    # the wider matrix (more devices; lazy rebucketing where the partition
    # must still track halo mass every substep — VERDICT r1 weak #2) is
    # -m slow: each param costs a full sharded compile on the 1-core CI box
    pytest.param(4, 1, marks=pytest.mark.slow),
    pytest.param(2, 2, marks=pytest.mark.slow),
    pytest.param(4, 4, marks=pytest.mark.slow),
])
def test_multichip_matches_single_chip(n_dev, rebucket_every):
    cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=256, default_dt=5e-4,
                        rebucket_every=rebucket_every)
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4, nu=0.3)
    pos, v0 = make_scene(cfg)

    single = cmt.MPMEngine(cfg, [mat], tile_chunk=4)
    s1 = single.init_state([pos], [v0])

    multi = MultiChipEngine(
        cfg, [mat], n_devices=n_dev, tile_chunk=4, migration_capacity=256,
    )
    sm = multi.init_state([pos], [v0])

    d1 = single.diagnostics(s1)
    dm = multi.diagnostics(sm)
    assert abs(d1["grid_mass"] - dm["grid_mass"]) < 1e-4 * max(1, d1["grid_mass"])
    assert dm["model0_active"] == pos.shape[0]

    frame_end = jnp.float32(1.0)
    for _ in range(4):
        s1 = single.substep(s1, frame_end)
        sm = multi.substep(sm, frame_end)

    # same dt trajectory (global CFL reduction)
    assert abs(float(s1.dt) - float(sm.dt)) < 1e-10

    # same particle cloud (order-independent compare via sort)
    p1 = np.asarray(single.get_positions(s1))
    p2 = np.asarray(multi.get_positions(sm))
    assert p1.shape == p2.shape
    k1 = np.lexsort((p1[:, 2], p1[:, 1], p1[:, 0]))
    k2 = np.lexsort((p2[:, 2], p2[:, 1], p2[:, 0]))
    assert np.max(np.abs(p1[k1] - p2[k2])) < 2e-6, np.max(np.abs(p1[k1] - p2[k2]))

    # conserved mass
    d1 = single.diagnostics(s1)
    dm = multi.diagnostics(sm)
    assert abs(d1["grid_mass"] - dm["grid_mass"]) < 1e-3 * max(1, d1["grid_mass"])


def test_migration_across_boundary():
    # a small fast block that starts in shard 0's slab and flies in +x
    cfg = cmt.SimConfig(
        domain_bits=5, max_active_blocks=256, default_dt=5e-4,
        gravity=(0.0, 0.0, 0.0),
    )
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e3, nu=0.3)
    pos = sample_uniform_box_world(cfg.dx, [0.40, 0.45, 0.45], [0.48, 0.55, 0.55],
                                  cfg.ppc)
    multi = MultiChipEngine(
        cfg, [mat], n_devices=2, tile_chunk=4, migration_capacity=4096,
    )
    sm = multi.init_state([pos], [(4.0, 0.0, 0.0)])
    n = pos.shape[0]

    # initially every particle lives on shard 0
    act0 = np.asarray(sm.models[0].active).reshape(2, -1)
    assert act0[0].sum() == n and act0[1].sum() == 0

    frame_end = jnp.float32(1.0)
    sm = multi.run_steps(sm, 55, frame_end)  # one device dispatch

    act = np.asarray(sm.models[0].active).reshape(2, -1)
    assert act.sum() == n, "no particles lost in migration"
    assert act[1].sum() > 0, "particles should have migrated to shard 1"
    p = multi.get_positions(sm)
    assert p[:, 0].mean() > 0.47  # moved in +x
    dm = multi.diagnostics(sm)
    assert abs(dm["grid_mass"] - n * mat.mass) < 1e-3 * n * mat.mass


def test_halo_margin_must_cover_arena_reach():
    # rebucket_every=4 widens the arena to 4^3 (scatter reach 2 blocks);
    # a margin-1 window silently leaks boundary mass, so construction fails
    cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=128, rebucket_every=4)
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4, nu=0.3)
    with pytest.raises(AssertionError, match="halo_margin"):
        MultiChipEngine(cfg, [mat], n_devices=2, tile_chunk=4, halo_margin=1)
    # auto-derived margin is fine
    MultiChipEngine(cfg, [mat], n_devices=2, tile_chunk=4)


@pytest.mark.slow
def test_migration_overflow_is_counted():
    # tiny migration capacity: crossers beyond it are dropped LOUDLY
    # (counter in diagnostics), never left simulating on the wrong shard
    cfg = cmt.SimConfig(
        domain_bits=5, max_active_blocks=256, default_dt=5e-4,
        gravity=(0.0, 0.0, 0.0),
    )
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e3, nu=0.3)
    pos = sample_uniform_box_world(cfg.dx, [0.40, 0.45, 0.45],
                                   [0.48, 0.55, 0.55], cfg.ppc)
    multi = MultiChipEngine(
        cfg, [mat], n_devices=2, tile_chunk=4, migration_capacity=8,
    )
    sm = multi.init_state([pos], [(2.0, 0.0, 0.0)])
    n = pos.shape[0]
    sm = multi.run_steps(sm, 110, 1.0)  # one device dispatch
    dm = multi.diagnostics(sm)
    n_active = int(np.asarray(sm.models[0].active).sum())
    assert dm["migration_dropped"] > 0, "overflow must be counted"
    # every particle is either still alive or accounted for in the counter
    assert n_active + dm["migration_dropped"] == n


@pytest.mark.slow
def test_multichip_pallas_interpret_matches_xla():
    # exact equivalence pins f32 arenas (the default bf16 arenas quantize
    # only the pallas side; their bound is tested in test_pallas.py)
    cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=128, default_dt=5e-4,
                        g2p_arena_dtype="float32")
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4, nu=0.3)
    pos = sample_uniform_box_world(cfg.dx, [0.35] * 3, [0.6] * 3, cfg.ppc)
    e1 = MultiChipEngine(cfg, [mat], n_devices=4, tile_chunk=4)
    e2 = MultiChipEngine(cfg, [mat], n_devices=4, tile_chunk=4,
                         use_pallas="interpret")
    s1 = e1.init_state([pos], [(0.3, -0.2, 0.0)])
    s2 = e2.init_state([pos], [(0.3, -0.2, 0.0)])
    for _ in range(3):
        s1 = e1.substep(s1, jnp.float32(1.0))
        s2 = e2.substep(s2, jnp.float32(1.0))
    p1, p2 = e1.get_positions(s1), e2.get_positions(s2)
    assert p1.shape == p2.shape
    k1 = np.lexsort(p1.T)
    k2 = np.lexsort(p2.T)
    assert np.max(np.abs(p1[k1] - p2[k2])) < 1e-6


@pytest.mark.slow
def test_multichip_run_steps_device_loop():
    cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=128, default_dt=5e-4)
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4, nu=0.3)
    pos = sample_uniform_box_world(cfg.dx, [0.35] * 3, [0.6] * 3, cfg.ppc)
    eng = MultiChipEngine(cfg, [mat], n_devices=4, tile_chunk=4)
    s0 = eng.init_state([pos], [(0.3, -0.2, 0.0)])
    s_loop = eng.run_steps(s0, 3, 1.0)
    s_seq = s0
    for _ in range(3):
        s_seq = eng.substep(s_seq, jnp.float32(1.0))
    p1 = eng.get_positions(s_loop)
    p2 = eng.get_positions(s_seq)
    k1 = np.lexsort(p1.T)
    k2 = np.lexsort(p2.T)
    assert p1.shape == p2.shape
    assert np.max(np.abs(p1[k1] - p2[k2])) < 1e-7


@pytest.mark.slow
def test_packed_halo_payload_independent_of_grid():
    """The packed exchange ships halo_capacity blocks regardless of the grid
    cross-section (the reference's collect/reduce protocol,
    mgsp_benchmark.cuh:661-776) — required for the 1024^3 target."""
    cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=128)
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4, nu=0.3)
    eng = MultiChipEngine(cfg, [mat], n_devices=2, tile_chunk=4,
                          halo_capacity=32)
    assert eng.comm.halo_capacity == 32
    # payload shape is [halo_capacity, 4, block_volume] — G never appears
    pos = sample_uniform_box_world(cfg.dx, [0.4]*3, [0.6]*3, cfg.ppc)
    sm = eng.init_state([pos], [(0.0, -0.2, 0.0)])
    for _ in range(2):
        sm = eng.substep(sm, jnp.float32(1.0))
    d = eng.diagnostics(sm)
    assert d["halo_overflow"] == 0
    assert abs(d["grid_mass"] - pos.shape[0] * mat.mass) < 1e-4 * pos.shape[0] * mat.mass


def test_packed_halo_overflow_is_counted():
    """A too-small halo_capacity surfaces as a loud counter, not silence."""
    cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=128)
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4, nu=0.3)
    eng = MultiChipEngine(cfg, [mat], n_devices=2, tile_chunk=4,
                          halo_capacity=1)
    # material spanning the slab boundary -> more than 1 halo block per side
    pos = sample_uniform_box_world(cfg.dx, [0.3, 0.3, 0.3], [0.7, 0.7, 0.7],
                                   cfg.ppc)
    sm = eng.init_state([pos], [(0.0, -0.2, 0.0)])
    for _ in range(2):
        sm = eng.substep(sm, jnp.float32(1.0))
    d = eng.diagnostics(sm)
    assert d["halo_overflow"] > 0


@pytest.mark.parametrize("mesh_shape", [
    (2, 2),
    pytest.param((2, 4), marks=pytest.mark.slow),
])
def test_2d_box_decomposition_matches_single_chip(mesh_shape):
    """The reference's 2-D (x, z) box split (MGSP/settings.h:78-88,
    partition_domain.h:27-70) as a 2-D device mesh with side + corner
    (diagonal) packed halo exchanges."""
    cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=256, default_dt=5e-4)
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4, nu=0.3)
    pos, v0 = make_scene(cfg)

    single = cmt.MPMEngine(cfg, [mat], tile_chunk=4)
    s1 = single.init_state([pos], [v0])
    multi = MultiChipEngine(cfg, [mat], mesh_shape=mesh_shape, tile_chunk=4,
                            migration_capacity=512)
    sm = multi.init_state([pos], [v0])

    for _ in range(4):
        s1 = single.substep(s1, jnp.float32(1.0))
        sm = multi.substep(sm, jnp.float32(1.0))
    p1 = np.asarray(single.get_positions(s1))
    p2 = np.asarray(multi.get_positions(sm))
    assert p1.shape == p2.shape
    k1 = np.lexsort(p1.T)
    k2 = np.lexsort(p2.T)
    assert np.max(np.abs(p1[k1] - p2[k2])) < 2e-6
    d1 = single.diagnostics(s1)
    dm = multi.diagnostics(sm)
    assert abs(d1["grid_mass"] - dm["grid_mass"]) < 1e-3 * max(1, d1["grid_mass"])
    assert dm["migration_dropped"] == 0 and dm["halo_overflow"] == 0


@pytest.mark.slow
def test_2d_migration_diagonal():
    """A corner-crossing cluster must migrate across both axes."""
    cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=256, default_dt=5e-4,
                        gravity=(0.0, 0.0, 0.0))
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e3, nu=0.3)
    pos = sample_uniform_box_world(cfg.dx, [0.42, 0.45, 0.42],
                                   [0.48, 0.55, 0.48], cfg.ppc)
    multi = MultiChipEngine(cfg, [mat], mesh_shape=(2, 2), tile_chunk=4,
                            migration_capacity=4096)
    sm = multi.init_state([pos], [(2.0, 0.0, 2.0)])
    n = pos.shape[0]
    sm = multi.run_steps(sm, 110, 1.0)  # one device dispatch
    act = np.asarray(sm.models[0].active).reshape(4, -1)
    assert act.sum() == n, "no particles lost crossing the corner"
    assert act[3].sum() > 0, "particles should reach the (1,1) shard"
    dm = multi.diagnostics(sm)
    assert abs(dm["grid_mass"] - n * mat.mass) < 1e-3 * n * mat.mass


def test_mesh1_trivial_comm_matches_single_chip():
    """A mesh of total size 1 must degrade to the EXACT single-chip
    pipeline: every ppermute along a size-1 axis has an empty permutation
    (writes zeros), so the r4 code paid the full halo pack/mask/migrate
    machinery for nothing — 34.8% of per-chip throughput (MULTICHIP_PERF
    r4).  The comm hooks now statically skip size-1 axes; this pins the
    bit-level equivalence AND that the trivial flag engages."""
    cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=256,
                        default_dt=5e-4, rebucket_auto=True)
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4, nu=0.3)
    pos, v0 = make_scene(cfg)

    single = cmt.MPMEngine(cfg, [mat], tile_chunk=4)
    multi = MultiChipEngine(cfg, [mat], n_devices=1, tile_chunk=4)
    assert multi.comm.trivial
    assert not multi.comm.overlap
    assert multi.comm._directions() == []

    s1 = single.init_state([pos], [v0])
    sm = multi.init_state([pos], [v0])
    frame_end = jnp.float32(1.0)
    for _ in range(4):
        s1 = single.substep(s1, frame_end)
        sm = multi.substep(sm, frame_end)
    assert abs(float(s1.dt) - float(sm.dt)) < 1e-10
    p1 = np.asarray(single.get_positions(s1))
    p2 = np.asarray(multi.get_positions(sm))
    assert p1.shape == p2.shape
    k1 = np.lexsort((p1[:, 2], p1[:, 1], p1[:, 0]))
    k2 = np.lexsort((p2[:, 2], p2[:, 1], p2[:, 0]))
    # identical pipeline -> bit-identical trajectories
    assert np.max(np.abs(p1[k1] - p2[k2])) == 0.0


def test_mixed_mesh_size1_axis_matches_single_chip():
    """A (1, 2) mesh: the size-1 x axis must be statically skipped (no
    empty-perm ppermutes, no x-boundary classification) while the z axis
    carries the real halo protocol."""
    cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=256,
                        default_dt=5e-4)
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4, nu=0.3)
    pos, v0 = make_scene(cfg)
    single = cmt.MPMEngine(cfg, [mat], tile_chunk=4)
    multi = MultiChipEngine(cfg, [mat], mesh_shape=(1, 2), tile_chunk=4,
                            migration_capacity=256)
    assert multi.comm.live_axes == (1,)
    assert all(d[0] == 0 for d in multi.comm._directions())
    s1 = single.init_state([pos], [v0])
    sm = multi.init_state([pos], [v0])
    frame_end = jnp.float32(1.0)
    for _ in range(4):
        s1 = single.substep(s1, frame_end)
        sm = multi.substep(sm, frame_end)
    assert abs(float(s1.dt) - float(sm.dt)) < 1e-10
    p1 = np.asarray(single.get_positions(s1))
    p2 = np.asarray(multi.get_positions(sm))
    assert p1.shape == p2.shape
    k1 = np.lexsort((p1[:, 2], p1[:, 1], p1[:, 0]))
    k2 = np.lexsort((p2[:, 2], p2[:, 1], p2[:, 0]))
    assert np.max(np.abs(p1[k1] - p2[k2])) < 2e-6
