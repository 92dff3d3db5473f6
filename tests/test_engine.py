"""Engine correctness: equivalence vs the dense float64 reference,
conservation properties, and partition/tile invariants (SURVEY.md section 4)."""

import numpy as np
import jax.numpy as jnp
import pytest

import claymore_tpu as cmt
from claymore_tpu.io.sampler import sample_uniform_box_world
from claymore_tpu.utils.debug import check_partition, check_tiles, pool_to_dense
from tests.reference_dense import DenseMPM


def by_pid(state, field):
    """Return the engine's slot-major array reordered to original particle
    ids: [n_active, ...] float64."""
    m = state.models[0]
    act = np.asarray(m.active)
    pid = np.asarray(m.pid)[act]
    if field is None:
        vals = np.asarray(m.pos, np.float64).T[act]
    else:
        v = np.asarray(m.fields[field], np.float64)
        vals = v.T[act] if v.ndim == 2 else v[act]
    out = np.zeros((pid.max() + 1,) + vals.shape[1:], np.float64)
    out[pid] = vals
    return out, act.sum()


def small_setup(material, n_lo=0.45, n_hi=0.6, v0=(0.2, -0.3, 0.1)):
    cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=256, default_dt=5e-4)
    eng = cmt.MPMEngine(cfg, [material], tile_chunk=4)
    pos = sample_uniform_box_world(cfg.dx, [n_lo] * 3, [n_hi] * 3, cfg.ppc)
    state = eng.init_state([pos], [v0])
    return cfg, eng, pos, state


@pytest.mark.parametrize("mat_name", ["fixed_corotated", "jfluid", "sand", "nacc"])
def test_substep_matches_dense_reference(mat_name):
    cfg0 = cmt.SimConfig(domain_bits=5)
    if mat_name == "fixed_corotated":
        mat = cmt.FixedCorotated(volume=cfg0.default_volume(), e=1e4, nu=0.3)
    elif mat_name == "sand":
        mat = cmt.Sand(volume=cfg0.default_volume(), e=1e4, nu=0.3, rho=1500.0)
    elif mat_name == "nacc":
        mat = cmt.NACC(volume=cfg0.default_volume(), e=1e4, nu=0.3)
    else:
        mat = cmt.JFluid(volume=cfg0.default_volume())
    cfg, eng, pos, state = small_setup(mat)

    ref = DenseMPM(cfg, mat)
    ref.rasterize(pos.astype(np.float64), (0.2, -0.3, 0.1))

    # engine initial grid == reference initial grid
    m0, mom0 = pool_to_dense(cfg, state)
    assert np.max(np.abs(m0 - ref.grid_m)) < 1e-5 * max(1, ref.grid_m.max())
    assert np.max(np.abs(mom0 - ref.grid_mom)) < 1e-5

    # run two engine substeps against the reference
    rpos = pos.astype(np.float64)
    n = pos.shape[0]
    rfields = {}
    for k, v in state.models[0].fields.items():
        ev, _ = by_pid(state, k)
        rfields[k] = ev if k != "F" else ev.reshape(-1, 3, 3)
    frame_end = jnp.float32(1.0)
    for _ in range(2):
        dt = float(state.dt)
        max_sq = ref.grid_update(dt, cfg.gravity)
        next_dt = min(
            cfg.default_dt,
            cfg.dx * cfg.cfl / max(np.sqrt(max_sq), 1e-30) if max_sq > 0 else np.inf,
        )
        rpos, rfields = ref.g2p2g(rpos, rfields, dt, next_dt)
        state = eng.substep(state, frame_end)
        assert abs(float(state.dt) - next_dt) < 1e-9 * max(1.0, next_dt)

        # particle positions match (slot storage reordered by particle id)
        epos, act_n = by_pid(state, None)
        assert act_n == n
        assert np.max(np.abs(epos - rpos)) < 5e-6, np.max(np.abs(epos - rpos))
        # fields match
        for k in rfields:
            ev, _ = by_pid(state, k)
            if k == "F":
                ev = ev.reshape(-1, 3, 3)
            assert np.max(np.abs(ev - rfields[k])) < 5e-4, (k,)
        # grids match
        em, emom = pool_to_dense(cfg, state)
        scale = max(1.0, ref.grid_m.max())
        assert np.max(np.abs(em - ref.grid_m)) < 2e-5 * scale
        assert np.max(np.abs(emom - ref.grid_mom)) < 2e-4 * scale


def test_mass_momentum_conservation_no_gravity():
    cfg = cmt.SimConfig(
        domain_bits=5, max_active_blocks=256, default_dt=5e-4,
        gravity=(0.0, 0.0, 0.0),
    )
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4, nu=0.3)
    eng = cmt.MPMEngine(cfg, [mat], tile_chunk=4)
    pos = sample_uniform_box_world(cfg.dx, [0.4] * 3, [0.6] * 3, cfg.ppc)
    state = eng.init_state([pos], [(0.3, 0.1, -0.2)])

    n = pos.shape[0]
    mass0 = n * mat.mass
    mom0 = mass0 * np.array([0.3, 0.1, -0.2])

    d = eng.diagnostics(state)
    assert abs(d["grid_mass"] - mass0) < 1e-4 * mass0
    assert np.max(np.abs(d["grid_momentum"] - mom0)) < 1e-4 * abs(mass0)

    frame_end = jnp.float32(1.0)
    for _ in range(10):
        state = eng.substep(state, frame_end)
    d = eng.diagnostics(state)
    assert abs(d["grid_mass"] - mass0) < 1e-3 * mass0
    assert np.max(np.abs(d["grid_momentum"] - mom0)) < 2e-3 * abs(mass0)
    assert d["null_block_mass"] == 0.0
    assert d["model0_active"] == n


def test_partition_and_tile_invariants():
    cfg0 = cmt.SimConfig(domain_bits=5)
    mat = cmt.FixedCorotated(volume=cfg0.default_volume())
    cfg, eng, pos, state = small_setup(mat)
    check_partition(cfg, state.partition)
    check_tiles(cfg, state)
    frame_end = jnp.float32(1.0)
    for _ in range(3):
        state = eng.substep(state, frame_end)
    check_partition(cfg, state.partition)
    check_tiles(cfg, state)


@pytest.mark.slow
def test_sand_nacc_run_stable():
    cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=256, default_dt=2e-4)
    for mat in (cmt.Sand(volume=cfg.default_volume(), e=1e4),
                cmt.NACC(volume=cfg.default_volume(), e=1e4)):
        eng = cmt.MPMEngine(cfg, [mat], tile_chunk=4)
        pos = sample_uniform_box_world(cfg.dx, [0.45] * 3, [0.55] * 3, cfg.ppc)
        state = eng.init_state([pos])
        frame_end = jnp.float32(1.0)
        for _ in range(5):
            state = eng.substep(state, frame_end)
        d = eng.diagnostics(state)
        assert np.isfinite(d["grid_mass"]) and d["grid_mass"] > 0
        assert np.all(np.isfinite(np.asarray(state.models[0].pos)))


def test_divergence_exits_frame_loop_and_raises():
    """A NaN in the grid must poison dt -> t and exit run_frame in bounded
    time (the reference reads max_vel to host each substep and bails,
    gmpm_simulator.cuh:355-358; our on-device loop exits via dt=NaN), and
    check_health must raise loudly."""
    mat = cmt.FixedCorotated(volume=1e-6, e=1e4, nu=0.3)
    cfg, eng, pos, state = small_setup(mat)
    bad = state._replace(
        # NaN x-momentum (row 4 = (c=1, cx=0)) across all octs: some massy
        # cell is guaranteed to be hit regardless of sparse layout order
        grid=state.grid.at[:-1, 4].set(jnp.nan)
    )
    out = eng.run_frame(bad, jnp.float32(1.0))  # must terminate
    assert not np.isfinite(float(out.t))
    with pytest.raises(FloatingPointError, match="diverged"):
        eng.check_health(out)


def test_health_warns_on_dropped_particles():
    """Nonzero loss counters surface as warnings (strict=False) or errors."""
    import warnings

    mat = cmt.FixedCorotated(volume=1e-6, e=1e4, nu=0.3)
    cfg, eng, pos, state = small_setup(mat)
    tiles0 = state.models[0].tiles
    lossy = state._replace(
        models=(state.models[0]._replace(
            tiles=tiles0._replace(dropped=jnp.ones((1,), jnp.int32))
        ),)
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        eng.check_health(lossy, strict=False)
    assert any("dropped" in str(x.message) for x in w)
    with pytest.raises(RuntimeError, match="dropped"):
        eng.check_health(lossy, strict=True)
