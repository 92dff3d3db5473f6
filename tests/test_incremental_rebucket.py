"""Incremental (stable-tile) rebucketing: relocating only home-block
changers (SimConfig.defrag_every > 1) must reproduce the full-sort
pipeline's physics — slot layout differs, particle trajectories must not
(reference analogue: the in-place add_advection bucket update,
particle_buffer.cuh:100-135, vs a full rebuild)."""

import numpy as np
import jax.numpy as jnp
import pytest

import claymore_tpu as cmt
from claymore_tpu.io.sampler import sample_uniform_box_world


def _by_pid(eng, state):
    m = state.models[0]
    act = np.asarray(m.active)
    pid = np.asarray(m.pid)[act]
    pos = np.asarray(m.pos).T[act]
    out = np.zeros((pid.max() + 1, 3), np.float64)
    out[pid] = pos
    return out


@pytest.mark.parametrize("k_every,defrag", [
    (1, 4),
    pytest.param(2, 3, marks=pytest.mark.slow),
])
def test_incremental_matches_full_sort(k_every, defrag):
    base = dict(domain_bits=5, max_active_blocks=256, default_dt=5e-4,
                rebucket_every=k_every)
    cfg_full = cmt.SimConfig(**base, defrag_every=1)
    cfg_inc = cmt.SimConfig(**base, defrag_every=defrag)
    mat = cmt.FixedCorotated(volume=cfg_full.default_volume(), e=1e4, nu=0.3)
    pos = sample_uniform_box_world(cfg_full.dx, [0.4] * 3, [0.58] * 3,
                                   cfg_full.ppc)

    ef = cmt.MPMEngine(cfg_full, [mat], tile_chunk=4)
    ei = cmt.MPMEngine(cfg_inc, [mat], tile_chunk=4)
    v0 = (0.3, -0.4, 0.1)
    sf = ef.init_state([pos], [v0])
    si = ei.init_state([pos], [v0])

    fe = jnp.float32(1.0)
    # enough substeps to cross several incremental windows + one defrag
    for _ in range(2 * k_every * defrag + 1):
        sf = ef.substep(sf, fe)
        si = ei.substep(si, fe)

    df = ef.diagnostics(sf)
    di = ei.diagnostics(si)
    assert di["model0_active"] == pos.shape[0], "incremental path lost particles"
    assert di["model0_dropped_tiles"] == 0, "movers were deferred on a tiny scene"
    assert di["null_block_mass"] == 0.0
    assert abs(df["grid_mass"] - di["grid_mass"]) < 1e-4 * df["grid_mass"]

    # per-particle trajectories match (f32 summation order differs between
    # slot layouts; tolerance covers that, not drift)
    pf = _by_pid(ef, sf)
    pi = _by_pid(ei, si)
    assert pf.shape == pi.shape
    assert np.max(np.abs(pf - pi)) < 5e-6


@pytest.mark.slow
def test_incremental_actually_moves_particles():
    """Sanity: particles DO change home blocks during the run (the test
    above would be vacuous otherwise), and tiles stay key-pure."""
    cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=256,
                        default_dt=5e-4, defrag_every=1000)
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4, nu=0.3)
    pos = sample_uniform_box_world(cfg.dx, [0.4] * 3, [0.58] * 3, cfg.ppc)
    eng = cmt.MPMEngine(cfg, [mat], tile_chunk=4)
    state = eng.init_state([pos], [(0.5, -0.6, 0.2)])

    from claymore_tpu.core import partition as part

    fe = jnp.float32(1.0)
    moved_any = False
    for _ in range(12):
        prev = state
        state = eng.substep(state, fe)
        m = state.models[0]
        # key purity: every active slot's home block == its tile's block key
        key = np.asarray(part.flatten_key(cfg, part.home_block(cfg, m.pos)))
        tkey = np.asarray(
            jnp.where(m.tiles.tvalid,
                      part.flatten_key(cfg, m.tiles.bcoord),
                      cfg.grid_size ** 3)
        )
        tile = cfg.particle_tile
        tk_slot = np.repeat(tkey, tile)
        act = np.asarray(m.active)
        assert np.all(key[act] == tk_slot[act]), "tile lost key purity"
        # did any slot's occupancy change? (movers relocate slots)
        if not np.array_equal(act, np.asarray(prev.models[0].active)):
            moved_any = True
    assert moved_any, "no particle ever changed tiles — test scene too static"
    assert eng.diagnostics(state)["model0_active"] == pos.shape[0]
