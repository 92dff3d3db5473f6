"""Grow-and-retrace capacity recovery (reference check_capacity grows
blocks/bins x1.5 at runtime, gmpm_simulator.cuh:283-300): a deliberately
tight engine must regrow mid-run and carry the state over exactly."""

import numpy as np
import jax.numpy as jnp

import claymore_tpu as cmt
from claymore_tpu.io.sampler import sample_uniform_box_world


def test_grow_and_retrace_conserves_state():
    mat = cmt.FixedCorotated(volume=1e-6, e=1e4, nu=0.3)
    pos = sample_uniform_box_world(1 / 32, [0.45] * 3, [0.6] * 3, 8.0)

    big = cmt.SimConfig(domain_bits=5, max_active_blocks=256, default_dt=5e-4,
                        fps=96)
    eng0 = cmt.MPMEngine(big, [mat], tile_chunk=4)
    s0 = eng0.init_state([pos], [(0.0, -0.4, 0.0)])
    octs0 = int(s0.partition.count[0])

    # tight capacity: occupancy trigger (>90%) fires on the first frame
    tight = cmt.SimConfig(domain_bits=5, max_active_blocks=octs0,
                          default_dt=5e-4, fps=96)
    eng = cmt.MPMEngine(tight, [mat], tile_chunk=4)
    state = eng.init_state([pos], [(0.0, -0.4, 0.0)])
    mass0 = eng.diagnostics(state)["grid_mass"]

    eng2, out = eng.run(state, 1, auto_grow=True)
    assert eng2.cfg.max_active_blocks > tight.max_active_blocks
    d = eng2.diagnostics(out)
    assert d["model0_active"] == pos.shape[0]
    assert d["model0_dropped_tiles"] == 0
    assert d["block_overflow"] == 0
    assert abs(d["grid_mass"] - mass0) < 1e-5 * mass0
    assert float(out.t) > 0

    # regrown trajectory matches the amply-sized engine's (same physics)
    _, out_big = eng0.run(s0, 1, auto_grow=True)
    pa = eng2.get_positions(out)
    pb = eng0.get_positions(out_big)
    ka = np.lexsort((pa[:, 2], pa[:, 1], pa[:, 0]))
    kb = np.lexsort((pb[:, 2], pb[:, 1], pb[:, 0]))
    assert pa.shape == pb.shape
    assert np.max(np.abs(pa[ka] - pb[kb])) < 1e-5
