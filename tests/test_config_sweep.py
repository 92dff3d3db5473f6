"""Conservation smoke across SimConfig corners.

The engine's static-shape machinery (tile sizes, chunking, arena spans,
macro chunking) must hold invariants for any legal config, not just the
bench defaults — sweep the corners cheaply on small scenes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import claymore_tpu as cmt
from claymore_tpu.io.sampler import sample_uniform_box_world


@pytest.mark.parametrize("domain_bits,particle_tile,rebucket", [
    pytest.param(5, 64, dict(), marks=pytest.mark.slow),   # tiny tiles
    pytest.param(5, 512, dict(), marks=pytest.mark.slow),  # tile > block load
    (6, 128, dict(rebucket_auto=True)),     # drift-triggered
    (5, 128, dict(rebucket_every=4)),       # 4^3 arena
    # incremental-rebucket conservation also runs (with equivalence) in
    # test_incremental_rebucket; the sweep variant is -m slow
    pytest.param(6, 256, dict(defrag_every=4), marks=pytest.mark.slow),
])
def test_conservation_across_configs(domain_bits, particle_tile, rebucket):
    cfg = cmt.SimConfig(domain_bits=domain_bits, max_active_blocks=256,
                        default_dt=4e-4, particle_tile=particle_tile,
                        **rebucket)
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4, nu=0.3)
    pos = sample_uniform_box_world(cfg.dx, [0.42] * 3, [0.58] * 3, cfg.ppc)
    eng = cmt.MPMEngine(cfg, [mat], tile_chunk=4)
    st = eng.init_state([pos], [(0.15, -0.3, 0.05)])
    n = pos.shape[0]
    fe = jnp.float32(1e9)
    st = eng.run_steps(st, 6, fe)
    d = eng.diagnostics(st)
    assert d["model0_active"] == n, (d["model0_active"], n)
    assert abs(d["grid_mass"] - n * mat.mass) < 1e-5 * n * mat.mass
    assert d["null_block_mass"] == 0.0
    assert d["block_overflow"] == 0
    assert d["model0_dropped_tiles"] == 0
    assert np.isfinite(float(st.t)) and float(st.t) > 0
