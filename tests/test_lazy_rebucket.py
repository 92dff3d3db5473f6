"""Lazy rebucketing (rebucket_every > 1, 4^3 drift-tolerant arena) must
reproduce the every-step pipeline: the physics is identical, only the
bucket refresh cadence changes."""

import numpy as np
import jax.numpy as jnp
import pytest

import claymore_tpu as cmt
from claymore_tpu.io.sampler import sample_uniform_box_world


@pytest.mark.parametrize("k", [
    2,
    # span-4 equivalence is -m slow; span-4 conservation stays in the
    # default sweep (test_config_sweep rebucket4)
    pytest.param(4, marks=pytest.mark.slow),
])
def test_lazy_matches_every_step(k):
    base = dict(domain_bits=5, max_active_blocks=256, default_dt=5e-4)
    cfg1 = cmt.SimConfig(**base)
    cfgk = cmt.SimConfig(**base, rebucket_every=k)
    mat = cmt.FixedCorotated(volume=cfg1.default_volume(), e=1e4, nu=0.3)
    pos = sample_uniform_box_world(cfg1.dx, [0.4] * 3, [0.58] * 3, cfg1.ppc)

    e1 = cmt.MPMEngine(cfg1, [mat], tile_chunk=4)
    ek = cmt.MPMEngine(cfgk, [mat], tile_chunk=4)
    s1 = e1.init_state([pos], [(0.3, -0.4, 0.1)])
    sk = ek.init_state([pos], [(0.3, -0.4, 0.1)])

    fe = jnp.float32(1.0)
    for _ in range(2 * k + 1):
        s1 = e1.substep(s1, fe)
        sk = ek.substep(sk, fe)

    d1 = e1.diagnostics(s1)
    dk = ek.diagnostics(sk)
    assert dk["model0_active"] == pos.shape[0], "lazy path dropped particles"
    assert abs(d1["grid_mass"] - dk["grid_mass"]) < 1e-4 * d1["grid_mass"]
    assert dk["null_block_mass"] == 0.0

    p1 = e1.get_positions(s1)
    pk = ek.get_positions(sk)
    k1 = np.lexsort((p1[:, 2], p1[:, 1], p1[:, 0]))
    k2 = np.lexsort((pk[:, 2], pk[:, 1], pk[:, 0]))
    assert np.max(np.abs(p1[k1] - pk[k2])) < 5e-6
    assert abs(float(s1.dt) - float(sk.dt)) < 1e-9
