"""grid_update_pallas vs the XLA grid_update oracle (interpret mode).

Covers: occupied/empty cells, boundary octs on every face (sticky slab
keep-masks incl. the z-per-lane case), the appended null row, the ragged
final pallas program, and NaN momentum poisoning the CFL max.
"""

import numpy as np
import jax.numpy as jnp

import claymore_tpu as cmt
from claymore_tpu.core import grid as grid_ops
from claymore_tpu.core.types import Partition
from claymore_tpu.ops.pallas_grid import grid_update_pallas


def _random_partition_pool(cfg, n_active, seed=0, nan_at=None):
    rng = np.random.default_rng(seed)
    no = cfg.num_oct_keys
    nb = cfg.max_active_octs
    keys = np.full((nb,), no, np.int32)
    keys[:n_active] = rng.choice(no, size=n_active, replace=False)
    pool = np.zeros((nb + 1, 16, 128), np.float32)
    mass = rng.uniform(0.0, 2.0, size=(n_active, 4, 128)).astype(np.float32)
    mass[mass < 0.6] = 0.0                       # plenty of empty cells
    mom = rng.normal(0.0, 1e-3, size=(n_active, 12, 128)).astype(np.float32)
    pool[:n_active, 0:4] = mass
    pool[:n_active, 4:16] = mom
    if nan_at is not None:
        pool[nan_at, 5, 7] = np.nan              # mom-x row of cell cx=1
        pool[nan_at, 1, 7] = 1.0                 # massy, so the NaN counts
    part = Partition(
        table=jnp.zeros((no + 1,), jnp.int32),   # unused by grid update
        keys=jnp.asarray(keys),
        count=jnp.full((1,), n_active, jnp.int32),
        overflow=jnp.zeros((1,), jnp.int32),
    )
    return part, jnp.asarray(pool)


def _check(cfg, part, pool, dt=3e-4):
    ref_pool, ref_max = grid_ops.grid_update(cfg, pool, part,
                                             jnp.float32(dt))
    pal_pool, pal_max = grid_update_pallas(cfg, pool, part,
                                           jnp.float32(dt), interpret=True)
    rp, pp = np.asarray(ref_pool), np.asarray(pal_pool)
    # mass rows are pass-through: bit-exact
    np.testing.assert_array_equal(rp[:, 0:4], pp[:, 0:4])
    # velocities may differ by FMA-contraction ulps between the two
    # lowerings (observed 4.7e-10 abs on CPU interpret vs XLA:CPU)
    np.testing.assert_allclose(rp[:, 4:16], pp[:, 4:16],
                               rtol=1e-4, atol=1e-9)
    rm, pm = float(ref_max), float(pal_max)
    if np.isinf(rm):
        assert np.isinf(pm)
    else:
        assert abs(rm - pm) <= 1e-12 * max(1.0, abs(rm))


def test_matches_xla_incl_boundary_octs():
    cfg = cmt.SimConfig(domain_bits=6, max_active_blocks=192)
    # n_active chosen so active octs certainly include boundary coords
    part, pool = _random_partition_pool(cfg, n_active=150, seed=1)
    _check(cfg, part, pool)


def test_ragged_grid_and_null_row():
    # max_active_octs + 1 = 97: not a multiple of any pallas row block
    cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=96)
    part, pool = _random_partition_pool(cfg, n_active=60, seed=2)
    # put mass in the null row too: it must be processed like the XLA path
    pool = pool.at[-1, 0:4].set(1.0)
    pool = pool.at[-1, 4:8].set(0.25)
    _check(cfg, part, pool)


def test_nan_momentum_poisons_max():
    cfg = cmt.SimConfig(domain_bits=6, max_active_blocks=128)
    part, pool = _random_partition_pool(cfg, n_active=100, seed=3, nan_at=5)
    _, mx = grid_update_pallas(cfg, pool, part, jnp.float32(1e-4),
                               interpret=True)
    assert np.isinf(float(mx))
